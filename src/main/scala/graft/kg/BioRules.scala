package graft.kg

import graft.model._
import graft.kg.Matcher._

import java.util.regex.Pattern
import scala.collection.mutable

/** The rule grammar: surface token-pattern re-expression of the reference's
  * biogrammar (reference: main/src/main/resources/org/clulab/reach/biogrammar/
  * — entities.yml, simple-event_template.yml `*_token_*` rules,
  * events_master.yml:57-360) plus the Odin actions that post-process matches
  * (reference: main/.../darpa/DarpaActions.scala).
  *
  * Every rule family from the reference's event taxonomy is covered:
  * templatic simple events (9 modification types + de- variants,
  * DarpaActions.getModificationLabel:370-408), Binding pair expansion
  * (mkBinding:222-261), Transcription, Amount, Translocation, Activations and
  * Regulations with semantic-negative polarity flip
  * (switchLabel/countSemanticNegatives:425-484), negation parity
  * (NegationHandler.scala:115-137), hypothesis hints
  * (HypothesisHandler.scala:16-43), and splitSimpleEvents
  * (DarpaActions.scala:306-340).
  */
object BioRules {

  // ---- trigger lexicons -------------------------------------------------

  val modStems: Map[String, String] = Map(
    "phosphorylat" -> "Phosphorylation",
    "ubiquitinat" -> "Ubiquitination",
    "hydroxylat" -> "Hydroxylation",
    "sumoylat" -> "Sumoylation",
    "glycosylat" -> "Glycosylation",
    "acetylat" -> "Acetylation",
    "farnesylat" -> "Farnesylation",
    "ribosylat" -> "Ribosylation",
    "methylat" -> "Methylation"
  )
  private val stemsAlt = modStems.keys.mkString("|")
  // verbal: phosphorylates/-ed/-ing/-e ; nominal: phosphorylation(s)
  val modVerb = s"(de-?)?($stemsAlt)(e|es|ed|ing)"
  val modNom = s"(de-?)?($stemsAlt)ions?"
  val modAny = s"(de-?)?($stemsAlt)(e|es|ed|ing|ions?)"

  /** Trigger text -> event label; de- prefix checked first (reference:
    * DarpaActions.getModificationLabel:370-408).
    */
  def modLabel(trigger: String): String = {
    val t = trigger.toLowerCase
    val de = t.startsWith("de")
    val body = if (de) t.stripPrefix("de").stripPrefix("-") else t
    val stem = modStems.keys.find(body.startsWith).getOrElse("phosphorylat")
    val base = modStems(stem)
    if (de) {
      // Deubiquitination, Dephosphorylation, ... (capitalized De + lowered base)
      "De" + base.head.toLower + base.tail
    } else base
  }

  val posRegTriggers =
    "(promot\\w+|enhanc\\w+|increas\\w+|induc\\w+|mediat\\w+|stimulat\\w+|trigger\\w*|driv(e|es|en|ing)|led|lead(s|ing)?|facilitat\\w+|accelerat\\w+|augment\\w+|up-?regulat\\w+)"
  val negRegTriggers =
    "(inhibit\\w+|block\\w+|suppress\\w+|decreas\\w+|reduc\\w+|prevent\\w+|impair\\w+|attenuat\\w+|abolish\\w+|abrogat\\w+|antagoniz\\w+|down-?regulat\\w+)"
  val regTriggers = s"($posRegTriggers|$negRegTriggers)"

  val posActTriggers = "(activat\\w+|stimulat\\w+|promot\\w+|up-?regulat\\w+)"
  val negActTriggers =
    "(inhibit\\w+|suppress\\w+|repress\\w+|inactivat\\w+|down-?regulat\\w+|antagoniz\\w+)"
  val actTriggers = s"($posActTriggers|$negActTriggers)"

  private val negRegP = Pattern.compile(negRegTriggers, Pattern.CASE_INSENSITIVE)
  private val negActP = Pattern.compile(negActTriggers, Pattern.CASE_INSENSITIVE)

  /** Negation markers (reference: NegationHandler.scala:44-106 lexicon). */
  private val negationP = Pattern.compile(
    "not|n't|no|never|neither|nor|without|fail(s|ed|ure)?|unable|absen(t|ce)|lack(s|ed|ing)?|cannot|can't|barely|hardly",
    Pattern.CASE_INSENSITIVE)

  /** Hypothesis hints (reference: HypothesisHandler.scala:16-43). */
  private val hypothesisP = Pattern.compile(
    "suggest(s|ed|ing)?|hypothes\\w+|propos(e|es|ed|ing)|may|might|could|possib\\w+|potential(ly)?|putative(ly)?|whether|likely|unlikely|appear(s|ed)?|seem(s|ed)?|speculat\\w+|predict(s|ed)?|investigat\\w+|examin(e|es|ed)|test(s|ed)? whether",
    Pattern.CASE_INSENSITIVE)

  /** Semantic negatives that flip regulation polarity (reference:
    * DarpaActions.countSemanticNegatives / SEMANTIC_NEGATIVE_PATTERN:425-484).
    */
  private val semNegP = Pattern.compile(
    "decreas\\w+|loss|lack|absence|deficien\\w+|knock(ed|down|out)?|silenc\\w+|deplet\\w+|reduc(ed|tion)|diminish\\w+|defect(ive)?|delet(ed|ion)|disrupt\\w+|impair\\w+",
    Pattern.CASE_INSENSITIVE)

  // ---- rule spec --------------------------------------------------------

  sealed trait Kind
  case class EntityK(label: String) extends Kind
  case object SimpleModK extends Kind // label from trigger
  case class FixedEventK(label: String, themeRole: String = "theme") extends Kind
  case object BindingK extends Kind
  case object RegulationK extends Kind // controlled is an Event
  case object ActivationK extends Kind // controlled is an entity
  case object AliasK extends Kind

  final case class Rule(name: String, priority: Int, kind: Kind, pattern: List[PE])

  private val ENT = "BioChemicalEntity"
  private val filler = OptG(W("protein|proteins|kinase|gene|enzyme|receptor|complex"))
  private val quant = OptG(W("one|two|three|four|five|several|many|multiple|all|both|\\d+"))
  private val adv = OptG(W("directly|specifically|rapidly|strongly|significantly|also|further|subsequently|then|markedly|potently|efficiently|selectively"))
  // auxiliary verbs + optional negation between subject and trigger
  // ("MEK does not phosphorylate ERK2")
  private val auxNeg = OptG(
    W("does|do|did|can|cannot|could|may|might|will|would|should|must"),
    OptG(W("not|n't")))
  private val notOpt = OptG(W("not|n't"))
  private val sitePrep = OptG(AltG(
    Seq(W("on|at"), ML("site", "Site", commaOk = true)),
    Seq(W("on|at"), W("residues?|sites?"), ML("site", "Site", commaOk = true))))
  private val parenSites = OptG(OptG(W("residues?")), W("\\("),
    ML("site", "Site", commaOk = true), W("\\)"))

  val rules: List[Rule] = List(
    // -- p2: generic (anaphoric) entities --------------------------------
    Rule("generic_pronoun", 2, EntityK("Generic_entity"),
      List(W("it|its"))),
    Rule("generic_np", 2, EntityK("Generic_entity"),
      List(W("this|that|the"), W("protein|kinase|enzyme|gene|receptor|molecule"))),

    // -- p5: sites by surface shape (residue codes: Y63, Ser473, T669) ---
    Rule("site_residue", 5, EntityK("Site"),
      List(W("[ACDEFGHIKLMNPQRSTVWY]\\d{1,4}|(Ser|Thr|Tyr|Lys|Arg|His)-?\\d{1,4}"))),
    Rule("site_residue_long", 5, EntityK("Site"),
      List(W("serine|threonine|tyrosine|lysine|arginine|histidine"), W("\\d{1,4}"))),

    // -- p7: templatic simple events (modifications) ---------------------
    // active: [cause] TRIGGERs [quant] theme-list [residues (S1, S2)] [on/at site-list]
    Rule("mod_active", 7, SimpleModK,
      List(M("cause", ENT), filler, adv, auxNeg, T(modVerb), quant,
        ML("theme", ENT), parenSites, sitePrep)),
    // active without cause: "TRIGGER of ..." won't match this (T is verbal)
    // passive: theme-list is/was [not] TRIGGERed [on site] [by cause]
    Rule("mod_passive", 7, SimpleModK,
      List(ML("theme", ENT), filler, W("is|are|was|were|be|been|being|gets?|got|becomes?|became"),
        notOpt, adv, T(modVerb), sitePrep,
        OptG(W("by"), M("cause", ENT)))),
    // nominal: TRIGGERion of theme-list [on/at site] [by cause]
    Rule("mod_nominal", 7, SimpleModK,
      List(T(modNom), W("of"), quant, ML("theme", ENT), parenSites, sitePrep,
        OptG(W("by"), M("cause", ENT)))),
    // pre-modifier nominal: "AKT phosphorylation" (theme before nominal trigger)
    Rule("mod_prenominal", 7, SimpleModK,
      List(M("theme", ENT), T(modNom))),

    // transcription
    Rule("transcription_nominal", 7, FixedEventK("Transcription"),
      List(T("transcription"), W("of"), ML("theme", ENT))),
    Rule("transcription_passive", 7, FixedEventK("Transcription"),
      List(ML("theme", ENT), W("is|are|was|were"), T("transcribed"))),

    // amount
    Rule("amount_nominal", 7, FixedEventK("FromAmountTrigger"),
      List(T("increas\\w+|decreas\\w+|overexpress\\w+|accumulat\\w+|loss|reduction"),
        OptG(W("the")),
        AltG(Seq(W("expression|levels?|abundance|amounts?"), W("of|in")),
          Seq(OptG(W("of|in")))),
        ML("theme", ENT),
        OptG(W("expression|levels?|abundance|amounts?")))),
    Rule("amount_expr", 7, FixedEventK("FromAmountTrigger"),
      List(ML("theme", ENT), W("expression|levels?|abundance"),
        W("is|are|was|were"), T("increased|decreased|elevated|reduced|higher|lower"))),

    // translocation: "X translocates to the nucleus"
    Rule("transloc_active", 7, FixedEventK("Translocation"),
      List(ML("theme", ENT), T("transloca\\w+|relocaliz\\w+|migrat\\w+|moves?|moved|shuttles?|accumulates?"),
        OptG(W("from"), OptG(W("the")), M("source", "Cellular_component")),
        W("to|into"), OptG(W("the")), M("destination", "Cellular_component"))),
    Rule("transloc_nominal", 7, FixedEventK("Translocation"),
      List(T("translocation|relocalization|accumulation"), W("of"), ML("theme", ENT),
        OptG(W("from"), OptG(W("the")), M("source", "Cellular_component")),
        W("to|into"), OptG(W("the")), M("destination", "Cellular_component"))),

    // -- p8: binding ------------------------------------------------------
    Rule("bind_active", 8, BindingK,
      List(M("theme", ENT), filler, adv, T("binds?|bound|binding|interacts?|interacted|associates?|associated|complexes?"),
        OptG(W("to|with|directly")), OptG(W("to|with")), ML("theme2", ENT))),
    Rule("bind_nominal", 8, BindingK,
      List(T("binding|interaction|association|complex"), W("of|between"),
        M("theme", ENT), W("to|with|and"), ML("theme2", ENT))),
    Rule("bind_coord", 8, BindingK,
      List(M("theme", ENT), W("and"), M("theme2", ENT), adv,
        T("bind|binds|interact|interacts|associate|associates|form"),
        OptG(W("a|an")), OptG(W("complex|complexes|dimer|heterodimer")))),

    // -- p10: alias -------------------------------------------------------
    Rule("alias_paren", 10, AliasK,
      List(M("a", ENT), W("\\("), OptG(W("also")), W("also|aka|known"),
        OptG(W("known")), OptG(W("as")), M("b", ENT), W("\\)"))),
    Rule("alias_comma", 10, AliasK,
      List(M("a", ENT), W(","), W("also"), W("known"), W("as"), M("b", ENT))),

    // -- p12: regulations over events ------------------------------------
    // active: controller TRIGGERs controlled-event
    Rule("reg_active", 12, RegulationK,
      List(M("controller", "PossibleController"), X(2), auxNeg,
        T(regTriggers), OptG(W("the")), M("controlled", "Event"))),
    // passive: controlled-event is TRIGGERed by controller
    Rule("reg_passive", 12, RegulationK,
      List(M("controlled", "Event"), X(2), W("is|are|was|were"), notOpt, adv,
        T(regTriggers), W("by"), M("controller", "PossibleController"))),

    // -- p14: activations (controller/controlled entities) ---------------
    Rule("act_active", 14, ActivationK,
      List(M("controller", "PossibleController"), X(2), auxNeg,
        T(actTriggers), OptG(W("the")), M("controlled", ENT), filler)),
    Rule("act_passive", 14, ActivationK,
      List(M("controlled", ENT), filler, W("is|are|was|were"), notOpt, adv,
        T(actTriggers), W("by"), M("controller", "PossibleController")))
  )

  val priorities: List[Int] = rules.map(_.priority).distinct.sorted

  // ---- sentence-level extraction driver ---------------------------------

  /** Decode NER IOB into TextBound mentions (reference analogue:
    * mkNERMentions, DarpaActions.scala:45-52 + entities.yml ner rules).
    */
  private def decodeIob(conv: String, turn: Int, sent: Sent): Seq[MentionRow] = {
    val out = mutable.ArrayBuffer.empty[MentionRow]
    var i = 0
    val n = sent.ner.length
    while (i < n) {
      if (sent.ner(i).startsWith("B-")) {
        val label = sent.ner(i).substring(2)
        var j = i + 1
        while (j < n && sent.ner(j) == "I-" + label) j += 1
        val text = sent.words.slice(i, j).mkString(" ")
        val labels = Lexicon.labelClosure(label)
        out += MentionRow(
          mentionId(conv, turn, sent.sent_idx, i, j, label, "", Nil, false, false),
          conv, turn, sent.sent_idx, i, j, labels, text, "ner", false, "",
          Array.empty, false, false)
        i = j
      } else i += 1
    }
    out.toSeq
  }

  private def span(b: Bind): (Int, Int) = {
    val all = b.caps.values.flatten.toList
    val starts = b.trigger._1 :: all.map(_.start_tok)
    val ends = b.trigger._2 :: all.map(_.end_tok)
    (starts.filter(_ >= 0).min, ends.max)
  }

  private def countIn(p: Pattern, words: Array[String], s: Int, e: Int): Int = {
    var c = 0
    var i = math.max(0, s)
    val lim = math.min(words.length, e)
    while (i < lim) { if (p.matcher(words(i)).matches()) c += 1; i += 1 }
    c
  }

  /** Negation parity over the event neighborhood (reference:
    * NegationHandler.scala:115-137 — even count cancels, odd keeps one).
    */
  private def isNegated(words: Array[String], s: Int, e: Int): Boolean =
    countIn(negationP, words, s - 3, e + 1) % 2 == 1

  private def isHypothesis(words: Array[String]): Boolean =
    countIn(hypothesisP, words, 0, words.length) > 0

  /** Semantic-negative flip count around the controller span, excluding the
    * trigger token itself (reference:
    * DarpaActions.countSemanticNegatives:443-466).
    */
  private def semNegFlips(words: Array[String], ctl: MentionRow,
                          trigPos: Int): Int = {
    var c = 0
    var i = math.max(0, ctl.start_tok - 2)
    val lim = math.min(words.length, ctl.end_tok + 2)
    while (i < lim) {
      if (i != trigPos && semNegP.matcher(words(i)).matches()) c += 1
      i += 1
    }
    c
  }

  private def mkEvent(conv: String, turn: Int, sentIdx: Int,
                      words: Array[String], label: String, trig: (Int, Int),
                      args: Seq[(String, MentionRow)], foundBy: String,
                      hyp: Boolean): MentionRow = {
    val starts = trig._1 +: args.map(_._2.start_tok)
    val ends = trig._2 +: args.map(_._2.end_tok)
    val (s, e) = (starts.filter(_ >= 0).min, ends.max)
    val neg = isNegated(words, s, e)
    val argRefs = args.map { case (r, m) => Arg(r, m.mention_id) }
    val trigText = if (trig._1 >= 0) words.slice(trig._1, trig._2).mkString(" ") else ""
    MentionRow(
      mentionId(conv, turn, sentIdx, s, e, label, trigText, argRefs, neg, hyp),
      conv, turn, sentIdx, s, e, Lexicon.labelClosure(label),
      words.slice(s, e).mkString(" "), foundBy, true, trigText,
      argRefs.toArray, neg, hyp)
  }

  /** Assemble mentions from one rule match. Returns the new mentions
    * (events may come with a split regulation — splitSimpleEvents,
    * DarpaActions.scala:306-340).
    */
  private def assemble(rule: Rule, b: Bind, conv: String, turn: Int,
                       sent: Sent, startPos: Int, endPos: Int): Seq[MentionRow] = {
    val words = sent.words
    lazy val hyp = isHypothesis(words)
    def trigWord: String =
      if (b.trigger._1 >= 0) words(b.trigger._1) else ""

    rule.kind match {
      case EntityK(label) =>
        val text = words.slice(startPos, endPos).mkString(" ")
        Seq(MentionRow(
          mentionId(conv, turn, sent.sent_idx, startPos, endPos, label, "", Nil, false, false),
          conv, turn, sent.sent_idx, startPos, endPos,
          Lexicon.labelClosure(label), text, rule.name, false, "",
          Array.empty, false, false))

      case AliasK =>
        (b.caps.get("a"), b.caps.get("b")) match {
          case (Some(a :: _), Some(bb :: _)) if a.text != bb.text =>
            Seq(mkEvent(conv, turn, sent.sent_idx, words, "Alias", (-1, -1),
              Seq("a" -> a, "b" -> bb), rule.name, false))
          case _ => Nil
        }

      case SimpleModK =>
        val label = modLabel(trigWord)
        // mkUbiquitination guard: drop ubiq whose theme/cause is "ubiquitin"
        // (reference: DarpaActions.scala:128-137)
        val themes = b.caps.getOrElse("theme", Nil)
        val causes = b.caps.getOrElse("cause", Nil)
        val sites = b.caps.getOrElse("site", Nil)
        if (label.toLowerCase.contains("ubiquitin") &&
            (themes ++ causes).exists(_.text.equalsIgnoreCase("ubiquitin"))) Nil
        else {
          val siteOpts: Seq[Option[MentionRow]] =
            if (sites.isEmpty) Seq(None) else sites.map(Some(_))
          for {
            theme <- themes
            siteOpt <- siteOpts
            if causes.forall(_.mention_id != theme.mention_id)
            m <- {
              val baseArgs = Seq("theme" -> theme) ++ siteOpt.map("site" -> _)
              causes.headOption match {
                case None =>
                  Seq(mkEvent(conv, turn, sent.sent_idx, words, label,
                    b.trigger, baseArgs, rule.name, hyp))
                case Some(cause) =>
                  // splitSimpleEvents: event loses its cause; a regulation
                  // (controller=cause) is emitted over it
                  val ev = mkEvent(conv, turn, sent.sent_idx, words, label,
                    b.trigger, baseArgs, rule.name, hyp)
                  val flips = semNegFlips(words, cause, b.trigger._1)
                  val regLabel =
                    if (flips % 2 == 1) "Negative_regulation"
                    else "Positive_regulation"
                  val reg = mkEvent(conv, turn, sent.sent_idx, words, regLabel,
                    b.trigger,
                    Seq("controller" -> cause, "controlled" -> ev),
                    rule.name + "_split", hyp)
                  Seq(ev, reg)
              }
            }
          } yield m
        }

      case FixedEventK(label0, themeRole) =>
        val label =
          if (label0 == "FromAmountTrigger") {
            val t = trigWord.toLowerCase
            if (t.startsWith("decreas") || t.startsWith("loss") ||
                t.startsWith("reduc") || t.startsWith("lower"))
              "DecreaseAmount"
            else "IncreaseAmount"
          } else label0
        val extras = Seq("source", "destination").flatMap(r =>
          b.caps.getOrElse(r, Nil).headOption.map(r -> _))
        b.caps.getOrElse(themeRole, Nil).map { theme =>
          mkEvent(conv, turn, sent.sent_idx, words, label, b.trigger,
            Seq("theme" -> theme) ++ extras, rule.name, hyp)
        }

      case BindingK =>
        // pair expansion (reference: DarpaActions.mkBinding:222-261)
        val as = b.caps.getOrElse("theme", Nil)
        val bs = b.caps.getOrElse("theme2", Nil)
        for {
          x <- as; y <- bs
          if x.mention_id != y.mention_id && x.text != y.text
        } yield {
          val (t1, t2) =
            if (x.text <= y.text) (x, y) else (y, x)
          mkEvent(conv, turn, sent.sent_idx, words, "Binding", b.trigger,
            Seq("theme" -> t1, "theme" -> t2), rule.name, hyp)
        }

      case RegulationK =>
        (b.caps.get("controller"), b.caps.get("controlled")) match {
          case (Some(ctl :: _), Some(cld :: _))
              if ctl.mention_id != cld.mention_id &&
                !cld.args.exists(_.mention_id == ctl.mention_id) =>
            val basePos = !negRegP.matcher(trigWord).matches()
            val flips = semNegFlips(words, ctl, b.trigger._1)
            val pos = if (flips % 2 == 1) !basePos else basePos
            val label = if (pos) "Positive_regulation" else "Negative_regulation"
            Seq(mkEvent(conv, turn, sent.sent_idx, words, label, b.trigger,
              Seq("controller" -> ctl, "controlled" -> cld), rule.name, hyp))
          case _ => Nil
        }

      case ActivationK =>
        (b.caps.get("controller"), b.caps.get("controlled")) match {
          // hasDistinctControllerControlled guard
          // (reference: DarpaActions.scala:538-560)
          case (Some(ctl :: _), Some(cld :: _))
              if ctl.mention_id != cld.mention_id && ctl.text != cld.text =>
            val basePos = !negActP.matcher(trigWord).matches()
            val flips = semNegFlips(words, ctl, b.trigger._1)
            val pos = if (flips % 2 == 1) !basePos else basePos
            val label = if (pos) "Positive_activation" else "Negative_activation"
            Seq(mkEvent(conv, turn, sent.sent_idx, words, label, b.trigger,
              Seq("controller" -> ctl, "controlled" -> cld), rule.name, hyp))
          case _ => Nil
        }
    }
  }

  /** keepMostCompleteMentions (reference: darpa/MentionFilter.scala:12-28,
    * 32-241): per (label, trigger-span) keep only max-arg-count events; then
    * drop events that are a strict arg-subset of another same-label event.
    * Sentence-local, so it runs in-row — no shuffle.
    */
  def mostComplete(ms: Seq[MentionRow]): Seq[MentionRow] = {
    val (events, tbms) = ms.partition(_.is_event)
    val kept = events
      .groupBy(e => (e.labels.head, e.trigger_text, e.sent_idx))
      .values.flatMap { grp =>
        val maxArgs = grp.map(_.args.length).max
        grp.filter(_.args.length == maxArgs)
      }.toSeq
    // strict arg-subset drop (same label head)
    val byLabel = kept.groupBy(_.labels.head)
    var res = kept.filterNot { e =>
      byLabel(e.labels.head).exists { o =>
        (o.mention_id != e.mention_id) &&
        o.args.length > e.args.length &&
        e.args.forall(a => o.args.contains(a)) &&
        o.trigger_text == e.trigger_text
      }
    }
    // drop an Activation when a Regulation in the same sentence has the same
    // controller and a controlled event whose theme is the activation's
    // controlled entity — regulations are the more specific reading
    // (reference: MentionFilter.filterRegulations preference for regulations,
    // :151-195)
    val byIdLocal = (tbms ++ res).map(m => m.mention_id -> m).toMap
    res = res.filterNot { a =>
      a.labels.contains("ActivationEvent") && {
        val aCtl = a.args.find(_.role == "controller").map(_.mention_id)
        val aCld = a.args.find(_.role == "controlled").map(_.mention_id)
        res.exists { r =>
          r.labels.contains("Regulation") &&
          r.args.find(_.role == "controller").map(_.mention_id) == aCtl && {
            val rCldTheme = for {
              cld <- r.args.find(_.role == "controlled")
              cldM <- byIdLocal.get(cld.mention_id)
              th <- cldM.args.find(_.role == "theme")
            } yield th.mention_id
            rCldTheme == aCld
          }
        }
      }
    }
    // fixpoint-prune events whose args dangle on a dropped mention — keeps
    // regulations consistent with the events that survived (reference:
    // MentionFilter "keep args of kept regs" semantics, :243-260)
    var changed = true
    while (changed) {
      val known = (tbms.map(_.mention_id) ++ res.map(_.mention_id)).toSet
      val next = res.filter(_.args.forall(a => known.contains(a.mention_id)))
      changed = next.size != res.size
      res = next
    }
    tbms ++ res
  }

  /** Run all priorities over one sentence; returns every mention found. */
  def extractSentence(conv: String, turn: Int, sent: Sent): Seq[MentionRow] = {
    val state = new State
    decodeIob(conv, turn, sent).foreach(state.add)
    val n = sent.words.length
    priorities.foreach { prio =>
      val newMentions = mutable.ArrayBuffer.empty[MentionRow]
      rules.filter(_.priority == prio).foreach { rule =>
        var pos = 0
        while (pos < n) {
          tryMatch(rule.pattern, sent.words, state, pos, emptyBind)
            .foreach { case (end, bind) =>
              newMentions ++= assemble(rule, bind, conv, turn, sent, pos, end)
            }
          pos += 1
        }
      }
      newMentions.foreach(state.add)
    }
    mostComplete(state.all.toSeq)
  }

  def extractTurn(at: AnnotatedTurn): Seq[MentionRow] =
    at.sents.toSeq.flatMap(s => extractSentence(at.conv_id, at.turn_idx, s))
}
