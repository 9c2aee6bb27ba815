package graft.kg

import graft.model._
import scala.collection.mutable

/** Structured (pre-canonicalization) triple: obj kept as components so the
  * canonical-id rewrite in the materialize stage is a plain broadcast join +
  * column expressions — no string surgery on nested event keys.
  */
final case class PreTriple(
    subj_gid: String,
    pred: String,
    obj_gid: String,
    obj_gid2: String, // Binding second participant, else ""
    obj_pred: String, // controlled-event label for regulations, else ""
    site: String,
    negated: Boolean,
    hypothesis: Boolean,
    conv_id: String,
    turn_idx: Int,
    evidence_text: String,
    found_by: String,
    trigger_text: String = "",
    // conversation context at the event's turn (window + defaults — the
    // generalized context engine, reference: context/Policies.scala:8-64 +
    // RuleBasedEngine doc defaults:26-37; surfaced in the Arizona export's
    // CONTEXT_* columns, ArizonaOutputter.scala:24-30)
    ctx_species: String = "",
    ctx_organ: String = "",
    ctx_cell_line: String = "",
    ctx_cell_type: String = "",
    // sentence-initial consequence cue (causal-precedence sieve input)
    cue: String = ""
)

final case class AliasEdge(a: String, b: String, conv_id: String)

/** Tagged union row for the single-pass stage-B checkpoint. */
final case class StageBRow(
    kind: String, // "linked" | "triple" | "alias"
    linked: Option[LinkedMention],
    triple: Option[PreTriple],
    alias: Option[AliasEdge]
)

/** Per-conversation ordered fold: context window -> coref sieves -> KB link ->
  * triple emission. This is the one inherently *sequential* operator of the
  * pipeline (SURVEY.md J4: coref sieves are order-dependent left-folds,
  * DarpaLinks.scala:33-42) — it runs inside `groupByKey(conv_id)
  * .flatMapGroups`, so the entire conversation is partition-local and the
  * pipeline pays exactly ONE shuffle (the conv_id exchange) for context +
  * coref + alias + link + emit together.
  *
  * Scale: per-conv state is O(mentions in conversation). Mega-conversations
  * are handled by chunked processing ([[maxChunk]]) mirroring the reference's
  * standoff grouping (ReachSystem.scala:143-145); context/coref never look
  * forward, so chunk boundaries only truncate lookback windows.
  */
object ConvProcessor {

  val contextBound = 3 // turns of species-context lookback (Policies.scala:8-64 bound)
  val pronounGap = 1 // sentence gap for pronominal anaphora (DarpaLinks.scala:210)
  val npGap = 3 // sentence gap for definite-NP anaphora
  val maxChunk = 200000 // mentions per chunk for mega-conversations

  private def normSpecies(s: String): String = s.toLowerCase match {
    case "murine" => "mouse"
    case x => x
  }

  def gidOf(g: Grounding): String = g.namespace + ":" + g.id

  def process(convId: String, mentionsIn: Seq[MentionRow],
              kb: Link.KbIndex): Seq[StageBRow] = {
    if (mentionsIn.size <= maxChunk) processChunk(convId, mentionsIn, kb)
    else {
      // chunk on turn boundaries, preserving order
      val sorted = sortMentions(mentionsIn)
      val chunks = mutable.ArrayBuffer.empty[Seq[MentionRow]]
      var cur = mutable.ArrayBuffer.empty[MentionRow]
      var lastTurn = Int.MinValue
      sorted.foreach { m =>
        if (cur.size >= maxChunk && m.turn_idx != lastTurn) {
          chunks += cur.toSeq; cur = mutable.ArrayBuffer.empty
        }
        cur += m; lastTurn = m.turn_idx
      }
      if (cur.nonEmpty) chunks += cur.toSeq
      chunks.flatMap(c => processChunk(convId, c, kb)).toSeq
    }
  }

  private def sortMentions(ms: Seq[MentionRow]): Seq[MentionRow] =
    ms.sortBy(m => (m.turn_idx, m.sent_idx, m.start_tok, m.end_tok, m.mention_id))

  private def processChunk(convId: String, mentionsIn: Seq[MentionRow],
                           kb: Link.KbIndex): Seq[StageBRow] = {
    val mentions = sortMentions(mentionsIn)
    val byId = mutable.Map.empty[Long, MentionRow]
    mentions.foreach(m => byId(m.mention_id) = m)

    // ---- context engine (turn-granular backward window + conversation
    // defaults — W1/A1 generalized beyond species; reference:
    // Policies.scala:8-64 bound-3 window, RuleBasedEngine.scala:26-37 argmax
    // defaults). Per type: nearest preceding context mention within
    // `contextBound` turns wins; a turn with none falls back to the
    // conversation default (most frequent, ties broken lexicographically).
    // fast path: most conversations carry no context mentions at all — skip
    // every per-type structure then (this fold runs once per conversation;
    // per-conv constant allocations showed up as a 3x stage regression)
    val ctxTypes = Seq("Species", "CellLine", "CellType", "Organ")
    val hasCtx = mentions.exists(m => !m.is_event && {
      val h = m.labels.head
      h == "Species" || h == "CellLine" || h == "CellType" || h == "Organ"
    })
    lazy val ctxByType: Map[String, Seq[MentionRow]] = ctxTypes.map { tpe =>
      tpe -> mentions.filter(m => !m.is_event && m.labels.head == tpe)
    }.toMap
    lazy val ctxDefault: Map[String, Option[MentionRow]] = ctxTypes.map { tpe =>
      val grouped = ctxByType(tpe).groupBy(_.text.toLowerCase)
      tpe -> (if (grouped.isEmpty) None
              else {
                val (_, ms) = grouped.minBy { case (k, v) => (-v.size, k) }
                Some(ms.head)
              })
    }.toMap
    def nearestCtx(tpe: String, turn: Int): Option[MentionRow] = {
      if (!hasCtx) return None
      var best: MentionRow = null
      ctxByType(tpe).foreach { m =>
        if (m.turn_idx <= turn && turn - m.turn_idx <= contextBound &&
            (best == null || m.turn_idx >= best.turn_idx)) best = m
      }
      Option(best).orElse(ctxDefault(tpe))
    }
    val ctxSpeciesCache = mutable.Map.empty[Int, String]
    def ctxSpecies(turn: Int): String =
      if (!hasCtx) ""
      else ctxSpeciesCache.getOrElseUpdate(turn,
        nearestCtx("Species", turn).map(m => normSpecies(m.text)).getOrElse(""))

    // ---- coref sieves: generic mentions -> nearest preceding entities ----
    // (LinearSelector semantics, AntecedentSelector.scala:14-31). Plural
    // generics ("they", "both", "these proteins") take the nearest
    // `cardinality` DISTINCT antecedents (reference: Anaphoric.cardinality,
    // Anaphoric.scala:49-127 + DarpaLinks plural handling:120-257); events
    // over them expand into one event per antecedent.
    def cardinality(m: MentionRow): Int = {
      val t = m.text.toLowerCase
      if (t == "they" || t == "them" || t == "both") 2
      else if (t.startsWith("these ") || t.startsWith("those ") ||
               (t.indexOf(' ') >= 0 && t.endsWith("s"))) 2
      else 1
    }
    val corefMap = mutable.Map.empty[Long, Seq[Long]]
    val priorEntities = mutable.ArrayBuffer.empty[MentionRow] // in order
    mentions.foreach { m =>
      if (!m.is_event) {
        val head = m.labels.head
        if (head == "Generic_entity") {
          // gap is measured in real turns/sentences (mention-free turns count:
          // an entity three turns back is NOT an antecedent for a pronoun even
          // if nothing was extracted in between)
          val isPronoun = m.end_tok - m.start_tok == 1
          val want = cardinality(m)
          val picked = mutable.ArrayBuffer.empty[MentionRow]
          var i = priorEntities.length - 1
          while (i >= 0 && picked.size < want) {
            val c = priorEntities(i)
            val turnDiff = m.turn_idx - c.turn_idx
            val eligible =
              if (isPronoun)
                (turnDiff == 0 && m.sent_idx - c.sent_idx <= pronounGap) ||
                  turnDiff == 1
              else turnDiff <= npGap
            if (turnDiff > npGap) i = -1 // sorted: all earlier are farther
            else {
              if (eligible &&
                  !picked.exists(_.text.equalsIgnoreCase(c.text)))
                picked += c
              i -= 1
            }
          }
          // a plural needs its full antecedent count (the reference skips the
          // link otherwise); singles resolve on the first hit
          if (picked.size == want)
            corefMap(m.mention_id) = picked.map(_.mention_id).toSeq
        } else if (m.labels.contains("BioChemicalEntity")) {
          priorEntities += m
        }
      }
    }

    // ---- rewrite event args through coref; recompute content ids.
    // An arg with k antecedents expands the event into k variants (bounded),
    // mirroring the reference's coref combination expansion (Coref.scala).
    val idRemap = mutable.Map.empty[Long, Seq[Long]] ++ corefMap
    val maxExpand = 8
    var finalEvents = mentions.filter(_.is_event)
    var pass = if (corefMap.isEmpty) 3 else 0 // nothing resolved -> no rewrite
    while (pass < 3) {
      finalEvents = finalEvents.flatMap { e =>
        // fast path: nothing to rewrite (the overwhelmingly common case —
        // this loop runs 3x over every event of the conversation)
        if (!e.args.exists(a => idRemap.contains(a.mention_id))) Seq(e)
        else {
          val choices: Seq[Seq[Arg]] = e.args.toSeq.map { a =>
            idRemap.get(a.mention_id) match {
              case Some(ids) => ids.map(i => Arg(a.role, i))
              case None => Seq(a)
            }
          }
          val combos = choices.foldLeft(Seq(Seq.empty[Arg])) { (acc, c) =>
            acc.flatMap(pre => c.map(pre :+ _))
          }.take(maxExpand)
          val variants = combos.map { newArgs =>
            val nid = Matcher.mentionId(e.conv_id, e.turn_idx, e.sent_idx,
              e.start_tok, e.end_tok, e.labels.head, e.trigger_text, newArgs,
              e.negated, e.hypothesis, e.mods.toSeq)
            e.copy(mention_id = nid, args = newArgs.toArray)
          }
          idRemap(e.mention_id) = variants.map(_.mention_id)
          variants
        }
      }
      pass += 1
    }
    if (corefMap.nonEmpty) {
      finalEvents = finalEvents.groupBy(_.mention_id).map(_._2.head).toSeq
        .sortBy(m => (m.turn_idx, m.sent_idx, m.start_tok, m.mention_id))
    }
    finalEvents.foreach(e => byId(e.mention_id) = e)

    // drop events with unresolved generic args (reference drops generic
    // mentions without antecedents at output, Coref.scala:353-377)
    val entityById = mentions.filter(!_.is_event)
      .map(m => m.mention_id -> m).toMap
    var kept = finalEvents
    var changed = true
    while (changed) {
      val ids = kept.map(_.mention_id).toSet
      val next = kept.filter(_.args.forall { a =>
        byId.get(a.mention_id) match {
          case Some(m) if m.is_event => ids.contains(a.mention_id)
          case Some(m) => m.labels.head != "Generic_entity"
          case None => false
        }
      })
      changed = next.size != kept.size
      kept = next
    }

    // ---- link stage: broadcast-KB first-hit lookup (J1) ------------------
    val groundings = mutable.Map.empty[Long, Grounding]
    entityById.values.foreach { m =>
      Link.linkableLabel(m.labels) match {
        case Some(label) =>
          groundings(m.mention_id) =
            kb.resolve(m.text, label, ctxSpecies(m.turn_idx))
        case None => ()
      }
    }
    def gid(id: Long): String =
      groundings.get(id).map(gidOf).getOrElse("")

    // ---- theme descent for event-valued roles ----------------------------
    // (OutputDegrader.flattenMentions semantics, OutputDegrader.scala:16-48)
    def descend(id: Long, depth: Int = 0): (String, String) = {
      // returns (core entity gid, site text)
      byId.get(id) match {
        case Some(m) if !m.is_event => (gid(id), "")
        case Some(m) if depth < 4 =>
          val site = m.args.find(_.role == "site")
            .flatMap(a => byId.get(a.mention_id)).map(_.text).getOrElse("")
          val dest = m.args.find(_.role == "destination")
            .flatMap(a => byId.get(a.mention_id))
            .flatMap(d => groundings.get(d.mention_id)).map(gidOf)
          val core = m.args.find(_.role == "theme")
            .orElse(m.args.find(_.role == "controlled"))
            .map(a => descend(a.mention_id, depth + 1)._1).getOrElse("")
          val siteOut = if (site.nonEmpty) site else dest.getOrElse("")
          (core, siteOut)
        case _ => ("", "")
      }
    }

    val out = mutable.ArrayBuffer.empty[StageBRow]

    // ---- alias edges (J3/J5 — scoped per conversation) -------------------
    kept.filter(_.labels.head == "Alias").foreach { al =>
      val a = al.args.find(_.role == "a").map(x => gid(x.mention_id)).getOrElse("")
      val b = al.args.find(_.role == "b").map(x => gid(x.mention_id)).getOrElse("")
      if (a.nonEmpty && b.nonEmpty && a != b)
        out += StageBRow("alias", None, None, Some(AliasEdge(a, b, convId)))
    }

    // ---- linked mentions (checkpoint payload) ----------------------------
    entityById.values.toSeq.sortBy(_.mention_id).foreach { m =>
      if (m.labels.head != "Generic_entity") {
        val g = groundings.getOrElse(m.mention_id, Grounding("", "", ""))
        // head label only: the closure is a pure function of the head
        // (Lexicon.labelClosure) and the extra strings dominate the stage-b
        // checkpoint/cache volume
        out += StageBRow("linked", Some(LinkedMention(
          m.mention_id, m.conv_id, m.turn_idx, m.sent_idx, m.start_tok,
          m.end_tok, Array(m.labels.head), m.text, m.found_by, false, "",
          m.args, m.negated, m.hypothesis, g.namespace, g.id, g.species,
          m.mods)), None, None)
      }
    }
    kept.filter(_.labels.head != "Alias").foreach { e =>
      out += StageBRow("linked", Some(LinkedMention(
        e.mention_id, e.conv_id, e.turn_idx, e.sent_idx, e.start_tok,
        e.end_tok, Array(e.labels.head), e.text, e.found_by, true,
        e.trigger_text, e.args, e.negated, e.hypothesis, "evt",
        java.lang.Long.toHexString(e.mention_id), "", e.mods)), None, None)
    }

    // context gids for triple emission (Arizona CONTEXT_* columns) — memoized
    // per (type, turn): nearestCtx scans the conversation's context mentions
    // and emission asks 4 types per event
    val ctxGidCache = mutable.Map.empty[(String, Int), String]
    def ctxGid(tpe: String, turn: Int): String =
      if (!hasCtx) ""
      else ctxGidCache.getOrElseUpdate((tpe, turn),
        nearestCtx(tpe, turn)
          .flatMap(m => groundings.get(m.mention_id)).map(gidOf).getOrElse(""))

    // ---- triple emission (S9 semantics) ----------------------------------
    kept.filter(_.labels.head != "Alias").foreach { e =>
      val head = e.labels.head
      def argM(role: String): Option[MentionRow] =
        e.args.find(_.role == role).flatMap(a => byId.get(a.mention_id))
      val siteText = argM("site").map(_.text).getOrElse("")
      def pt(subj: String, obj: String, obj2: String, objPred: String,
             site: String): PreTriple =
        PreTriple(subj, head, obj, obj2, objPred, site, e.negated,
          e.hypothesis, convId, e.turn_idx, e.text, e.found_by,
          e.trigger_text,
          ctxGid("Species", e.turn_idx), ctxGid("Organ", e.turn_idx),
          ctxGid("CellLine", e.turn_idx), ctxGid("CellType", e.turn_idx),
          e.cue)
      val tri: Option[PreTriple] =
        if (e.labels.contains("Regulation")) {
          val ctl = e.args.find(_.role == "controller")
          val cld = e.args.find(_.role == "controlled")
          (ctl, cld) match {
            case (Some(c), Some(d)) =>
              val subjGid = descend(c.mention_id)._1
              val cldM = byId.get(d.mention_id)
              val (objCore, objSite) = descend(d.mention_id)
              val objPred = cldM.map(_.labels.head).getOrElse("")
              Some(pt(subjGid, objCore, "", objPred, objSite))
            case _ => None
          }
        } else if (e.labels.contains("ActivationEvent")) {
          val subjGid = e.args.find(_.role == "controller")
            .map(c => descend(c.mention_id)._1).getOrElse("")
          val objGid = e.args.find(_.role == "controlled")
            .map(c => descend(c.mention_id)._1).getOrElse("")
          Some(pt(subjGid, objGid, "", "", siteText))
        } else if (head == "Binding") {
          val themes = e.args.filter(_.role == "theme")
            .map(a => descend(a.mention_id)._1).filter(_.nonEmpty).sorted
          if (themes.length >= 2)
            Some(pt("", themes(0), themes(1), "", siteText))
          else None
        } else {
          // simple events: theme(+site); Translocation carries destination gid
          // in site when no residue site present
          val themeGid = argM("theme").map(m => gid(m.mention_id)).getOrElse("")
          val destGid = argM("destination")
            .flatMap(d => groundings.get(d.mention_id)).map(gidOf).getOrElse("")
          val st = if (siteText.nonEmpty) siteText else destGid
          if (themeGid.nonEmpty)
            Some(pt("", themeGid, "", "", st))
          else None
        }
      tri.foreach(t => out += StageBRow("triple", None, Some(t), None))
    }

    out.toSeq
  }
}
