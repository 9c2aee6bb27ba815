package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Causal-precedence sieves over the materialized edges (reference:
  * assembly/src/main/scala/org/clulab/reach/assembly/sieves/Sieves.scala):
  *
  *  1. inter-sentential rule-based (:240-281 + intersentential.yml): an
  *     event opening its sentence after a discourse cue pairs with the
  *     events of the nearest preceding event-bearing sentence. "after"
  *     cues ("then", "subsequently", "as a result", timex advmod) put the
  *     cued event AFTER them; "before" cues ("previously", "prior to
  *     this") put it BEFORE. The reference pairs with sentence-1 exactly;
  *     transcripts interleave event-less tool/ack turns, so the
  *     domain-right generalization is nearest event-bearing sentence
  *     within `lookback` turns.
  *  2. intra-sentential rule-based (:58-84 + intrasentential.yml): an
  *     event whose trigger is preceded by a connective pairs with the
  *     nearest earlier-trigger event in the same sentence — keep-order
  *     connectives ("before", "precedes", "thereby", "results in") leave
  *     textual order; swap connectives ("after", "following", "due to",
  *     "dependent on", "in response to", "result of") invert it.
  *  3. Reichenbach tense/aspect (:93-240 + tense_aspect.yml): the
  *     reference's (tense, aspect) x (tense, aspect) decision table over
  *     trigger tense+aspect markers computed at extraction time, applied
  *     to textually-ordered event pairs. The reference scans all pairs per
  *     document; at 10^12 turns that is quadratic per conversation, so
  *     pairs are bounded to `lookback` turns (the TAM cues themselves are
  *     sentence-local, so long-range pairs add noise, not signal).
  *
  * Every sieve applies the reference's isValidRelationPair constraints
  * (Constraints.scala:127-160): the two events must be distinct, a
  * regulation is never paired with its own controlled, and two activations
  * must not share their controlled. Earlier sieves win on duplicate pairs
  * in either direction (the reference's noExistingPrecedence guard).
  *
  * Plan shape at scale: every sieve joins conv_id-keyed with the marked
  * side filtered first — Catalyst pushes the marker filters below the
  * joins and AQE broadcasts the small sides; the constraints are pure
  * column expressions (no UDF).
  */
object Precedence {

  /** Connectives whose marked (textually later) event PRECEDES the earlier
    * one (intrasentential.yml assembly-prep-syntax-2 "after|following",
    * assembly-verb-syntax-2a "follows", -syntax-3 "due to|because of",
    * -syntax-3/surface-5 "result of", surface-3 "in response to",
    * -dependent-on).
    */
  private val intraSwapCues = Seq("after", "following", "follows",
    "followed", "due_to", "because_of", "in_response_to", "dependent_on",
    "result_of", "results_from")

  /** The reference's Reichenbach decision table (Sieves.scala:120-149),
    * keyed by "tense[|perf]" markers of the textually-first and -second
    * events; values: "before" (first precedes second) / "after" (second
    * precedes first).
    */
  private val reichenbach: Seq[((String, String), String)] = Seq(
    ("past|perf", "past") -> "before",
    ("past|perf", "present") -> "before",
    ("past|perf", "present|perf") -> "before",
    ("past|perf", "future") -> "before",
    ("past|perf", "future|perf") -> "before",
    ("past", "future") -> "before",
    ("past", "future|perf") -> "before",
    ("present", "future") -> "before",
    ("present|perf", "future") -> "before",
    ("present|perf", "future|perf") -> "before",
    ("past", "past|perf") -> "after",
    ("present", "past|perf") -> "after",
    ("present|perf", "past|perf") -> "after",
    ("future", "past") -> "after",
    ("future", "past|perf") -> "after",
    ("future", "present") -> "after",
    ("future", "present|perf") -> "after",
    ("future|perf", "past") -> "after",
    ("future|perf", "past|perf") -> "after",
    ("future|perf", "present|perf") -> "after")

  private def relExpr(t1: Column, t2: Column): Column =
    reichenbach.foldLeft(lit("none")) { case (acc, ((a, b), rel)) =>
      when(t1 === a && t2 === b, rel).otherwise(acc)
    }

  /** The composite event key a regulation's obj column uses for its
    * controlled ("Phosphorylation(uniprot:X@S)").
    */
  private def composite(pred: Column, obj: Column, site: Column): Column =
    concat(pred, lit("("), obj,
      when(site =!= "", concat(lit("@"), site)).otherwise(lit("")), lit(")"))

  /** Constraints.isValidRelationPair (reference :127-160): distinct events;
    * a regulation never pairs with its own controlled; two activations
    * must not share their controlled.
    */
  private def validPair(aPred: Column, aObj: Column, aSite: Column,
                        bPred: Column, bObj: Column, bSite: Column): Column =
    (aPred =!= bPred || aObj =!= bObj) &&
      aObj =!= composite(bPred, bObj, bSite) &&
      bObj =!= composite(aPred, aObj, aSite) &&
      !(aPred.contains("activation") && bPred.contains("activation") &&
        aObj === bObj)

  // ---- sieve 4: feature-based classifier (shared-args variant) -----------

  /** Classifier labels (reference: AssemblyRelationClassifier.scala label
    * set; Sieves.classifyCausalPrecedencePairs:486-511 keeps non-NEG).
    */
  val E1PrecedesE2 = "E1PrecedesE2"
  val E2PrecedesE1 = "E2PrecedesE1"
  val NEG = "NEG"

  /** Pluggable causal-precedence pair classifier — the reproducible face of
    * the reference's `featureBasedClassifierWithSharedArgs` sieve
    * (Sieves.scala:302-322). The trained model it loads (`fbc.model`,
    * named at assembly reference.conf:44) is NOT vendored in the reference
    * tree, so what is reproducible from public content is: the candidate
    * gating (withinWindow ∘ shareArg ∘ isValidRelationPair,
    * Constraints.scala:43-160), the feature columns, and this interface —
    * with a deterministic default standing in for the absent model.
    * `classify` must add `label` (E1PrecedesE2 / E2PrecedesE1 / NEG) and
    * `score` columns to the gated candidate-pair frame; implementations
    * stay in Catalyst columns so the sieve remains UDF-free and codegen'd.
    */
  trait PairClassifier extends Serializable {
    def name: String
    def classify(pairs: DataFrame): DataFrame
  }

  /** Deterministic default: a gated pair (within window, sharing an input
    * participant, constraint-valid) is labeled in narrative order —
    * E1PrecedesE2 with a flat 0.5 score. Narrative order as the prior for
    * shared-participant event pairs is the assembly literature's baseline
    * intuition, and it is exactly reproducible by any SQL engine (the
    * oracle requirement); swap in a real model via [[PairClassifier]].
    */
  object NarrativeOrderClassifier extends PairClassifier {
    val name = "narrative-order-default"
    def classify(pairs: DataFrame): DataFrame =
      pairs.withColumn("label", lit(E1PrecedesE2))
        .withColumn("score", lit(0.5))
  }

  /** Input-participant grounding ids of an edge (the reference's
    * `getInput`/EntityEventRepresentation.I, Constraints.scala:45-54): the
    * theme/controlled participants packed in `obj` ("a&b" n-mers; a
    * regulation's composite "Pred(inner@site)" contributes its inner id)
    * plus the controller in `subj`.
    */
  private def inputIds(subj: Column, obj: Column): Column = {
    val inner = when(obj.contains("("),
      regexp_extract(obj, "\\(([^@)]+)", 1)).otherwise(obj)
    array_distinct(filter(concat(split(inner, "&"), array(subj)),
      x => length(x) > 0))
  }

  /** Gated candidate pairs + feature columns. Gating =
    * `meetsRequirements` (Sieves.scala:304-310): within the sentential
    * window (reference kWindow default 1, reference.conf:24 — interpreted
    * over the (turn_idx, sent_idx) lattice: same turn and |Δsent| <=
    * kWindow, or Δturn <= kWindow, since transcripts make the turn the
    * sentence group), sharing an input participant by grounding id
    * (Constraints.shareArg:43-67 fuzzyIntersects), and
    * isValidRelationPair. Pairs are oriented textually (e1 strictly before
    * e2), so every unordered pair appears once and classification is
    * deterministic. Features are the subset of FeatureExtractor.mkFeatures
    * computable exactly from the edge table (label pair, cross-sentence
    * flag, turn/sentence/trigger distances, tense pair, the shared ids);
    * token-level surface features (interceding n-grams, syntactic paths)
    * would ride the edge table as extra columns if a trained model needed
    * them — the edge table deliberately does not carry sentence text.
    *
    * Scale shape: one conv_id-keyed self-join with the window bound in the
    * join condition (bounded fan-out per event), constraints as pure
    * column expressions.
    */
  def featureCandidates(edges: DataFrame, kWindow: Int = 1): DataFrame = {
    require(kWindow >= 0, "window size must be >= 0")
    def sideF(p: String): DataFrame = edges.select(
      col("conv_id").as(p + "_conv"), col("turn_idx").as(p + "_turn"),
      col("sent_idx").as(p + "_sent"), col("trig_start").as(p + "_trig"),
      col("subj").as(p + "_subj"), col("pred").as(p + "_pred"),
      col("obj").as(p + "_obj"), col("site").as(p + "_site"),
      col("tense").as(p + "_tense"))
    val a = sideF("a")
    val b = sideF("b")
    val textuallyOrdered =
      col("a_turn") < col("b_turn") ||
        (col("a_turn") === col("b_turn") &&
          (col("a_sent") < col("b_sent") ||
            (col("a_sent") === col("b_sent") &&
              col("a_trig") < col("b_trig"))))
    val withinWindow =
      (col("a_turn") === col("b_turn") &&
        abs(col("a_sent") - col("b_sent")) <= kWindow) ||
        (col("b_turn") - col("a_turn")).between(1, kWindow)
    a.join(b, col("a_conv") === col("b_conv") && textuallyOrdered &&
        withinWindow)
      .filter(validPair(col("a_pred"), col("a_obj"), col("a_site"),
        col("b_pred"), col("b_obj"), col("b_site")))
      .withColumn("f_shared_ids", array_intersect(
        inputIds(col("a_subj"), col("a_obj")),
        inputIds(col("b_subj"), col("b_obj"))))
      .filter(size(col("f_shared_ids")) > 0) // Constraints.shareArg
      .withColumn("f_label_pair", concat_ws("|", col("a_pred"), col("b_pred")))
      .withColumn("f_cross_sent",
        col("a_turn") =!= col("b_turn") || col("a_sent") =!= col("b_sent"))
      .withColumn("f_turn_dist", col("b_turn") - col("a_turn"))
      .withColumn("f_sent_dist", when(col("a_turn") === col("b_turn"),
        col("b_sent") - col("a_sent")).otherwise(lit(-1)))
      .withColumn("f_trig_dist", when(!col("f_cross_sent"),
        col("b_trig") - col("a_trig")).otherwise(lit(-1)))
      .withColumn("f_tense_pair",
        concat_ws("|", col("a_tense"), col("b_tense")))
      .withColumnRenamed("a_conv", "conv_id").drop("b_conv")
  }

  /** The feature-based sieve: gate, classify, keep non-NEG, orient by the
    * label (classifyCausalPrecedencePairs:486-511 shape; the
    * noExistingPrecedence guard is the cross-sieve dedup in
    * [[precedence]]).
    */
  def featureBased(edges: DataFrame,
                   clf: PairClassifier = NarrativeOrderClassifier,
                   kWindow: Int = 1): DataFrame = {
    val classified = clf.classify(featureCandidates(edges, kWindow))
      .filter(col("label") =!= NEG)
    val e1First = col("label") === E1PrecedesE2
    classified.select(
      col("conv_id"),
      when(e1First, col("a_pred")).otherwise(col("b_pred")).as("before_pred"),
      when(e1First, col("a_obj")).otherwise(col("b_obj")).as("before_obj"),
      when(e1First, col("a_turn")).otherwise(col("b_turn")).as("before_turn"),
      when(e1First, col("b_pred")).otherwise(col("a_pred")).as("after_pred"),
      when(e1First, col("b_obj")).otherwise(col("a_obj")).as("after_obj"),
      when(e1First, col("b_turn")).otherwise(col("a_turn")).as("after_turn"),
      concat(lit("feature-based-classifier:"), lit(clf.name)).as("sieve"),
      col("score"))
  }

  def precedence(edges: DataFrame, lookback: Int = 3,
                 clf: PairClassifier = NarrativeOrderClassifier,
                 kWindow: Int = 1): DataFrame = {
    def side(prefix: String, extra: (String, String)*): DataFrame =
      edges.select(
        Seq(col("conv_id"), col("turn_idx").as(prefix + "_turn"),
          col("sent_idx").as(prefix + "_sent"),
          col("trig_start").as(prefix + "_trig"),
          col("pred").as(prefix + "_pred"), col("obj").as(prefix + "_obj"),
          col("site").as(prefix + "_site"),
          col("tense").as(prefix + "_tense")) ++
          extra.map { case (c, a) => col(c).as(a) }: _*)

    // ---- sieve 1: inter-sentential discourse cue -------------------------
    // the cue-marked event pairs with every event of the nearest preceding
    // event-bearing sentence (reference: rel.sentence - 1)
    val marked = side("m", "cue" -> "cue").filter(col("cue") =!= "")
      .withColumn("cue_dir", split(col("cue"), ":").getItem(0))
      .withColumn("cue_name", split(col("cue"), ":").getItem(1))
    val other = side("o").withColumnRenamed("conv_id", "o_conv")
    val interPaired = marked.join(other,
        col("conv_id") === col("o_conv") && (
          (col("o_turn") === col("m_turn") && col("o_sent") < col("m_sent")) ||
          (col("o_turn") < col("m_turn") &&
            col("o_turn") >= col("m_turn") - lookback)))
      .filter(validPair(col("m_pred"), col("m_obj"), col("m_site"),
        col("o_pred"), col("o_obj"), col("o_site")))
    val mw = Window.partitionBy(col("conv_id"), col("m_turn"), col("m_sent"),
        col("m_trig"), col("m_pred"), col("m_obj"), col("m_site"))
      .orderBy(col("o_turn").desc, col("o_sent").desc)
    val interNearest = interPaired
      .withColumn("rk", dense_rank().over(mw)).filter(col("rk") === 1)
    val cueSwap = col("cue_dir") === "before"
    val cueRows = interNearest.select(
      col("conv_id"),
      when(cueSwap, col("m_pred")).otherwise(col("o_pred")).as("before_pred"),
      when(cueSwap, col("m_obj")).otherwise(col("o_obj")).as("before_obj"),
      when(cueSwap, col("m_turn")).otherwise(col("o_turn")).as("before_turn"),
      when(cueSwap, col("o_pred")).otherwise(col("m_pred")).as("after_pred"),
      when(cueSwap, col("o_obj")).otherwise(col("m_obj")).as("after_obj"),
      when(cueSwap, col("o_turn")).otherwise(col("m_turn")).as("after_turn"),
      concat(lit("inter-sentential-rb:"), col("cue_name")).as("sieve"),
      lit(1).as("sieve_rank"))

    // ---- sieve 2: intra-sentential rule-based ----------------------------
    // the connective-marked event pairs with every event at the nearest
    // earlier trigger position of the same sentence (split regulations share
    // their event's trigger, so ties are kept)
    val imarked = side("m", "intra_cue" -> "icue")
      .filter(col("icue") =!= "" && col("m_trig") >= 0)
    val iother = side("o").filter(col("o_trig") >= 0)
      .withColumnRenamed("conv_id", "o_conv")
    val intraPaired = imarked.join(iother,
        col("conv_id") === col("o_conv") &&
          col("m_turn") === col("o_turn") && col("m_sent") === col("o_sent") &&
          col("o_trig") < col("m_trig"))
      .filter(validPair(col("m_pred"), col("m_obj"), col("m_site"),
        col("o_pred"), col("o_obj"), col("o_site")))
    val w = Window.partitionBy(col("conv_id"), col("m_turn"), col("m_sent"),
        col("m_trig"), col("m_pred"), col("m_obj"), col("m_site"))
      .orderBy(col("o_trig").desc)
    val intraRanked = intraPaired.withColumn("rk", dense_rank().over(w))
    val intraR1 = intraRanked.filter(col("rk") === 1).drop("rk")
    // a regulation OVER a nearest event shares its anchor position in the
    // reference's dep-anchored match ("E2-induced SRC-3 phosphorylation is
    // dependent on ..." pairs the interaction with BOTH the phosphorylation
    // and its regulation, TestAssemblySieves intraSent1) — its own trigger
    // ("induced") sits earlier, so the trigger rank alone would drop it
    val r1keys = intraR1.select(col("conv_id").as("k_conv"),
        col("m_turn").as("k_turn"), col("m_sent").as("k_sent"),
        col("m_trig").as("k_mtrig"), col("m_pred").as("k_mpred"),
        col("m_obj").as("k_mobj"), col("m_site").as("k_msite"),
        composite(col("o_pred"), col("o_obj"), col("o_site")).as("k_comp"))
      .distinct()
    val intraReg = intraRanked.filter(col("rk") > 1).drop("rk")
      .join(r1keys,
        col("conv_id") === col("k_conv") && col("m_turn") === col("k_turn") &&
          col("m_sent") === col("k_sent") && col("m_trig") === col("k_mtrig") &&
          col("m_pred") === col("k_mpred") && col("m_obj") === col("k_mobj") &&
          col("m_site") === col("k_msite") && col("o_obj") === col("k_comp"))
      .drop("k_conv", "k_turn", "k_sent", "k_mtrig", "k_mpred", "k_mobj",
        "k_msite", "k_comp")
    val intraNearest = intraR1.unionByName(intraReg)
    val swap = col("icue").isin(intraSwapCues: _*)
    val intraRows = intraNearest.select(
      col("conv_id"),
      when(swap, col("m_pred")).otherwise(col("o_pred")).as("before_pred"),
      when(swap, col("m_obj")).otherwise(col("o_obj")).as("before_obj"),
      col("m_turn").as("before_turn"),
      when(swap, col("o_pred")).otherwise(col("m_pred")).as("after_pred"),
      when(swap, col("o_obj")).otherwise(col("m_obj")).as("after_obj"),
      col("m_turn").as("after_turn"),
      concat(lit("intra-sentential-rb:"), col("icue")).as("sieve"),
      lit(2).as("sieve_rank"))

    // ---- sieve 3: Reichenbach tense/aspect -------------------------------
    val a = side("a").filter(col("a_tense") =!= "")
    val b = side("b").filter(col("b_tense") =!= "")
      .withColumnRenamed("conv_id", "b_conv")
    val ordered = a.join(b,
        col("conv_id") === col("b_conv") && (
          (col("a_turn") < col("b_turn") &&
            col("a_turn") >= col("b_turn") - lookback) ||
          (col("a_turn") === col("b_turn") &&
            (col("a_sent") < col("b_sent") ||
              (col("a_sent") === col("b_sent") &&
                col("a_trig") < col("b_trig"))))))
      .filter(validPair(col("a_pred"), col("a_obj"), col("a_site"),
        col("b_pred"), col("b_obj"), col("b_site")))
      .withColumn("rel", relExpr(col("a_tense"), col("b_tense")))
      .filter(col("rel") =!= "none")
    val relSwap = col("rel") === "after"
    val tenseRows = ordered.select(
      col("conv_id"),
      when(relSwap, col("b_pred")).otherwise(col("a_pred")).as("before_pred"),
      when(relSwap, col("b_obj")).otherwise(col("a_obj")).as("before_obj"),
      when(relSwap, col("b_turn")).otherwise(col("a_turn")).as("before_turn"),
      when(relSwap, col("a_pred")).otherwise(col("b_pred")).as("after_pred"),
      when(relSwap, col("a_obj")).otherwise(col("b_obj")).as("after_obj"),
      when(relSwap, col("a_turn")).otherwise(col("b_turn")).as("after_turn"),
      lit("reichenbach-tense").as("sieve"),
      lit(3).as("sieve_rank"))

    // ---- sieve 4: feature-based classifier (shared-args gating) ----------
    // runs after the rule-based sieves, exactly as the reference's
    // applySieves order ends with the classifier sieve (Assembler.scala:
    // 137-152); the cross-sieve dedup below is its noExistingPrecedence
    val featRows = featureBased(edges, clf, kWindow)
      .drop("score").withColumn("sieve_rank", lit(4))

    // earlier sieves win on duplicate pairs in EITHER direction (the
    // reference's noExistingPrecedence checks both)
    val unioned = cueRows.unionByName(intraRows).unionByName(tenseRows)
      .unionByName(featRows)
    val beforeKey = concat_ws("|", col("before_pred"), col("before_obj"),
      col("before_turn"))
    val afterKey = concat_ws("|", col("after_pred"), col("after_obj"),
      col("after_turn"))
    val dw = Window.partitionBy(col("conv_id"),
        least(beforeKey, afterKey), greatest(beforeKey, afterKey))
      .orderBy(col("sieve_rank").asc, col("sieve").asc)
    unioned.withColumn("rn", row_number().over(dw)).filter(col("rn") === 1)
      .drop("rn", "sieve_rank")
  }
}
