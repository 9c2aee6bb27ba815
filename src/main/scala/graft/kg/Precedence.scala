package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Causal-precedence sieves over the materialized edges (reference:
  * assembly/src/main/scala/org/clulab/reach/assembly/sieves/Sieves.scala):
  *
  *  1. inter-sentential discourse cue (:58-336 subset): an event whose
  *     sentence opens with a consequence cue ("as a result", "therefore") is
  *     preceded by shared-participant events of the previous `lookback` turns
  *  2. intra-sentential rule-based (:58-84 + intrasentential.yml): an event
  *     whose trigger is preceded by a connective pairs with the nearest
  *     earlier-trigger event in the same sentence — `E1 before|prior-to E2`
  *     keeps textual order, `E1 after|following E2` swaps it, consequence
  *     adverbs ("then", "subsequently", "thereby") keep it
  *  3. Reichenbach tense/aspect (:93-240 + tense_aspect.yml): the reference's
  *     (tense, aspect) x (tense, aspect) decision table over trigger
  *     tense+aspect markers computed at extraction time; restricted to
  *     shared-participant pairs within `lookback` turns (a deliberate
  *     scale-driven narrowing of the reference's all-pairs scan)
  *
  * Earlier sieves win on duplicate pairs (the reference's
  * noExistingPrecedence guard).
  *
  * Plan shape at scale: every sieve joins conv_id-keyed with the marked side
  * filtered first — Catalyst pushes the marker filters below the joins and
  * AQE broadcasts the small sides; participants come from a pure
  * `regexp_extract_all` projection (no UDF).
  */
object Precedence {

  /** Grounded participants of an edge: subject gid + gids embedded in the
    * object key ("Phosphorylation(uniprot:X@S)" / "a&b" composites), site
    * suffixes stripped.
    */
  private val participantsExpr =
    array_distinct(transform(
      expr("regexp_extract_all(concat(subj, ' ', obj), '[a-z]+:[A-Za-z0-9_.:@]+', 0)"),
      p => split(p, "@").getItem(0)))

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

  def precedence(edges: DataFrame, lookback: Int = 3): DataFrame = {
    val withParts = edges.withColumn("parts", participantsExpr)
    def side(prefix: String, extra: (String, String)*): DataFrame = {
      val base = withParts.select(
        Seq(col("conv_id"), col("turn_idx").as(prefix + "_turn"),
          col("sent_idx").as(prefix + "_sent"),
          col("trig_start").as(prefix + "_trig"),
          col("pred").as(prefix + "_pred"), col("obj").as(prefix + "_obj"),
          col("parts").as(prefix + "_parts"),
          col("tense").as(prefix + "_tense")) ++
          extra.map { case (c, a) => col(c).as(a) }: _*)
      base
    }

    // ---- sieve 1: inter-sentential discourse cue -------------------------
    val later = side("after", "cue" -> "cue").filter(col("cue") =!= "")
    val earlier = side("before")
    val cueRows = later.join(earlier, Seq("conv_id"))
      .filter(col("before_turn") < col("after_turn") &&
        col("before_turn") >= col("after_turn") - lookback)
      .filter(size(array_intersect(col("before_parts"), col("after_parts"))) > 0)
      .select(col("conv_id"), col("before_pred"), col("before_obj"),
        col("before_turn"), col("after_pred"), col("after_obj"),
        col("after_turn"),
        concat(lit("inter-sentential-cue:"), col("cue")).as("sieve"),
        lit(1).as("sieve_rank"))

    // ---- sieve 2: intra-sentential rule-based ----------------------------
    // the connective-marked event pairs with every event at the nearest
    // earlier trigger position of the same sentence (split regulations share
    // their event's trigger, so ties are kept); "after"/"following" swap
    // before/after
    val marked = side("m", "intra_cue" -> "icue")
      .filter(col("icue") =!= "" && col("m_trig") >= 0)
    val other = side("o").filter(col("o_trig") >= 0)
      .withColumnRenamed("conv_id", "o_conv")
    val intraPaired = marked.join(other,
        col("conv_id") === col("o_conv") &&
          col("m_turn") === col("o_turn") && col("m_sent") === col("o_sent") &&
          col("o_trig") < col("m_trig"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("conv_id"), col("m_turn"), col("m_sent"),
        col("m_trig"), col("m_pred"), col("m_obj"))
      .orderBy(col("o_trig").desc)
    val intraNearest = intraPaired
      .withColumn("rk", dense_rank().over(w)).filter(col("rk") === 1)
    val swap = col("icue").isin("after", "following")
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
      .filter(size(array_intersect(col("a_parts"), col("b_parts"))) > 0)
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

    // earlier sieves win on duplicate (before, after) pairs
    val unioned = cueRows.unionByName(intraRows).unionByName(tenseRows)
    val dw = Window.partitionBy(col("conv_id"), col("before_pred"),
        col("before_obj"), col("before_turn"), col("after_pred"),
        col("after_obj"), col("after_turn"))
      .orderBy(col("sieve_rank").asc, col("sieve").asc)
    unioned.withColumn("rn", row_number().over(dw)).filter(col("rn") === 1)
      .drop("rn", "sieve_rank")
  }
}
