package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Causal-precedence sieve over the materialized edges (reference:
  * assembly/src/main/scala/org/clulab/reach/assembly/sieves/Sieves.scala:58-336
  * — the inter-sentential discourse-marker subset): an event whose sentence
  * opens with a consequence cue ("as a result", "therefore", ...) is preceded
  * by the events of the previous `lookback` turns that share a grounded
  * participant.
  *
  * Plan shape at scale: cue-marked edges are a small fraction of the corpus,
  * so the join is conv_id-keyed with the cue side filtered first — Catalyst
  * pushes the `cue != ''` filter below the join and AQE will broadcast the
  * small side; participants come from a pure `regexp_extract_all` projection
  * (no UDF).
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

  def precedence(edges: DataFrame, lookback: Int = 3): DataFrame = {
    val withParts = edges.withColumn("parts", participantsExpr)
    val later = withParts.filter(col("cue") =!= "")
      .select(col("conv_id"), col("turn_idx").as("after_turn"),
        col("pred").as("after_pred"), col("obj").as("after_obj"),
        col("parts").as("after_parts"), col("cue"))
    val earlier = withParts.select(col("conv_id"),
      col("turn_idx").as("before_turn"), col("pred").as("before_pred"),
      col("obj").as("before_obj"), col("parts").as("before_parts"))
    later.join(earlier, Seq("conv_id"))
      .filter(col("before_turn") < col("after_turn") &&
        col("before_turn") >= col("after_turn") - lookback)
      .filter(size(array_intersect(col("before_parts"), col("after_parts"))) > 0)
      .select(col("conv_id"), col("before_pred"), col("before_obj"),
        col("before_turn"), col("after_pred"), col("after_obj"),
        col("after_turn"),
        concat(lit("inter-sentential-cue:"), col("cue")).as("sieve"))
  }
}
