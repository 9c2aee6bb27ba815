package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Export sinks beyond the primary edges/nodes tables (SURVEY.md §2.1 S8-S10).
  */
object Emit {

  /** FRIES-shaped nested JSON export (reference: export/.../fries/
    * FriesOutput.scala:75-111 — one frame per event with nested argument
    * frames). Here: one JSON object per edge with nested subj/obj frames,
    * grouped per conversation. `to_json` keeps it columnar until the write.
    */
  def friesJson(edges: DataFrame): DataFrame =
    edges.select(to_json(struct(
      col("edge_id").as("frame_id"),
      lit("event-mention").as("frame_type"),
      col("pred").as("type"),
      struct(col("subj").as("canon_id")).as("controller"),
      struct(col("obj").as("canon_id"), col("site").as("site")).as("argument"),
      col("negated").as("is_negated"),
      col("hypothesis").as("is_hypothesis"),
      struct(col("conv_id"), col("turn_idx"),
        col("evidence_text").as("text")).as("provenance"),
      col("found_by")
    )).as("frame"))

  /** Arizona-style flat tabular export (reference: export/.../arizona/
    * ArizonaOutputter.scala:14-50): INPUT / OUTPUT / CONTROLLER / EVENT_LABEL
    * / NEGATED / SEEN / EVIDENCE — directly from the edges table with
    * per-edge occurrence counts aggregated across the corpus.
    */
  def arizonaTsv(edges: DataFrame): DataFrame =
    edges.groupBy(
      col("obj").as("INPUT"),
      col("pred").as("EVENT_LABEL"),
      col("subj").as("CONTROLLER"),
      col("site").as("SITE"),
      col("negated").as("NEGATED"),
      col("hypothesis").as("HYPOTHESIS"))
      .agg(count(lit(1)).as("SEEN"),
        array_sort(collect_set(col("evidence_text"))).as("EVIDENCE"))
}
