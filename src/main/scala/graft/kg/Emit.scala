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

  /** FRIES frame graph (reference: FriesOutput.scala:524-660 — one document
    * per input unit whose frames reference each other by frame id: entity
    * mentions are frames, event mentions are frames whose arguments point at
    * other frames). Built from the stage-B linked mentions: `frame_id` is the
    * deterministic mention id, event `args[].arg` are frame-id references.
    * One row per (conversation, doc part); the frame array is sorted by
    * document position so the JSON is deterministic.
    *
    * Scale: the groupBy is salted with `turn_idx / chunkTurns` (the same span
    * chunking stage B uses), so a mega-conversation becomes a sequence of
    * bounded frame documents instead of one unbounded JSON row. Part 0 keeps
    * the bare conv_id as its document name — single-chunk conversations (the
    * overwhelmingly common case, and the whole golden corpus) are
    * byte-identical to the unchunked output; later parts are suffixed
    * `#<part>`.
    */
  def friesFrameGraph(stageB: DataFrame,
                      chunkTurns: Int = Pipeline.chunkTurns): DataFrame = {
    val linked = stageB.filter(col("kind") === "linked").select("linked.*")
    val frame = struct(
      col("turn_idx"), col("sent_idx"), col("start_tok"), col("end_tok"),
      col("mention_id").as("frame_id"),
      when(col("is_event"), lit("event-mention"))
        .otherwise(lit("entity-mention")).as("frame_type"),
      col("labels")(0).as("type"),
      col("text"),
      when(col("is_event"), lit(""))
        .otherwise(concat(col("ns"), lit(":"), col("ns_id"))).as("xref"),
      col("display_label").as("display"),
      col("trigger_text").as("trigger"),
      transform(col("args"),
        a => struct(a.getField("role").as("role"),
          a.getField("mention_id").as("arg"))).as("args"),
      transform(col("mods"),
        m => struct(m.getField("kind").as("kind"),
          m.getField("label").as("label"),
          m.getField("site_text").as("site"))).as("modifications"),
      col("negated").as("is_negated"),
      col("hypothesis").as("is_hypothesis"))
    linked
      .withColumn("doc_part", floor(col("turn_idx") / chunkTurns))
      .groupBy(col("conv_id"), col("doc_part"))
      .agg(sort_array(collect_list(frame)).as("frames"))
      .select(col("conv_id"),
        to_json(struct(
          when(col("doc_part") === 0, col("conv_id"))
            .otherwise(concat(col("conv_id"), lit("#"), col("doc_part")))
            .as("document"),
          col("frames"))).as("fries"))
  }

  /** Debug text sink (reference: MentionManager.mentionToStrings,
    * utils/MentionManager.scala:48-115 + ReachCLI text output:172-176): one
    * sorted human-readable line per linked mention. Takes the stage-B rows
    * (kind == "linked").
    */
  def debugText(stageB: DataFrame): DataFrame =
    stageB.filter(col("kind") === "linked").select("linked.*")
      .orderBy(col("conv_id"), col("turn_idx"), col("sent_idx"),
        col("start_tok"), col("mention_id"))
      .select(concat(
        when(col("is_event"), lit("EVENT ")).otherwise(lit("ENTITY ")),
        col("labels")(0), lit(" '"), col("text"), lit("' @"),
        col("conv_id"), lit(":"), col("turn_idx"), lit(":"), col("sent_idx"),
        lit(" ["), col("start_tok"), lit(","), col("end_tok"), lit(") "),
        when(col("is_event"), concat(lit("trigger='"), col("trigger_text"),
          lit("' args="), size(col("args"))))
          .otherwise(concat(col("ns"), lit(":"), col("ns_id"))),
        when(col("negated"), lit(" NEG")).otherwise(lit("")),
        when(col("hypothesis"), lit(" HYP")).otherwise(lit("")),
        when(size(col("mods")) > 0,
          concat(lit(" mods="), concat_ws(";",
            transform(col("mods"), m =>
              concat(m.getField("kind"), lit(":"), m.getField("label"),
                lit(":"), m.getField("site_text"))))))
          .otherwise(lit(""))
      ).as("line"))

  /** Arizona-style flat tabular export (reference: export/.../arizona/
    * ArizonaOutputter.scala:14-50 column set; row semantics from
    * assembly/.../export/AssemblyExporter.scala:112-170 and
    * AssemblyRow.scala:80-115):
    *  - INPUT = the consumed participant (theme gid; controlled event key for
    *    regulations), OUTPUT = the produced state (entity + ".label@site" PTM
    *    suffix for modifications; ".a" activated form for positive
    *    activations — createOutput:143-165)
    *  - EVENT_ID = deterministic content hash (the reference's incrementing
    *    ids are nondeterministic under parallelism — SURVEY.md A8)
    *  - INDIRECT per AssemblyRow.isIndirect:80-98 (activations indirect,
    *    simple events/bindings direct, regulation-over-regulation indirect)
    *  - CONTEXT_* from the window+defaults context engine
    *  - TRIGGERS / EVIDENCE / SEEN_IN as sorted "|"-joined strings — sortable
    *    scalars, not arrays, so downstream tabular consumers (and the DuckDB
    *    compare harness) can order rows
    *  - SEEN = evidence count (arizonaFilter keeps rows with seen > 0:
    *    ArizonaOutputter.scala:40-46; every edge here has evidence)
    */
  def arizonaTsv(edges: DataFrame): DataFrame = {
    val isMod = col("pred").isin("Phosphorylation", "Dephosphorylation",
      "Ubiquitination", "Deubiquitination", "Hydroxylation", "Dehydroxylation",
      "Sumoylation", "Desumoylation", "Glycosylation", "Deglycosylation",
      "Acetylation", "Deacetylation", "Farnesylation", "Defarnesylation",
      "Ribosylation", "Deribosylation", "Methylation", "Demethylation")
    val output =
      when(isMod, concat(col("obj"), lit("."),
        lower(substring(col("pred"), 1, 1)),
        when(col("site") =!= "", concat(lit("@"), col("site")))
          .otherwise(lit(""))))
      .when(col("pred") === "Positive_activation", concat(col("obj"), lit(".a")))
      .when(col("pred") === "Binding", col("obj"))
      .otherwise(col("obj"))
    val indirect =
      when(col("pred").rlike("activation$"), lit(true))
      .when(col("pred").rlike("regulation$") &&
        col("obj").rlike("regulation\\("), lit(true))
      .otherwise(lit(false))
    edges
      .withColumn("OUTPUT", output)
      .withColumn("INDIRECT", indirect)
      .groupBy(
        col("obj").as("INPUT"),
        col("OUTPUT"),
        col("subj").as("CONTROLLER"),
        col("pred").as("EVENT_LABEL"),
        col("site").as("SITE"),
        col("negated").as("NEGATED"),
        col("INDIRECT"),
        col("hypothesis").as("HYPOTHESIS"))
      .agg(
        max(col("ctx_species")).as("CONTEXT_SPECIES"),
        max(col("ctx_organ")).as("CONTEXT_ORGAN"),
        max(col("ctx_cell_line")).as("CONTEXT_CELL_LINE"),
        max(col("ctx_cell_type")).as("CONTEXT_CELL_TYPE"),
        when(first(col("pred")) === "Translocation", max(col("site")))
          .otherwise(lit("")).as("TRANSLOCATION_DESTINATION"),
        concat_ws("|", array_sort(collect_set(col("trigger_text"))))
          .as("TRIGGERS"),
        count(lit(1)).as("SEEN"),
        concat_ws(" | ", array_sort(collect_set(col("evidence_text"))))
          .as("EVIDENCE"),
        concat_ws("|", array_sort(collect_set(col("conv_id")))).as("SEEN_IN"))
      .withColumn("EVENT_ID",
        pmod(xxhash64(col("INPUT"), col("OUTPUT"), col("CONTROLLER"),
          col("EVENT_LABEL"), col("SITE"), col("NEGATED"), col("INDIRECT"),
          col("HYPOTHESIS")), lit(Long.MaxValue)))
  }
}
