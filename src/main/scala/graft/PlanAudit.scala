package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit helper: prints `explain(formatted)` for the headline
  * contract queries so plan regressions (lost pushdown, broadcast turned
  * shuffle, codegen breaks) are reviewable in BENCH/PLANS.md. Not part of the
  * driver contract.
  */
object PlanAudit {
  private val audited = Seq(
    "q1_agg", "q_join_broadcast", "q_window_running", "kg_mentions",
    "kg_link_firsthit", "dedup_exact", "dedup_minhash_lsh", "ann_brute", "ann_ivf",
    "text_quality", "text_search", "text_search_phrase", "kg_precedence",
    "kg_emit_assembly", "kg_emit_serial", "kg_emit_indexcard",
    "text_repetition", "text_ngram_topk", "text_sample_stratified")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    audited.foreach { name =>
      println(s"\n===================== $name =====================")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
    }
    spark.stop()
  }
}
