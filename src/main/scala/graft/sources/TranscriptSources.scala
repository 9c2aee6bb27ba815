package graft.sources

import graft.model.Turn
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Source adapters producing the canonical `turns` table
  * (conv_id, turn_idx, role, text, tool, ts) from the formats the reference
  * reads (SURVEY.md §2.1): delimiter-separated files (S2, DSVParser.scala:
  * 23-60), plain text (S3, PaperReader.scala:103-107), and JSON-lines; plus
  * the parquet/Iceberg-shaped primary path.
  *
  * All are plain `spark.read` + projections — schema normalization happens in
  * Catalyst, so predicate pushdown and column pruning reach the file scan.
  */
object TranscriptSources {

  private val turnCols = Seq("conv_id", "turn_idx", "role", "text", "tool", "ts")

  def parquet(spark: SparkSession, path: String): Dataset[Turn] = {
    import spark.implicits._
    spark.read.parquet(path).select(turnCols.map(col): _*).as[Turn]
  }

  /** DSV (csv/tsv): columns conv_id, turn_idx, role, text[, tool[, ts]].
    * Missing tool/ts are filled (reference DSV rows have no timestamps).
    */
  def dsv(spark: SparkSession, path: String, delimiter: String = "\t",
          header: Boolean = true): Dataset[Turn] = {
    import spark.implicits._
    val raw = spark.read
      .option("delimiter", delimiter)
      .option("header", header.toString)
      .option("inferSchema", "false")
      .csv(path)
    normalize(raw)
  }

  /** JSON-lines with the turn schema (tolerant of extra fields). */
  def jsonl(spark: SparkSession, path: String): Dataset[Turn] = {
    import spark.implicits._
    normalize(spark.read.json(path))
  }

  /** Plain text: one file = one single-turn conversation (reference S3:
    * whole file -> one entry). conv_id = file name, turn_idx = 0.
    */
  def text(spark: SparkSession, path: String): Dataset[Turn] = {
    import spark.implicits._
    spark.read.textFile(path)
      .withColumn("conv_id",
        regexp_extract(input_file_name(), "([^/]+)$", 1))
      .groupBy(col("conv_id"))
      .agg(concat_ws("\n", collect_list(col("value"))).as("text"))
      .select(col("conv_id"), lit(0).as("turn_idx"), lit("user").as("role"),
        col("text"), lit(null).cast("string").as("tool"),
        lit(null).cast("timestamp").as("ts"))
      .as[Turn]
  }

  private def normalize(df: DataFrame): Dataset[Turn] = {
    import df.sparkSession.implicits._
    val withDefaults = Seq(
      "tool" -> lit(null).cast("string"),
      "ts" -> lit(null).cast("timestamp")
    ).foldLeft(df) { case (d, (c, default)) =>
      if (d.columns.contains(c)) d else d.withColumn(c, default)
    }
    withDefaults.select(
      col("conv_id").cast("string"),
      col("turn_idx").cast("int"),
      col("role").cast("string"),
      col("text").cast("string"),
      col("tool").cast("string"),
      col("ts").cast("timestamp")).as[Turn]
  }
}
