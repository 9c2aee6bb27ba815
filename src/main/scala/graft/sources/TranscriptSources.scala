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

  /** Extension-sniffed delimiter (reference: DSVParser.getDelimiter:92-96 —
    * ".tsv" -> tab, ".csv" -> comma, anything else is an error).
    */
  def dsvDelimiter(fileName: String): String = {
    val dot = fileName.lastIndexOf('.')
    val ext = if (dot < 0) "" else fileName.substring(dot + 1).toLowerCase
    ext match {
      case "tsv" => "\t"
      case "csv" => ","
      case other =>
        throw new IllegalArgumentException(
          s"'$other' is not a supported extension")
    }
  }

  /** Quote-aware line split with a column limit (reference: DSVParser.CSV
    * lookahead regex + getSplitPattern:99-103 — commas inside balanced
    * double quotes do not split; the limit keeps embedded delimiters in the
    * text column) followed by the surrounding-quote trim (DSVParser.trim).
    */
  def splitDsvLine(line: String, delimiter: String, numCols: Int): Array[String] = {
    val pattern = delimiter match {
      case "," => ",(?=([^\"]*\"[^\"]*\")*[^\"]*$)"
      case "\t" => "\t"
      case other => java.util.regex.Pattern.quote(other)
    }
    val quoted = "^\"(.*?)\"$".r
    line.split(pattern, numCols).map {
      case quoted(inside) => inside
      case s => s
    }
  }

  /** Positional DSV in the reference's toFriesEntries shape
    * (DSVParser.scala:23-64): delimiter sniffed from the extension,
    * positional (docId, chunkId[, sectionId], text) columns, quote handling
    * equivalent to [[splitDsvLine]] (Spark's csv quote option implements the
    * same outside-quotes split for well-formed files, keeping the scan
    * pushdown-friendly), and the sections-to-ignore filter
    * (`entries.filterNot(sectionsToIgnore contains _.sectionId)`).
    */
  def dsvEntries(spark: SparkSession, path: String,
                 docIdColumn: Int = 0, chunkIdColumn: Int = 1,
                 sectionIdColumn: Int = -1, textColumn: Int = 2,
                 hasHeader: Boolean = true,
                 sectionsToIgnore: Set[String] = Set.empty): Dataset[Turn] = {
    import spark.implicits._
    val raw = spark.read
      .option("delimiter", dsvDelimiter(path))
      .option("header", hasHeader.toString)
      .option("quote", "\"")
      .option("inferSchema", "false")
      .csv(path)
    val cols = raw.columns
    val section =
      if (sectionIdColumn >= 0) col(cols(sectionIdColumn)) else lit("")
    val turns = raw.select(
      col(cols(docIdColumn)).cast("string").as("conv_id"),
      col(cols(chunkIdColumn)).cast("int").as("turn_idx"),
      section.cast("string").as("role"),
      col(cols(textColumn)).cast("string").as("text"),
      lit(null).cast("string").as("tool"),
      lit(null).cast("timestamp").as("ts")).as[Turn]
    if (sectionsToIgnore.isEmpty) turns
    else turns.filter(!col("role").isin(sectionsToIgnore.toSeq: _*))
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
