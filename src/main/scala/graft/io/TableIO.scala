package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}
import java.nio.file.{Files, Paths, Path}

/** Iceberg-shaped table layer (SURVEY.md §7.0: no Iceberg runtime jar in the
  * sandbox, offline coursier). Named tables backed by partitioned Parquet plus
  * a JSON manifest carrying snapshot-style completion metadata — the pieces
  * the pipeline needs for checkpoint/resume semantics (reference analogue:
  * the restart log, ReachCLI.scala:47-66). Swapping in real Iceberg is a
  * config change: replace read/write with `spark.table` / `writeTo`.
  */
final case class TableIO(root: String) {

  private def tablePath(name: String): String = s"$root/$name"
  private def manifestPath(name: String): Path =
    Paths.get(s"$root/$name/_graft_manifest.json")

  /** Atomic-enough manifest write: parquet first, manifest last — a killed job
    * leaves no manifest, so resume re-runs the stage (exactly-once at stage
    * granularity).
    */
  def write(df: DataFrame, name: String,
            partitionBy: Seq[String] = Nil): Long = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tablePath(name))
    val spark = df.sparkSession
    val rows = spark.read.parquet(tablePath(name)).count()
    val json =
      s"""{"table":"$name","rows":$rows,"complete":true,"ts":${System.currentTimeMillis()}}"""
    Files.createDirectories(manifestPath(name).getParent)
    Files.writeString(manifestPath(name), json)
    rows
  }

  def read(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(tablePath(name))

  /** A stage checkpoint is valid iff its manifest exists and says complete. */
  def isComplete(name: String): Boolean =
    Files.exists(manifestPath(name)) &&
      Files.readString(manifestPath(name)).contains("\"complete\":true")

  def delete(name: String): Unit = {
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).forEach(rm(_))
      Files.deleteIfExists(p)
    }
    val p = Paths.get(tablePath(name))
    if (Files.exists(p)) rm(p)
  }
}
