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
    // manifest row count observed from the write job itself (Observation =
    // driver-collected accumulator metrics) — re-reading the table we just
    // wrote would double checkpoint I/O at scale
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
    val w = observed.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tablePath(name))
    val rows = obs.get("rows").asInstanceOf[Long]
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
