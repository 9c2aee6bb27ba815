package graft

import org.apache.spark.sql.SparkSession

/** Build-time helper (NOT part of the driver contract): prints DuckDB VALUES
  * oracles for the deterministic golden-corpus exports (arizona / fries /
  * canonical nodes) and the seeded simhash subset, so they can be pasted into
  * SparkEntry.oracleSql as regression pins. The golden corpus is hand-traced
  * (GoldenSpec exactness), so pinning its derived exports is a valid oracle:
  * any behavioral drift flips the driver row red.
  */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def q(s: String): String = "'" + s.replace("'", "''") + "'"
    def lit(v: Any): String = v match {
      case null => "NULL"
      case s: String => q(s)
      case b: Boolean => b.toString.toUpperCase
      case x => x.toString
    }

    for (name <- Seq("kg_emit_arizona", "kg_canonical_nodes", "kg_emit_fries",
                     "kg_fries_frames", "dedup_simhash", "text_fingerprint",
                     "kg_emit_indexcard", "kg_emit_cmu")) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val cols = df.columns
      val rows = df.collect().map { r =>
        cols.indices.map(i => lit(r.get(i))).mkString("(", ", ", ")")
      }.sorted
      println(s"==== $name (${rows.length} rows) ====")
      println(s"SELECT * FROM (VALUES")
      println(rows.mkString(",\n"))
      println(s") AS t(${cols.mkString(", ")})")
    }
    spark.stop()
  }
}
