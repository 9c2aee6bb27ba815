package graft

import org.apache.spark.sql.SparkSession

/** Build-time helper (NOT part of the driver contract): prints the output of
  * named SparkEntry queries as DuckDB VALUES rows, for hand-checking sample
  * oracles while developing. Usage: runMain graft.ShowQuery name1 name2 ...
  */
object ShowQuery {
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

    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val cols = df.columns
      val rows = df.collect().map { r =>
        cols.indices.map(i => lit(r.get(i))).mkString("(", ", ", ")")
      }.sorted
      println(s"==== $name (${rows.length} rows) ====")
      println(rows.mkString(",\n"))
      println(s") AS t(${cols.mkString(", ")})")
    }
    spark.stop()
  }
}
