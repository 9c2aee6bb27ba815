package graft

import graft.kg._
import org.apache.spark.sql.SparkSession

/** Build-time helper (NOT part of the driver contract): run ad-hoc sentences
  * through the full pipeline and print the emitted triples, for mining new
  * golden fixtures from reference test sentences.
  */
object TrySentences {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sents = scala.io.Source.fromFile(args(0), "UTF-8").getLines().toSeq
      .filter(_.nonEmpty)
    val turns = spark.createDataset(sents.zipWithIndex.map { case (s, i) =>
      Transcripts.mkTurn(f"t$i%02d", 0, "user", s)
    })
    val allEdges = Pipeline.extract(spark, turns).edges
    val edges = allEdges
      .select("conv_id", "subj", "pred", "obj", "site", "negated", "hypothesis")
      .collect()
      .sortBy(r => (r.getString(0), r.getString(2), r.getString(3)))
    sents.zipWithIndex.foreach { case (s, i) =>
      println(f"--- t$i%02d: $s")
      edges.filter(_.getString(0) == f"t$i%02d").foreach { r =>
        println(s"    (${r.getString(1)}, ${r.getString(2)}, ${r.getString(3)}," +
          s" site=${r.getString(4)}, neg=${r.getBoolean(5)}, hyp=${r.getBoolean(6)})")
      }
    }
    if (args.length > 1 && args(1) == "prec") {
      println("=== precedence rows ===")
      Precedence.precedence(allEdges)
        .select("conv_id", "before_pred", "before_obj", "after_pred",
          "after_obj", "sieve")
        .collect()
        .sortBy(_.getString(0))
        .foreach(r => println(s"  ${r.getString(0)}: ${r.getString(1)}(${r.getString(2)})" +
          s" < ${r.getString(3)}(${r.getString(4)}) [${r.getString(5)}]"))
    }
    spark.stop()
  }
}
