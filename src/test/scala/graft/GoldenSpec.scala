package graft

import graft.kg._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

/** Exactness gate on the hand-traced golden corpus (BASELINE.md: exact triple
  * reproduction on the curated golden subset).
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("golden corpus reproduces expected triples exactly") {
    val turns = Transcripts.goldenTurns(spark)
    val res = Pipeline.extract(spark, turns)
    val edges = res.edges.cache()
    val expected = Transcripts.goldenExpected(spark).toDF()
    val pr = Score.score(edges, expected)
    if (pr.fp > 0 || pr.fn > 0) {
      val (spurious, missing) = Score.diff(spark, edges, expected)
      println("=== SPURIOUS (got but not expected) ===")
      spurious.orderBy("conv_id", "turn_idx").show(100, false)
      println("=== MISSING (expected but not got) ===")
      missing.orderBy("conv_id", "turn_idx").show(100, false)
    }
    assert(pr.fp == 0 && pr.fn == 0, s"golden mismatch: $pr")
  }

  test("gene pool groundings are pairwise distinct") {
    val gids = Transcripts.genePool.map(g => Transcripts.gidOf(g))
    assert(gids.distinct.size == gids.size,
      s"duplicate groundings: ${gids.groupBy(identity).filter(_._2.size > 1).keys}")
    assert(gids.forall(!_.startsWith("uaz:")), "gene pool must be KB-grounded")
  }
}
