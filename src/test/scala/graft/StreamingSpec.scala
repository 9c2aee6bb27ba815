package graft

import graft.kg._
import graft.model._
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming mode == batch mode on in-order turn arrival, including
  * cross-turn coref carried through the bounded state.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming triples match batch pipeline across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // g23/g189 exercise the BACKWARD alias rescan (surface used before its
    // definition) — a whole-corpus second pass that streaming append mode
    // cannot replay; the batch==stream equivalence claim excludes them
    // (documented in StreamingPipeline's scaladoc)
    val backwardAlias = Set("g23", "g189")
    val (goldenTurns, _) = Transcripts.golden match {
      case (ts, es) => (ts.filterNot(t => backwardAlias(t.conv_id)), es)
    }
    val batchRes = Pipeline.extract(spark,
      spark.createDataset(goldenTurns))
    val batchKeys = batchRes.edges
      .select("conv_id", "turn_idx", "pred", "negated").collect()
      .map(_.toSeq).toSet

    val stream = MemoryStream[Turn]
    val out = StreamingPipeline.triples(spark, stream.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("triples_out")
      .start()
    try {
      // feed turn 0s first, then turn 1s: cross-turn coref (g08/g09) must
      // resolve via state, not within one batch
      val (t0, t1) = goldenTurns.partition(_.turn_idx == 0)
      stream.addData(t0)
      q.processAllAvailable()
      stream.addData(t1)
      q.processAllAvailable()
      val got = spark.table("triples_out")
        .select("conv_id", "turn_idx", "pred", "negated").collect()
        .map(_.toSeq).toSet
      assert(got == batchKeys,
        s"missing=${batchKeys -- got}\nspurious=${got -- batchKeys}")
    } finally q.stop()
  }

  test("streaming folds with the backward context policy regardless of the " +
       "session Policy4 setting (documented deviation: the forward window " +
       "would need watermark-delayed emission)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // under Policy4 the batch pipeline would fill ctx_species from the
    // FOLLOWING turn (mouse); streaming must emit the turn-0 triple in the
    // micro-batch that processes turn 0, before the species ever arrives —
    // so its ctx_species stays the backward-policy value ("") even with
    // Pipeline.contextPolicy = bidirectional
    val turns = Seq(
      Transcripts.mkTurn("sp4", 0, "user", "ERK2 was phosphorylated at T669."),
      Transcripts.mkTurn("sp4", 1, "assistant", "We studied mouse fibroblasts."))
    val saved = Pipeline.contextPolicy
    try {
      Pipeline.contextPolicy = ConvProcessor.PolicyBidirectional
      val stream = MemoryStream[Turn]
      val out = StreamingPipeline.triples(spark, stream.toDS())
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("triples_p4")
        .start()
      try {
        stream.addData(turns.take(1))
        q.processAllAvailable()
        stream.addData(turns.drop(1))
        q.processAllAvailable()
        val got = spark.table("triples_p4")
          .select("pred", "ctx_species").as[(String, String)].collect()
        val ph = got.filter(_._1 == "Phosphorylation")
        assert(ph.nonEmpty && ph.forall(_._2 == ""),
          s"streaming must stay backward-policy: $got")
      } finally q.stop()
      // batch under the same session setting DOES fill the slot — the
      // deviation is observable and exactly the forward half
      val batch = Pipeline.extract(spark, spark.createDataset(turns)).edges
        .select("pred", "ctx_species").as[(String, String)].collect()
        .filter(_._1 == "Phosphorylation")
      assert(batch.nonEmpty && batch.forall(_._2 == "taxonomy:10090"))
    } finally Pipeline.contextPolicy = saved
  }
}
