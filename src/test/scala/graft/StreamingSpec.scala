package graft

import graft.kg._
import graft.model._
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
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

  test("streaming Policy4 delayed emission: turns seal once their forward " +
       "window is complete; the idle-timeout flush makes streaming ≡ batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val turns = Seq(
      Transcripts.mkTurn("p4", 0, "user", "ERK2 was phosphorylated at T669."),
      Transcripts.mkTurn("p4", 1, "assistant", "We studied mouse fibroblasts."),
      Transcripts.mkTurn("p4", 2, "user", "Data handling followed procedures."),
      Transcripts.mkTurn("p4", 3, "assistant", "Additional runs were recorded."),
      Transcripts.mkTurn("p4", 4, "user", "JAK3 phosphorylates HuR."))

    // batch Policy4 reference output
    val saved = Pipeline.contextPolicy
    val batch = try {
      Pipeline.contextPolicy = ConvProcessor.PolicyBidirectional
      Pipeline.extract(spark, spark.createDataset(turns)).edges
        .select("turn_idx", "pred", "ctx_species")
        .as[(Int, String, String)].collect().toSet
    } finally Pipeline.contextPolicy = saved

    // no idleTimeout in the streamed part: processing-time timeouts spin
    // continuous timeout-check micro-batches that defeat
    // processAllAvailable in a deterministic test — the flush body is
    // exercised directly below with the exact state the handler holds
    val stream = MemoryStream[Turn]
    val out = StreamingPipeline.triples(spark, stream.toDS(),
      contextPolicy = ConvProcessor.PolicyBidirectional)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("triples_p4d").start()
    val sealedOut =
      try {
        stream.addData(turns)
        q.processAllAvailable()
        spark.table("triples_p4d").filter(col("conv_id") === "p4")
          .select("turn_idx", "pred", "ctx_species")
          .as[(Int, String, String)].collect().toSet
      } finally q.stop()
    // frontier is turn 4 -> sealed through turn 1: the turn-0 event
    // emits WITH the forward-filled species (full Policy4 window)...
    assert(sealedOut.contains((0, "Phosphorylation", "taxonomy:10090")),
      sealedOut.toString)
    // ...but the frontier turn's triples are held back (no forward
    // window yet — emitting now would freeze ctx prematurely)
    assert(!sealedOut.exists(_._1 == 4), sealedOut.toString)

    // idle-timeout flush ≡ batch end-of-conversation: drive the factored
    // flush body with the state the handler holds after the batch above
    // (mentions of the retained window, frontier sealed through turn 1)
    val trie = Annotate.buildTrie(Lexicon.nerLexicon)
    val mentions = turns.flatMap(t =>
      BioRules.extractTurn(AnnotatedTurn(t.conv_id, t.turn_idx, t.role,
        Annotate.annotateText(trie, t.text))))
    val st = StreamingPipeline.ConvState(mentions, Nil, maxTurn = 4,
      emittedThrough = 1)
    val flushed = StreamingPipeline.flushPending("p4", st,
        new Link.KbIndex(Lexicon.kb), ConvProcessor.PolicyBidirectional)
      .map(t => (t.turn_idx, t.pred, t.ctx_species)).toSet
    assert(flushed.forall(_._1 > 1), flushed.toString)
    val streamedTotal = sealedOut ++ flushed
    assert(streamedTotal == batch,
      s"missing=${batch -- streamedTotal}\nspurious=${streamedTotal -- batch}")
  }

  test("streaming defaults to the backward policy and never consults the " +
       "session Pipeline.contextPolicy (a streaming query outlives driver " +
       "mutations; Policy4 is opted into via the explicit parameter)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // with the DEFAULT (backward) policy the turn-0 triple emits in the
    // micro-batch that processes turn 0, before the species arrives, so
    // its ctx_species stays "" even when the session global is flipped to
    // bidirectional — delayed emission happens only via the explicit
    // contextPolicy parameter (previous test)
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
