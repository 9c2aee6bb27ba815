package graft

import graft.kg._
import org.apache.spark.sql.SparkSession

/** Build-time profiling helper (NOT part of the driver contract): times the
  * per-sentence sub-steps of the extraction hot path single-threaded over a
  * generated corpus sample, to locate CPU sinks without Spark noise.
  */
object ProfileKg {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mega = if (args.length > 1) args(1).toInt else 0
    val (turnsDs, _) = Transcripts.corpus(spark, n, seed = 42,
      megaTurns = mega)
    val turns = turnsDs.collect()
    println(s"turns: ${turns.length}")
    val trie = Annotate.buildTrie(Lexicon.nerLexicon)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // warmup JIT
    turns.take(500).foreach { t =>
      val sents = Annotate.annotateText(trie, t.text)
      sents.foreach { s =>
        BioRules.extractSentence(t.conv_id, t.turn_idx, s)
      }
    }

    val annotated = time("annotate") {
      turns.map(t => (t, Annotate.annotateText(trie, t.text)))
    }
    val sents = annotated.flatMap(_._2)
    println(s"sentences: ${sents.length}")
    time("depparse") { sents.foreach(DepParser.parse) }
    val parses = sents.map(s => (s, DepParser.parse(s)))
    time("extractSentence") {
      annotated.foreach { case (t, ss) =>
        ss.foreach(s => BioRules.extractSentence(t.conv_id, t.turn_idx, s)) }
    }
    val defs = time("aliasDefsTurn") {
      annotated.flatMap { case (t, ss) =>
        BioRules.aliasDefsTurn(graft.model.AnnotatedTurn(
          t.conv_id, t.turn_idx, t.role, ss)) }
        .distinct.groupBy(_._1)
        .map { case (c, xs) => c -> xs.map(x => (x._2, x._3)).sorted.toSeq }
    }
    println(s"alias convs: ${defs.size}, max defs/conv: " +
      (if (defs.isEmpty) 0 else defs.values.map(_.size).max))
    time("extract+aliases") {
      annotated.foreach { case (t, ss) =>
        ss.foreach(s => BioRules.extractSentence(t.conv_id, t.turn_idx, s,
          defs.getOrElse(t.conv_id, Nil))) }
    }
    spark.stop()
  }
}
