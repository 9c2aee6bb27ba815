package graft.streaming

import graft.kg._
import graft.model._
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming mode of the KG pipeline (SURVEY.md §2.8): the batch
  * pipeline's per-conversation operators are all *backward-looking* (context
  * window <= 3 turns, coref <= 1 turn), so the streaming form keeps a bounded
  * per-conversation state — the mentions of the last [[lookback]] turns — and
  * re-runs the same partition-local fold over (state ++ new turns), emitting
  * only the new turns' triples. Semantics match the batch pipeline exactly
  * for in-order turn arrival (verified in StreamingSpec).
  *
  * The reference has no streaming; its analogue is whole-file reprocessing
  * via the restart log (ReachCLI.scala:47-66). Here a late conversation turn
  * simply extends the conversation's state.
  *
  * Known deviation from batch: the BACKWARD alias rescan (J3 — an alias
  * surface used before its parenthetical definition) requires a second pass
  * over already-emitted turns, which append-mode streaming cannot replay;
  * batch mode covers it. Forward uses (definition in an earlier or the same
  * turn) resolve exactly as in batch: alias defs accumulate in the
  * per-conversation state and extraction runs inside the fold with them.
  *
  * Second known deviation: the Policy4 bidirectional context window
  * ([[graft.kg.ConvProcessor.PolicyBidirectional]]) is batch-only — its
  * forward half would require holding each turn's triples back until
  * `contextBound` further turns (or a watermark) arrive, i.e.
  * watermark-delayed emission, which this append-mode fold deliberately
  * does not do (a turn's triples emit in the micro-batch that processes
  * the turn). Streaming always folds with the backward policy — the
  * reference's own default (Policies.scala Policy2/3) — regardless of
  * [[graft.kg.Pipeline.contextPolicy]]; StreamingSpec pins this.
  *
  * Scale: state is O(lookback x mentions-per-turn) per live conversation;
  * with watermarking on `ts` (caller adds `withWatermark` upstream) idle
  * conversations age out via the processing-time timeout.
  */
object StreamingPipeline {

  val lookback = 4 // turns kept in state: covers context bound 3 + coref 1

  final case class ConvState(mentions: Seq[MentionRow],
                             aliasDefs: Seq[(String, String)], maxTurn: Int)

  // cheap token guard: only turns that can possibly DEFINE an alias pay the
  // defs pre-scan (mirrors the batch pre-filter in Pipeline.aliasDefsDs)
  private def mayDefineAlias(at: AnnotatedTurn): Boolean =
    at.sents.exists(s => s.words.exists(w =>
      w == "(" || w == "known" || w == "called" || w == "referred" ||
        w == "designated" || w == "termed" || w == "named"))

  def triples(spark: SparkSession, turns: Dataset[Turn],
              idleTimeout: Option[String] = None): Dataset[PreTriple] = {
    import spark.implicits._
    val (bTrie, bKb, bG) = Broadcasts.all(spark.sparkContext)

    // stage 1 (stateless, streaming-safe): annotate per turn. Rule matching
    // moves into the stateful fold so FORWARD alias uses (definition in an
    // earlier — or the same — turn) inject rescan surfaces exactly as the
    // batch pre-pass does; only the BACKWARD rescan stays batch-only.
    val annotated: Dataset[AnnotatedTurn] = turns
      .filter(t => t.role != "tool" && t.text != null && t.text.nonEmpty)
      .map(t => AnnotatedTurn(t.conv_id, t.turn_idx, t.role,
        Annotate.annotateText(bTrie.value, t.text)))

    // stage 2 (stateful): bounded-lookback conversation fold; state carries
    // the last `lookback` turns' mentions plus ALL alias defs seen so far
    // (tiny — parenthetical definitions are rare)
    annotated
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(
        (convId: String, it: Iterator[AnnotatedTurn], state: GroupState[ConvState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val incoming = it.toSeq.sortBy(_.turn_idx)
            val prior = state.getOption.map(_.mentions).getOrElse(Seq.empty)
            var defs = state.getOption.map(_.aliasDefs).getOrElse(Seq.empty)
            val newMentions = incoming.flatMap { at =>
              if (mayDefineAlias(at)) {
                val d = BioRules.aliasDefsTurn(at, bG.value)
                  .map(x => (x._2, x._3))
                if (d.nonEmpty) defs = (defs ++ d).distinct.sorted
              }
              BioRules.extractTurn(at, defs, bG.value)
            }
            val newMinTurn =
              if (incoming.isEmpty) Int.MaxValue
              else incoming.map(_.turn_idx).min
            val all = prior ++ newMentions
            val out = ConvProcessor.process(convId, all, bKb.value)
              .flatMap(_.triple)
              .filter(_.turn_idx >= newMinTurn)
            val maxTurn =
              if (all.isEmpty) state.getOption.map(_.maxTurn).getOrElse(0)
              else all.map(_.turn_idx).max
            state.update(ConvState(
              all.filter(_.turn_idx > maxTurn - lookback), defs, maxTurn))
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
        })
  }
}
