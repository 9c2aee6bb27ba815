package graft.kg

import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast

/** Session-singleton broadcasts of the dimension data (NER trie + grounding
  * KB). The reference holds its KBs as lazy JVM singletons
  * (ReachIMKBMentionLookups.scala:19-42, PaperReader.rs); the Spark-correct
  * equivalent is ONE broadcast per SparkContext reused by every stage and
  * every job — re-broadcasting per job churns TorrentBroadcast blocks (and
  * was observed to intermittently stall jobs for exactly
  * spark.network.timeout while a stale block fetch timed out).
  */
object Broadcasts {
  private var ctxId: Option[String] = None
  private var trie: Broadcast[Annotate.Trie] = _
  private var kb: Broadcast[Link.KbIndex] = _

  def get(sc: SparkContext): (Broadcast[Annotate.Trie], Broadcast[Link.KbIndex]) =
    synchronized {
      if (!ctxId.contains(sc.applicationId) || trie == null) {
        trie = sc.broadcast(Annotate.buildTrie(Lexicon.nerLexicon))
        kb = sc.broadcast(new Link.KbIndex(Lexicon.kb))
        ctxId = Some(sc.applicationId)
      }
      (trie, kb)
    }
}
