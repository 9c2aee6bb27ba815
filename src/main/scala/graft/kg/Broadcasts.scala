package graft.kg

import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast

/** Session-singleton broadcasts of the dimension data (NER trie + grounding
  * KB + rule grammar). The reference holds its KBs as lazy JVM singletons
  * (ReachIMKBMentionLookups.scala:19-42, PaperReader.rs); the Spark-correct
  * equivalent is ONE broadcast per SparkContext reused by every stage and
  * every job — re-broadcasting per job churns TorrentBroadcast blocks (and
  * was observed to intermittently stall jobs for exactly
  * spark.network.timeout while a stale block fetch timed out).
  *
  * The grammar broadcast is additionally RELOADABLE ([[reloadGrammar]]) —
  * the analogue of the reference's per-request rule recompilation
  * (RuleReader.reload, export ApiRuler): swap in a grammar parsed from data
  * ([[RuleDsl]]) and every subsequently planned job matches with it.
  */
object Broadcasts {
  private var ctxId: Option[String] = None
  private var trie: Broadcast[Annotate.Trie] = _
  private var kb: Broadcast[Link.KbIndex] = _
  private var gram: Broadcast[BioRules.Grammar] = _
  // survives a SparkContext swap: the reloaded grammar is re-broadcast on
  // the new context, matching the singleton-KB re-init semantics
  private var pendingGrammar: BioRules.Grammar = BioRules.default

  private def ensure(sc: SparkContext): Unit = {
    if (!ctxId.contains(sc.applicationId) || trie == null) {
      trie = sc.broadcast(Annotate.buildTrie(Lexicon.nerLexicon))
      kb = sc.broadcast(new Link.KbIndex(Lexicon.kb))
      gram = sc.broadcast(pendingGrammar)
      ctxId = Some(sc.applicationId)
    }
  }

  def get(sc: SparkContext): (Broadcast[Annotate.Trie], Broadcast[Link.KbIndex]) =
    synchronized {
      ensure(sc)
      (trie, kb)
    }

  /** The current matcher-table broadcast (built-in grammar until a reload). */
  def grammar(sc: SparkContext): Broadcast[BioRules.Grammar] =
    synchronized {
      ensure(sc)
      gram
    }

  /** Rebuild the broadcast matcher tables from a new grammar (ApiRuler /
    * RuleReader.reload analogue). In-flight jobs keep the broadcast they
    * captured at plan time; new plans see the new grammar.
    */
  def reloadGrammar(sc: SparkContext, g: BioRules.Grammar): Unit =
    synchronized {
      ensure(sc)
      pendingGrammar = g
      val old = gram
      gram = sc.broadcast(g)
      // release the old blocks lazily; never blocks running tasks
      if (old != null) old.unpersist(blocking = false)
    }
}
