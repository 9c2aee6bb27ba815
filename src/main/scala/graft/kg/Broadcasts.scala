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
  // survive a SparkContext swap: the reloaded grammar/KB bundle is
  // re-broadcast on the new context, matching singleton-KB re-init semantics
  private var pendingGrammar: BioRules.Grammar = BioRules.default
  private var pendingKb: KbData = KbData.builtin

  /** The grammar actually broadcast: the pending rules with the pending KB
    * bundle's taxonomy and lexicon-derived strict-head alternation applied.
    * With the built-in bundle this is value-identical to [[pendingGrammar]]
    * (same taxonomy map, same rendered head regex), so behavior is
    * unchanged until a KB reload happens.
    */
  private def effectiveGrammar: BioRules.Grammar =
    pendingGrammar.copy(taxonomy = Taxonomy(pendingKb.taxonomyParents))
      .withLexiconHeads(Lexicon.multiwordHeadsOf(pendingKb.lexicon))

  private def ensure(sc: SparkContext): Unit = {
    if (!ctxId.contains(sc.applicationId) || trie == null) {
      trie = sc.broadcast(
        Annotate.buildTrie(pendingKb.lexicon, pendingKb.stopList))
      kb = sc.broadcast(new Link.KbIndex(pendingKb.kb))
      gram = sc.broadcast(effectiveGrammar)
      ctxId = Some(sc.applicationId)
    }
  }

  def get(sc: SparkContext): (Broadcast[Annotate.Trie], Broadcast[Link.KbIndex]) =
    synchronized {
      ensure(sc)
      (trie, kb)
    }

  /** Atomic snapshot of all three broadcasts. Planners that capture more
    * than one of (trie, KB index, grammar) MUST take them from one call —
    * two separate synchronized calls could straddle a concurrent
    * [[reloadKb]] and pair a new trie with an old KB index (a data-added
    * surface would match but ground to the failsafe for one job).
    */
  def all(sc: SparkContext): (Broadcast[Annotate.Trie],
                              Broadcast[Link.KbIndex],
                              Broadcast[BioRules.Grammar]) =
    synchronized {
      ensure(sc)
      (trie, kb, gram)
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
      gram = sc.broadcast(effectiveGrammar)
      // release the old blocks lazily; never blocks running tasks
      if (old != null) old.unpersist(blocking = false)
    }

  /** Rebuild the NER trie, grounding index, and grammar-carried taxonomy/
    * head-alternation from a (data-loaded) KB bundle — the KB face of
    * [[reloadGrammar]] (the reference's TSV KBs are runtime-loaded
    * singletons; this is their broadcast-rebuild analogue). In-flight jobs
    * keep the broadcasts they captured at plan time.
    */
  def reloadKb(sc: SparkContext, data: KbData): Unit =
    synchronized {
      ensure(sc)
      pendingKb = data
      val oldT = trie; val oldK = kb; val oldG = gram
      trie = sc.broadcast(Annotate.buildTrie(data.lexicon, data.stopList))
      kb = sc.broadcast(new Link.KbIndex(data.kb))
      gram = sc.broadcast(effectiveGrammar)
      Seq(oldT, oldK, oldG).foreach(b =>
        if (b != null) b.unpersist(blocking = false))
    }
}
