package graft.kg

import graft.model._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity-link stage: candidate-key generation (the reference's key-transform
  * cascade, grounding/ReachKBKeyTransforms.scala:20-139) + first-hit-wins KB
  * search (ReachEntityLookup.scala:40-69, InMemoryKB.scala:121-143) + species
  * context re-rank (ReachGrounder.scala:68-95).
  *
  * Two equivalent implementations:
  *  - [[KbIndex.resolve]] — broadcast hash-map lookup used inside the
  *    per-conversation stage (map-side join: the KB is MBs, mentions are TBs;
  *    broadcasting the small side and probing in-row is the only shape with
  *    ZERO shuffle — the classic Spark broadcast-join, hand-held so the
  *    first-hit-wins ordering is explicit and deterministic).
  *  - [[linkDF]] — pure DataFrame/Catalyst version (explode keys × broadcast
  *    join × window first-hit) used by the verification queries; demonstrates
  *    that the semantics are relational and DuckDB-checkable.
  */
object Link {

  /** Deterministic first-hit ordering: (kb_rank, key_rank, species_rank, id).
    * species_rank: context-species match < human < no-species < other
    * (reference: ReachKBUtils.scala:107-108 + grounder re-rank).
    */
  def speciesRank(sp: String, ctxSpecies: String): Int =
    if (ctxSpecies.nonEmpty && sp == ctxSpecies) 0
    else if (sp == "human") 1
    else if (sp.isEmpty) 2
    else 3

  /** Canonical key (F1): trim, lowercase, strip space / quote / slash / hyphen
    * / dot (reference: ReachKBKeyTransforms.scala:20-24).
    */
  def canonKey(s: String): String =
    s.trim.toLowerCase.filterNot(c => c == ' ' || c == '\'' || c == '/' || c == '-' || c == '.')

  private val postAttrRe =
    "( (protein|proteins|gene|genes|family|families|kinase|kinases|mutant|complex|enzyme|receptor))+$".r
  private val ptmPrefixRe =
    "^(phosphorylated |phospho-|p-|ubiquitinated |u-|acetylated |methylated |activated )".r
  private val gfpSuffixRe = "(-gfp|-egfp|_human|-wt|-flag|-myc|-ha)$".r
  private val mutantSuffixRe = " [a-z]\\d{1,4}[a-z]?( mutant)?$".r

  /** Ordered candidate keys (key_rank = position). Mirrors the reference's
    * per-KB transform groups (ReachKBKeyTransforms.scala:27-100,142-164):
    * raw canonical key first, then affix-stripped variants.
    */
  def candidateKeys(text: String): Seq[String] = {
    val base = text.trim.toLowerCase
    val k0 = canonKey(base)
    val k1 = canonKey(postAttrRe.replaceAllIn(base, ""))
    val k2 = canonKey(ptmPrefixRe.replaceFirstIn(base, ""))
    val k3 = canonKey(gfpSuffixRe.replaceFirstIn(base, ""))
    val k4 = canonKey(mutantSuffixRe.replaceFirstIn(
      postAttrRe.replaceAllIn(base, ""), ""))
    val k5 = canonKey(ptmPrefixRe.replaceFirstIn(
      postAttrRe.replaceAllIn(base, ""), ""))
    (Seq(k0, k1, k2, k3, k4, k5).distinct).filter(_.nonEmpty)
  }

  /** Same cascade as a Catalyst column array — UDF-free `regexp_replace`
    * chain, fully codegen'd and push-down friendly (SURVEY.md F1-F3).
    */
  def candidateKeysCol(text: Column): Column = {
    def canon(c: Column): Column =
      regexp_replace(lower(trim(c)), "[ '/\\-\\.]", "")
    val base = lower(trim(text))
    val post = regexp_replace(base,
      "( (protein|proteins|gene|genes|family|families|kinase|kinases|mutant|complex|enzyme|receptor))+$", "")
    val ptm = regexp_replace(base,
      "^(phosphorylated |phospho-|p-|ubiquitinated |u-|acetylated |methylated |activated )", "")
    val gfp = regexp_replace(base, "(-gfp|-egfp|_human|-wt|-flag|-myc|-ha)$", "")
    val mut = regexp_replace(post, " [a-z]\\d{1,4}[a-z]?( mutant)?$", "")
    val ptmPost = regexp_replace(post,
      "^(phosphorylated |phospho-|p-|ubiquitinated |u-|acetylated |methylated |activated )", "")
    array_distinct(filter(
      array(canon(base), canon(post), canon(ptm), canon(gfp), canon(mut), canon(ptmPost)),
      k => length(k) > 0))
  }

  /** Deterministic failsafe grounding (replaces the reference's stateful
    * counter, AzFailsafeKBML.scala:18-27): ns `uaz`, id = canonical key.
    */
  def failsafe(text: String): Grounding =
    Grounding("uaz", "UAZ:" + canonKey(text), "")

  /** Broadcast-side KB index: (canonKey, label) -> entries. */
  final class KbIndex(entries: Seq[KBEntry]) extends Serializable {
    val byKeyLabel: Map[(String, String), Array[KBEntry]] =
      entries.groupBy(e => (canonKey(e.text), e.label))
        .map { case (k, v) => k -> v.toArray }

    /** Ordered candidate resolutions (reference: Grounding.nominate keeps the
      * full ordered list with head = winner, Grounding.scala:49-54; the
      * species re-rank reorders it, ReachGrounder.scala:68-95 — here the
      * context-species rank is already part of the ordering key). Returns
      * Nil when no KB hit exists (callers fall back to [[failsafe]]).
      */
    def resolveCandidates(text: String, label: String,
                          ctxSpecies: String): Seq[KBEntry] = {
      val keys = candidateKeys(text)
      var found: List[(((Int, Int, Int, String)), KBEntry)] = Nil
      var ki = 0
      while (ki < keys.length) {
        byKeyLabel.get((keys(ki), label)) match {
          case Some(es) =>
            var i = 0
            while (i < es.length) {
              val e = es(i)
              found = ((e.kb_rank, ki, speciesRank(e.species, ctxSpecies),
                e.id), e) :: found
              i += 1
            }
          case None =>
        }
        ki += 1
      }
      // the key cascade can reach one entry through several keys — keep the
      // best-ranked occurrence of each (ns, id)
      found.sortBy(_._1).map(_._2).distinctBy(e => (e.namespace, e.id))
    }

    /** First-hit-wins resolution with context-species re-rank. */
    def resolve(text: String, label: String, ctxSpecies: String): Grounding =
      resolveCandidates(text, label, ctxSpecies).headOption
        .map(e => Grounding(e.namespace, e.id, e.species))
        .getOrElse(failsafe(text))
  }

  /** Context labels never need KB grounding beyond their own table; events are
    * grounded through their args. Only entity-like labels get linked.
    */
  def linkableLabel(labels: Array[String]): Option[String] = {
    val head = labels.head
    if (head == "Generic_entity") None
    else if (labels.contains("Context") || labels.contains("BioChemicalEntity") ||
             head == "Site" || head == "BioProcess") Some(head)
    else None
  }

  /** DataFrame variant: mentions(text, label) -> first-hit grounding.
    * explode(keys) ⋈ broadcast(kb) + window-first. Used by verification
    * queries; semantics identical to [[KbIndex.resolve]] with empty context.
    */
  def linkDF(spark: SparkSession, mentions: DataFrame, kb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = mentions
      .withColumn("keys", candidateKeysCol(col("text")))
      .select(col("*"), posexplode(col("keys")).as(Seq("key_rank", "key")))
    val kbKeyed = kb.withColumn("kb_key", regexp_replace(lower(trim(col("text"))), "[ '/\\-\\.]", ""))
      .select(col("kb_key"), col("label").as("kb_label"), col("namespace"),
        col("id"), col("species"), col("kb_rank"))
    val joined = keyed.join(broadcast(kbKeyed),
      keyed("key") === kbKeyed("kb_key") && keyed("label") === kbKeyed("kb_label"),
      "left")
    val spRank = when(col("species") === "human", 1)
      .when(col("species") === "" || col("species").isNull, 2).otherwise(3)
    val w = Window.partitionBy(col("mention_key"))
      .orderBy(col("kb_rank").asc_nulls_last, col("key_rank").asc,
        spRank.asc, col("id").asc_nulls_last)
    joined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("ns", coalesce(col("namespace"), lit("uaz")))
      .withColumn("ns_id", coalesce(col("id"),
        concat(lit("UAZ:"), regexp_replace(lower(trim(col("text"))), "[ '/\\-\\.]", ""))))
      .drop("rn", "keys", "key_rank", "key", "kb_key", "kb_label",
        "namespace", "id", "kb_rank")
  }
}
