package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-native full-text search — the distributed re-expression of the
  * reference's Lucene index/search pair (NxmlIndexer +
  * `main/src/main/scala/org/clulab/reach/indexer/NxmlSearcher.scala:26-107`:
  * StandardAnalyzer tokenization, TF-IDF ranking, `search(query, totalHits)`
  * top-k, QueryParser phrase queries). Instead of a single-node Lucene
  * directory, the index is a plain DataFrame of posting rows — at 100 TB it
  * is written bucketed/sorted by `term` so a query's `term IN (...)` filter
  * prunes row groups at the scan, which is exactly the role Lucene's term
  * dictionary plays on one node.
  *
  * Plan shape at scale:
  *  - index build: narrow tokenize+posexplode, then ONE exchange for the
  *    (term, doc) partial-aggregated count + position list — no other
  *    shuffle; corpus statistics (doc count, average doc length) are
  *    computed HERE, once, so searches never run statistics actions;
  *  - search: pushed-down `term IN (...)` scan filter over the postings,
  *    broadcast of the tiny per-term document-frequency side, one partial
  *    agg by doc, global top-k via TakeOrderedAndProject (no full sort);
  *  - phrase search: per-term pruned posting scans joined on doc_id (each
  *    side is one phrase-term's postings — small), adjacency checked by
  *    array math on the position lists; no new shuffle class.
  */
object TextSearch {

  /** Analyzer: lowercase, split on non-alphanumerics, drop 1-char tokens and
    * a small stopword list (the StandardAnalyzer defaults, trimmed to what
    * both engines of the driver's oracle can express identically).
    */
  val stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "this", "was", "for", "on", "with", "as", "by")

  /** Posting-list table: one row per (term, doc_id) with term frequency and
    * the term's RAW token positions (indices into the pre-stopword split, so
    * position adjacency == textual adjacency — what phrase queries need).
    * Materialize once (bucketed by term at scale), search many times.
    */
  def index(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), "[^a-z0-9]+")))
      .withColumnRenamed("col", "term")
      .filter(length(col("term")) >= 2 && !col("term").isin(stopwords: _*))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))

  /** Per-term document frequency (the term-dictionary statistics). */
  def docFreq(index: DataFrame): DataFrame =
    index.groupBy("term").agg(count(lit(1)).as("df"))

  /** A built index: postings + the corpus statistics every ranked search
    * needs. Statistics run ONCE here (one aggregation action) — per-query
    * search calls are then pure lazy plans with zero driver actions
    * (Lucene's analogue: segment statistics written at index time).
    */
  final case class SearchIndex(postings: DataFrame, docLen: DataFrame,
                               nDocs: Long, avgDl: Double)

  def buildIndex(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): SearchIndex = {
    val postings = index(docs, idCol, textCol)
    val docLen = postings.groupBy("doc_id").agg(sum("tf").as("dl"))
    val row = docLen.agg(count(lit(1)).as("n"), sum("dl").as("total")).head()
    val n = row.getLong(0)
    val total = if (row.isNullAt(1)) 0L else row.getLong(1)
    SearchIndex(postings, docLen, n, if (n == 0) 0.0 else total.toDouble / n)
  }

  /** Persist an index: postings hash-distributed and SORTED by term within
    * each file (the parquet row-group min/max statistics on `term` then
    * prune a search's `term IN (...)` predicate at the scan — the
    * distributed analogue of Lucene's term dictionary), plus doc lengths
    * and the corpus statistics. Build once, search many: a production
    * deployment materializes this next to the corpus and every query is a
    * pure lazy plan over it.
    */
  def saveIndex(idx: SearchIndex, dir: String): Unit = {
    idx.postings
      .repartition(col("term")).sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(s"$dir/postings")
    idx.docLen.write.mode("overwrite").parquet(s"$dir/doclen")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    Seq((idx.nDocs, idx.avgDl)).toDF("n_docs", "avg_dl").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  def loadIndex(spark: org.apache.spark.sql.SparkSession,
                dir: String): SearchIndex = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    SearchIndex(spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/doclen"),
      meta.getAs[Long]("n_docs"), meta.getAs[Double]("avg_dl"))
  }

  /** TF-IDF top-k search (NxmlSearcher.search analogue). `mode` "any" ranks
    * by summed tf*ln(N/df) over matching terms; "all" additionally requires
    * every query term to appear (Lucene's conjunctive BooleanQuery).
    * Deterministic: ties broken by doc_id; scores rounded to 4 decimals so
    * the driver's DuckDB oracle hashes identically.
    */
  def search(index: DataFrame, nDocs: Long, query: Seq[String],
             topK: Int = 10, mode: String = "any"): DataFrame = {
    val terms = query.map(_.toLowerCase).distinct
    val hits = index.filter(col("term").isin(terms: _*))
      .join(broadcast(docFreq(index).filter(col("term").isin(terms: _*))),
        Seq("term"))
      .withColumn("w", col("tf") * log(lit(nDocs.toDouble) / col("df")))
    val scored = hits.groupBy("doc_id")
      .agg(round(sum(col("w")), 4).as("score"),
        count(lit(1)).as("n_terms"))
    val kept =
      if (mode == "all") scored.filter(col("n_terms") === terms.length)
      else scored
    kept.select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Phrase search (Lucene QueryParser `"exact phrase"` analogue): documents
    * where the query terms occur at consecutive raw token positions, ranked
    * by occurrence count. Every phrase term must be indexable (>= 2 chars,
    * not a stopword) — the same restriction a stopword-stripping Lucene
    * analyzer imposes on phrase terms.
    *
    * Plan: one pruned posting scan per phrase term (the `term = t` filter is
    * pushed to the scan), joined pairwise on doc_id — each side is a single
    * term's posting list, so these are small equi-joins, not a new shuffle
    * class; adjacency is `positions` array math, no re-tokenization.
    */
  def searchPhrase(index: DataFrame, phrase: Seq[String],
                   topK: Int = 10): DataFrame = {
    val terms = phrase.map(_.toLowerCase)
    require(terms.nonEmpty, "empty phrase")
    require(terms.forall(t => t.length >= 2 && !stopwords.contains(t)),
      s"phrase terms must be indexable (>=2 chars, non-stopword): $terms")
    val parts = terms.zipWithIndex.map { case (t, i) =>
      index.filter(col("term") === t)
        .select(col("doc_id"), col("positions").as(s"p$i"))
    }
    val joined = parts.reduce((a, b) => a.join(b, "doc_id"))
    // occurrence count = positions p in term0's list such that term i sits
    // at p+i for every following i
    val adjacent: Column => Column = p =>
      terms.indices.tail
        .map(i => array_contains(col(s"p$i"), p + lit(i)))
        .foldLeft(lit(true))(_ && _)
    joined
      .withColumn("score",
        size(filter(col("p0"), p => adjacent(p))).cast("long"))
      .filter(col("score") > 0)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** BM25 top-k (k1/b defaults as Lucene's BM25Similarity) — same plan shape
    * as [[search]]; ranking differs only through saturation and length
    * normalization. Takes a [[SearchIndex]] so corpus statistics come from
    * index-build time: this call runs NO driver actions.
    */
  def searchBm25(idx: SearchIndex, query: Seq[String],
                 topK: Int = 10, k1: Double = 1.2,
                 b: Double = 0.75): DataFrame = {
    val terms = query.map(_.toLowerCase).distinct
    val hits = idx.postings.filter(col("term").isin(terms: _*))
      .join(
        broadcast(docFreq(idx.postings).filter(col("term").isin(terms: _*))),
        Seq("term"))
      .join(idx.docLen, Seq("doc_id"))
    val idf = log(lit(1.0) +
      (lit(idx.nDocs.toDouble) - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)))
    val norm = col("tf") * (lit(k1) + lit(1.0)) /
      (col("tf") + lit(k1) *
        (lit(1.0 - b) + lit(b) * col("dl") / lit(idx.avgDl)))
    hits.withColumn("w", idf * norm)
      .groupBy("doc_id").agg(round(sum("w"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
  }
}
