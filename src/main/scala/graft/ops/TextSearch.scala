package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-native full-text search — the distributed re-expression of the
  * reference's Lucene index/search pair (NxmlIndexer +
  * `main/src/main/scala/org/clulab/reach/indexer/NxmlSearcher.scala:26-107`:
  * StandardAnalyzer tokenization, TF-IDF ranking, `search(query, totalHits)`
  * top-k). Instead of a single-node Lucene directory, the index is a plain
  * DataFrame of posting rows — at 100 TB it is written bucketed/sorted by
  * `term` so a query's `term IN (...)` filter prunes row groups at the scan,
  * which is exactly the role Lucene's term dictionary plays on one node.
  *
  * Plan shape at scale:
  *  - index build: narrow tokenize+explode, then ONE exchange for the
  *    (term, doc) partial-aggregated count — no other shuffle;
  *  - search: pushed-down `term IN (...)` scan filter over the postings,
  *    broadcast of the tiny per-term document-frequency side, one partial
  *    agg by doc, global top-k via TakeOrderedAndProject (no full sort).
  */
object TextSearch {

  /** Analyzer: lowercase, split on non-alphanumerics, drop 1-char tokens and
    * a small stopword list (the StandardAnalyzer defaults, trimmed to what
    * both engines of the driver's oracle can express identically).
    */
  val stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "this", "was", "for", "on", "with", "as", "by")

  private def tokensCol(textCol: String) = {
    val stop = stopwords.map(s => s"'$s'").mkString("array(", ", ", ")")
    expr(s"filter(split(lower($textCol), '[^a-z0-9]+'), " +
      s"x -> length(x) >= 2 and not array_contains($stop, x))")
  }

  /** Posting-list table: one row per (term, doc_id) with term frequency.
    * Materialize once (bucketed by term at scale), search many times.
    */
  def index(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(tokensCol(textCol)).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))

  /** Per-term document frequency (the term-dictionary statistics). */
  def docFreq(index: DataFrame): DataFrame =
    index.groupBy("term").agg(count(lit(1)).as("df"))

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

  /** BM25 variant (k1/b defaults as Lucene's BM25Similarity) — same plan
    * shape; ranking differs from TF-IDF only through saturation and
    * length normalization.
    */
  def searchBm25(index: DataFrame, docs: DataFrame, query: Seq[String],
                 topK: Int = 10, k1: Double = 1.2,
                 b: Double = 0.75): DataFrame = {
    val terms = query.map(_.toLowerCase).distinct
    val docLen = index.groupBy("doc_id").agg(sum("tf").as("dl"))
    val nDocs = docLen.count()
    val avgDl = index.agg(sum("tf")).head().getLong(0).toDouble / nDocs
    val hits = index.filter(col("term").isin(terms: _*))
      .join(broadcast(docFreq(index).filter(col("term").isin(terms: _*))),
        Seq("term"))
      .join(docLen, Seq("doc_id"))
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") * (lit(k1) + lit(1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgDl)))
    hits.withColumn("w", idf * norm)
      .groupBy("doc_id").agg(round(sum("w"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
  }
}
