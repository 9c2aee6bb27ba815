package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]). Brute-force cosine top-k as the exactness baseline; a
  * random-hyperplane LSH bucketed variant as the scale path (candidates come
  * from one shuffle on bucket keys instead of an n x m cross join).
  * All arithmetic is `functions.aggregate`/`zip_with` over double-cast
  * arrays — codegen-friendly, deterministic left-to-right summation (matches
  * the DuckDB oracle's accumulation order).
  */
object Similarity {

  /** Sequential-fold dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  private def l2(a: Column): Column = sqrt(dot(a, a))

  /** Adds `unit` = embedding normalized to unit length (double precision). */
  def withUnitNorm(df: DataFrame, colName: String): DataFrame = {
    val d = transform(col(colName), x => x.cast("double"))
    df.withColumn("unit",
      transform(d, x => x / l2(d)))
  }

  /** Brute-force cosine top-k: queries x corpus cross join (broadcast the
    * query side — it is small by construction), rank per query.
    * Output (qid, neighbor_id, rank) — integer-only, oracle-stable.
    * Cosine computed as dot/(|a||b|) in double (same formula as the DuckDB
    * oracle) and rounded to 4dp before ranking so cross-engine float
    * accumulation jitter (~1e-15) cannot flip ranks; ties break by id.
    */
  def bruteTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    def prep(df: DataFrame, idAs: String, vecAs: String, nAs: String) = {
      val d = transform(col("embedding"), x => x.cast("double"))
      df.select(col("vec_id").as(idAs), d.as(vecAs),
        sqrt(aggregate(transform(d, x => x * x), lit(0.0d), (a, v) => a + v))
          .as(nAs))
    }
    val corpus = prep(embeddings, "neighbor_id", "cv", "cn")
    val qs = prep(queries, "qid", "qv", "qn")
    val scored = corpus.crossJoin(broadcast(qs))
      .filter(col("qid") =!= col("neighbor_id"))
      .withColumn("sim",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("neighbor_id"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * uniform in [-1, 1) derived from xxhash64 — no RNG state, reproducible
    * across executors and engines.
    */
  private def planeComponent(plane: Column, dim: Column): Column =
    (pmod(xxhash64(concat(lit("plane#"), plane, lit("/"), dim)), lit(2000000L))
      .cast("double") / 1000000.0d) - 1.0d

  /** Sign-bit bucket of an embedding under `bits` hyperplanes of one table. */
  private def bucketOf(unit: Column, table: Int, bits: Int): Column = {
    val dims = sequence(lit(0), size(unit) - 1)
    val bitVals = (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(unit, dims, (x, i) =>
          x * planeComponent(lit(table * 64 + b), i)),
        lit(0.0d), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitVals.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: `tables` independent hyperplane tables of `bits` bits;
    * a corpus vector is a candidate for a query if they share any table's
    * bucket. Exact cosine then ranks candidates. Recall < 1 by construction
    * (approximate); scale shape is groupBy-join on (table, bucket).
    */
  def lshTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
              tables: Int = 16, bits: Int = 4): DataFrame = {
    val corpus = withUnitNorm(embeddings, "embedding")
      .select(col("vec_id").as("neighbor_id"), col("unit").as("cu"))
    val qs = withUnitNorm(queries, "embedding")
      .select(col("vec_id").as("qid"), col("unit").as("qu"))
    def buckets(df: DataFrame, unitCol: String): DataFrame =
      df.select(col("*"), posexplode(array((0 until tables).map(t =>
        bucketOf(col(unitCol), t, bits)): _*)).as(Seq("table", "bucket")))
    val cb = buckets(corpus, "cu")
    val qb = buckets(qs, "qu")
    val cand = cb.join(qb, Seq("table", "bucket"))
      .filter(col("qid") =!= col("neighbor_id"))
      .select("qid", "qu", "neighbor_id", "cu").distinct()
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cand.withColumn("sim", round(dot(col("qu"), col("cu")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("neighbor_id"), col("rank"))
  }
}
