package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Triple-level precision/recall scorer (BASELINE.md gate: P/R >= 0.95).
  * Match key: (conv_id, turn_idx, subj, pred, obj, site, negated, hypothesis).
  * Duplicate keys are counted once (set semantics, matching the reference's
  * corefDistinct output dedup).
  */
object Score {
  final case class PR(tp: Long, fp: Long, fn: Long) {
    def precision: Double = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    def f1: Double = {
      val (p, r) = (precision, recall)
      if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    }
    override def toString: String =
      f"P=$precision%.4f R=$recall%.4f F1=$f1%.4f (tp=$tp fp=$fp fn=$fn)"
  }

  private val keyCols =
    Seq("conv_id", "turn_idx", "subj", "pred", "obj", "site", "negated", "hypothesis")

  def keysOf(df: DataFrame): DataFrame =
    df.select(keyCols.map(col): _*).distinct()

  def score(got: DataFrame, expected: DataFrame): PR = {
    val g = keysOf(got).cache()
    val e = keysOf(expected).cache()
    val tp = g.join(e, keyCols, "inner").count()
    val fp = g.count() - tp
    val fn = e.count() - tp
    PR(tp, fp, fn)
  }

  /** Diff helper for debugging fixture mismatches. */
  def diff(spark: SparkSession, got: DataFrame, expected: DataFrame): (DataFrame, DataFrame) = {
    val g = keysOf(got); val e = keysOf(expected)
    (g.join(e, keyCols, "left_anti"), e.join(g, keyCols, "left_anti"))
  }
}
