package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonicalization: alias/coref equivalence edges -> connected components ->
  * canonical node ids (reference: assembly/AssemblyManager.scala:1355-1377
  * equivalence-hash dedup + alias sharing across the batch, Alias.scala:46-75).
  *
  * Components are computed with the alternating large-star/small-star
  * map-reduce algorithm (Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC 2014) expressed as DataFrame self-joins — scales to
  * billions of edges; converges in O(log^2 n) rounds. For small edge sets the
  * driver union-find fast path avoids iterative shuffles.
  *
  * Node ordering: non-failsafe (KB-grounded) ids win over `uaz:` failsafe ids,
  * then lexicographic — so a component containing a real grounding is named by
  * it.
  */
object Canon {

  /** Sortable canonical rank key: grounded ids before failsafe ids. */
  def rankKey(gid: String): String =
    (if (gid.startsWith("uaz:")) "1|" else "0|") + gid

  /** edges: DataFrame(a: String, b: String) -> DataFrame(gid, canon_id). */
  def connectedComponents(spark: SparkSession, edges: DataFrame,
                          driverThreshold: Long = 100000L): DataFrame = {
    import spark.implicits._
    val cnt = edges.count()
    if (cnt == 0) {
      spark.emptyDataset[(String, String)].toDF("gid", "canon_id")
    } else if (cnt <= driverThreshold) {
      // small path: driver union-find (alias edge sets are tiny relative to
      // the corpus; avoids log^2-n shuffle rounds)
      val es = edges.as[(String, String)].collect()
      val parent = scala.collection.mutable.Map.empty[String, String]
      def find(x: String): String = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val n = parent(c); parent(c) = r; c = n
        }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          if (rankKey(ra) <= rankKey(rb)) parent(rb) = ra
          else parent(ra) = rb
        }
      }
      val all = es.flatMap { case (a, b) => Seq(a, b) }.distinct
      spark.createDataset(all.toSeq.map(g => (g, find(g))))
        .toDF("gid", "canon_id")
    } else {
      ccLabelProp(spark, edges)
    }
  }

  /** Distributed min-label propagation CC over the undirected edge set:
    * every node repeatedly adopts the minimum rank-key label among itself and
    * its neighbors; converges in O(component diameter) rounds. Alias
    * components are shallow stars (surface-form <-> grounding), so this beats
    * large-star/small-star's constant factors while remaining fully
    * distributed (two shuffles per round: join + groupBy).
    */
  private def ccLabelProp(spark: SparkSession, edges0: DataFrame): DataFrame = {
    import spark.implicits._
    val und = edges0.select(col("a").as("u"), col("b").as("v"))
      .union(edges0.select(col("b").as("u"), col("a").as("v")))
      .where($"u" =!= $"v")
      .select($"u", $"v").distinct()
      .localCheckpoint(true)
    var labels = und.select($"u".as("gid")).distinct()
      .select($"gid", expr(s"concat(case when gid like 'uaz:%' then '1|' else '0|' end, gid)").as("lbl"))
      .localCheckpoint(true)
    var changedCnt = 1L
    var iter = 0
    while (changedCnt > 0 && iter < 30) {
      val nbrLbl = und.join(labels.withColumnRenamed("gid", "v"), "v")
        .select($"u".as("gid"), $"lbl")
      val next = labels.union(nbrLbl)
        .groupBy($"gid").agg(min($"lbl").as("newLbl"))
      val merged = labels.join(next, "gid")
        .select($"gid", least($"lbl", $"newLbl").as("lbl2"),
          ($"newLbl" < $"lbl").cast("long").as("changed"))
      val mergedC = merged.localCheckpoint(true)
      changedCnt = mergedC.agg(sum($"changed")).as[Long].head()
      labels = mergedC.select($"gid", $"lbl2".as("lbl")).localCheckpoint(true)
      iter += 1
    }
    // alias components are shallow stars; a >30-diameter component means the
    // input is not the expected shape — surface it rather than silently
    // emitting a partially-merged labeling
    if (changedCnt > 0)
      System.err.println(s"[graft] WARNING: connected-components label " +
        s"propagation did not converge in $iter iterations " +
        s"($changedCnt labels still changing) — components with diameter " +
        s"> $iter are partially merged")
    labels.select($"gid", expr("substring(lbl, 3)").as("canon_id"))
  }
}
