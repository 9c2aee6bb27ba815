package graft

import graft.kg._
import graft.model._

/** Scratch tracing harness (not part of the contract): run the FULL pipeline
  * on ad-hoc conversations and print the emitted edges, for hand-tracing
  * golden pins. Each arg is one conversation; turns are separated by `||`.
  */
object TraceGolden {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val convs = if (args.nonEmpty) args.toSeq else Seq(
      "MEK1 phosphorylates ERK2.")
    val turns = convs.zipWithIndex.flatMap { case (c, ci) =>
      c.split("\\|\\|").toSeq.zipWithIndex.map { case (t, ti) =>
        Turn(s"t$ci", ti, "user", t.trim, "", null)
      }
    }
    val res = Pipeline.extract(spark, turns.toDS())
    res.edges
      .select("conv_id", "turn_idx", "subj", "pred", "obj", "site",
        "negated", "hypothesis")
      .orderBy("conv_id", "turn_idx", "pred", "obj")
      .collect()
      .foreach { r =>
        println(s"EDGE ${r.getString(0)}[${r.getInt(1)}] " +
          s"subj=${r.getString(2)} pred=${r.getString(3)} " +
          s"obj=${r.getString(4)} site=${r.getString(5)} " +
          s"neg=${r.getBoolean(6)} hyp=${r.getBoolean(7)}")
      }
    spark.stop()
  }
}
