package graft
import graft.kg._
import org.apache.spark.sql.SparkSession
object DumpMissing {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val (ts, es) = Transcripts.golden
    val res = Pipeline.extract(spark, spark.createDataset(ts))
    val e = Score.keysOf(spark.createDataset(es).toDF())
    val g = Score.keysOf(res.edges)
    val key = Seq("conv_id","turn_idx","subj","pred","obj","site","negated","hypothesis")
    println(s"expected=${e.count()} got=${g.count()}")
    println("== missing =="); e.join(g, key, "left_anti").show(10, false)
    println("== spurious =="); g.join(e, key, "left_anti").show(10, false)
    spark.stop()
  }
}
