package graft

import graft.kg._
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint/serialization round-trips (reference: TestMentionSerialization
  * + serialization/TestJSONSerializer — mentions survive a serializer
  * round-trip with full structural equality). Here the serializer is the
  * checkpoint format itself: typed Datasets through parquet (the stage
  * boundary tables, io/TableIO) and the JSON export path. Nested arg/mod
  * arrays and every flag must survive both.
  */
class SerializationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.toJSON.collect().sorted.toSeq

  test("mention rows round-trip through parquet with nested args/mods intact") {
    import spark.implicits._
    val turns = Transcripts.goldenTurns(spark)
    val acc = spark.sparkContext.collectionAccumulator[Lineage]("ser-test")
    val mentions = Pipeline.stageMentions(spark, turns, "ser-test", acc)
    val dir = java.nio.file.Files.createTempDirectory("kgser").toString

    mentions.write.mode("overwrite").parquet(s"$dir/mentions")
    val back = spark.read.parquet(s"$dir/mentions").as[MentionRow]

    // full structural equality, nested structs included
    assert(canon(back.toDF()) == canon(mentions.toDF()))
    // the typed view decodes: every event's args refer to mention ids that
    // exist in the same conversation (arg-reference integrity after decode)
    val rows = back.collect()
    val ids = rows.map(_.mention_id).toSet
    val dangling = rows.filter(_.is_event)
      .flatMap(_.args.map(_.mention_id)).filterNot(ids.contains)
    assert(dangling.isEmpty, s"dangling arg refs after round-trip: ${dangling.take(5).toList}")
    // mods/flags survive (at least one golden mention carries each)
    assert(rows.exists(_.mods.nonEmpty))
    assert(rows.exists(_.negated))
  }

  test("edges and nodes round-trip through parquet and json unchanged") {
    val res = Pipeline.extract(spark, Transcripts.goldenTurns(spark))
    val dir = java.nio.file.Files.createTempDirectory("kgser2").toString

    res.edges.write.mode("overwrite").parquet(s"$dir/edges")
    res.nodes.write.mode("overwrite").parquet(s"$dir/nodes")
    val edgesBack = spark.read.parquet(s"$dir/edges")
    val nodesBack = spark.read.parquet(s"$dir/nodes")
    assert(canon(edgesBack) == canon(res.edges))
    assert(canon(nodesBack) == canon(res.nodes))

    // JSON export path (the reference's json serializer analogue): schema is
    // re-imposed on read — values must survive the text round-trip
    res.edges.write.mode("overwrite").json(s"$dir/edges_json")
    val jsonBack = spark.read.schema(res.edges.schema).json(s"$dir/edges_json")
    assert(canon(jsonBack) == canon(res.edges))
  }
}
