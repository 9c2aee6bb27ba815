package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize stages.
  *
  * The actual codecs are NOT available in this environment, so the decode
  * step is a clearly-marked deterministic STUB (`stubDecode`) — but the
  * Spark-side plumbing is real and what matters at scale: binary columns
  * survive parquet round-trips, metadata lives in a struct column for
  * predicate pushdown (filter on width without touching bytes), decode runs
  * batched per partition via mapPartitions (the Scala analogue of
  * mapInPandas: amortized per-batch setup, arrow-sized batches), and
  * feature vectors come out as Array[Float] ready for the Similarity ops.
  */
object Multimodal {

  final case class MediaRow(
      doc_id: Long,
      media: Array[Byte],
      width: Int,
      height: Int,
      format: String,
      n_bytes: Long
  )

  final case class FeatureRow(
      doc_id: Long,
      width: Int,
      height: Int,
      features: Array[Float]
  )

  /** Synthesize a media table from documents: bytes = utf-8 of text (opaque
    * payload stand-in), metadata derived deterministically. Pure expressions
    * — SQL-oracle checkable.
    */
  def attachMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      (pmod(col("doc_id") * 37 + length(col("text")), lit(1280)) + 32)
        .cast("int").as("width"),
      (pmod(col("doc_id") * 53 + length(col("text")), lit(720)) + 32)
        .cast("int").as("height"),
      element_at(array(lit("jpeg"), lit("png"), lit("webp")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
      length(col("text")).cast("long").as("n_bytes"))

  /** STUB decoder: a real implementation would JNI/FFI into an image codec
    * here; the deterministic fake derives an 8-dim feature vector from the
    * byte payload so downstream plumbing (schema, batching, similarity) is
    * fully exercised. Batched per partition — setup cost paid once per task,
    * not per row (the mapInPandas batching contract).
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[FeatureRow] = {
    import spark.implicits._
    media.select("doc_id", "media", "width", "height").as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        // per-partition "codec" init would happen here
        rows.map { case (id, bytes, w, h) =>
          FeatureRow(id, w, h, stubDecode(bytes))
        }
      }
  }

  /** Deterministic fake decode: 8 float features from byte-histogram moments.
    * Replace with a real codec call in production (marked stub).
    */
  def stubDecode(bytes: Array[Byte]): Array[Float] = {
    val feats = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      feats(b % 8) += 1.0f
      i += 1
    }
    val n = math.max(1, bytes.length).toFloat
    feats.map(_ / n)
  }

  /** Frame sampling for video-like media: uniform-k frame selection over a
    * per-doc frame count, one output row per sampled frame carrying byte-range
    * POINTERS into the payload (offset + length), never the bytes themselves —
    * at 100 TB the frame extractor seeks into the original blob storage, so
    * the shuffle moves a few integers per frame, not video. All integer
    * arithmetic (truncating long division in both engines), so the DuckDB
    * oracle is bit-exact. The frame count itself is metadata the container
    * header would provide; the stand-in derives it deterministically, the
    * same contract as [[attachMedia]].
    */
  def sampleFrames(media: DataFrame, k: Int = 4, fps: Int = 24): DataFrame = {
    val nFrames = (pmod(col("doc_id") * 17 + col("n_bytes"), lit(240)) + 8)
      .cast("long")
    // truncating division via floor(): inputs are non-negative and far below
    // 2^53, so the double intermediate is exact and matches DuckDB's `//`
    val idxs = array_distinct(transform(sequence(lit(0), lit(k - 1)),
      i => floor(i.cast("long") * nFrames / k).cast("long")))
    media
      .select(col("doc_id"), col("n_bytes"), nFrames.as("n_frames"),
        explode(idxs).as("frame_idx"))
      .select(
        col("doc_id"), col("n_frames"), col("frame_idx"),
        floor(col("frame_idx") * 1000 / fps).cast("long").as("frame_ts_ms"),
        floor(col("frame_idx") * col("n_bytes") / col("n_frames"))
          .cast("long").as("byte_off"),
        floor(col("n_bytes") / col("n_frames")).cast("long").as("byte_len"))
  }

  /** Resize stage: recompute metadata for a target box, keeping aspect ratio;
    * payload untouched (stub — a real resize would transform bytes).
    * Expression-only → oracle-checkable.
    */
  def resizeMeta(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"), lit(1.0))
    media.select(
      col("doc_id"), col("width"), col("height"),
      floor(col("width") * scale).cast("int").as("out_width"),
      floor(col("height") * scale).cast("int").as("out_height"),
      round(scale, 6).as("scale"))
  }
}
