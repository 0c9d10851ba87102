package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed metadata, and run decode / feature-extraction as
  * imperative per-partition batch transforms (`mapPartitions` over a typed
  * Dataset — the Scala analog of `mapInPandas` batch UDFs).
  *
  * The decode step is a STUB (this container ships no image/audio codecs):
  * [[FakeCodec.decode]] derives deterministic pseudo-metadata from the
  * byte payload. The Spark-side plumbing — binary column handling, typed
  * Encoders, partition-batch iteration, schema of the decoded struct — is
  * real and oracle-tested; swapping in a real codec changes only the body
  * of `FakeCodec.decode`.
  */
object Multimodal {

  /** One media record entering the decode stage. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte])

  /** Decoded/feature-extracted output (what a real image decoder would
    * yield: dimensions, frame count, a content digest, a tiny feature). */
  case class DecodedMedia(
      doc_id: Long,
      n_bytes: Long,
      content_hash: String,
      width: Int,
      height: Int,
      n_frames: Int,
      brightness: Double)

  /** STUB codec — deterministic fake, byte-derived. Replace with a real
    * decoder (javax.imageio / ffmpeg bindings) in production. */
  object FakeCodec {
    def decode(r: MediaRecord): DecodedMedia = {
      val n = r.payload.length.toLong
      val md = java.security.MessageDigest.getInstance("MD5")
      val hash = md.digest(r.payload).map("%02x".format(_)).mkString
      DecodedMedia(
        doc_id = r.doc_id,
        n_bytes = n,
        content_hash = hash,
        width = (n % 640L).toInt,
        height = ((n * 7L) % 480L).toInt,
        n_frames = (n % 30L).toInt + 1,
        // "brightness" = mean byte value — a real per-pixel reduction shape
        brightness = if (n == 0) 0.0
          else r.payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n)
    }
  }

  /** Decode a binary media column partition-batch-wise. The partition
    * iterator is the batch boundary — a real codec would reuse its native
    * context across the whole partition (the reason this is mapPartitions
    * and not a per-row UDF). */
  def decodeMedia(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup would happen here (codec init, buffers)
      it.map(FakeCodec.decode)
    }
  }

  /** End-to-end pipeline over `documents`: synthesize the binary payload
    * from text (stand-in for a real media blob column), decode, and
    * return a flat, oracle-comparable frame. */
  def pipeline(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media = docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
    decodeMedia(media).toDF()
  }

  /** Resize planning over decoded media: fit each medium into a
    * `maxW x maxH` box preserving aspect ratio, never upscaling. Pure
    * column arithmetic on the decoded metadata — the real resize (pixel
    * resampling) belongs in the partition-batch codec stage; this is the
    * metadata contract every downstream consumer reads. Zero-dimension
    * media (the fake codec can emit width 0) pass through unscaled. */
  def resizePlan(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = when(col("width") > 0 && col("height") > 0,
      least(lit(maxW.toDouble) / col("width"), lit(maxH.toDouble) / col("height"), lit(1.0)))
      .otherwise(lit(1.0))
    decoded
      .withColumn("resize_scale", round(scale * lit(1e6), 0) / lit(1e6))
      .withColumn("out_w", floor(col("width") * col("resize_scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("resize_scale")).cast("int"))
  }

  /** Frame sampling + per-frame feature extraction over decoded media:
    * generate each medium's frame indices (`sequence` + `explode` — the
    * generator/UDTF shape), keep every `step`-th frame, derive a
    * deterministic per-frame feature. A real video pipeline has exactly
    * this plan: decode once, fan out to sampled frames, featurize —
    * the fan-out multiplies rows, so it must happen AFTER pushed filters
    * and column pruning, never before. */
  def sampledFrameFeatures(decoded: DataFrame, step: Int): DataFrame =
    decoded
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .where(pmod(col("frame_idx"), lit(step)) === 0)
      .withColumn("frame_tag",
        concat(col("doc_id").cast("string"), lit(":"), col("frame_idx").cast("string")))
}
