package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed metadata, and run decode / feature-extraction as
  * imperative per-partition batch transforms (`mapPartitions` over a typed
  * Dataset — the Scala analog of `mapInPandas` batch UDFs).
  *
  * Two codecs share the plumbing: [[ImageIoCodec]] decodes real image
  * bytes (PNG/BMP/GIF/JPEG via the JDK's javax.imageio — no native
  * libs), and [[FakeCodec]] derives deterministic pseudo-metadata from
  * the byte payload — the oracle-hashable twin used by the catalog
  * queries, whose fixtures are text-derived blobs, not images. Audio /
  * video decode would slot in the same way (no codec in this container).
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

  /** REAL image codec over the JDK's `javax.imageio` (PNG/BMP/GIF/JPEG —
    * no external native libs needed). Contract differences from the
    * stub are only in the VALUES:
    *  - width/height/n_frames come from the actual image header;
    *  - brightness = mean Rec.601 luminance over a bounded ≤64×64
    *    sample grid (constant work per image regardless of resolution —
    *    a full-pixel reduction would make one 8K image a stage straggler);
    *  - an undecodable payload yields width=height=n_frames=0 rather
    *    than throwing: one corrupt blob must not kill a 100 TB decode
    *    job, and n_bytes/content_hash stay usable for exact dedup;
    *  - a payload whose HEADER declares more than `MaxPixels` pixels is
    *    never pixel-decoded (decompression-bomb guard: `reader.read`
    *    allocates width x height ARGB ints for a file that can be a few
    *    KB on disk — one hostile blob would stall or OOM the scan task).
    *    Header dims/frames are still reported; brightness is the
    *    documented `-1.0` skip sentinel (real luminance is >= 0), so
    *    pipelines can count skips with `WHERE brightness < 0`. */
  object ImageIoCodec {
    /** 2^26 pixels (~268 MB ARGB) — far above any legitimate training
      * image, far below a crafted 100000x100000 header. */
    val MaxPixels: Long = 1L << 26

    def decode(r: MediaRecord): DecodedMedia = {
      val n = r.payload.length.toLong
      val md = java.security.MessageDigest.getInstance("MD5")
      val hash = md.digest(r.payload).map("%02x".format(_)).mkString
      def undecoded = DecodedMedia(r.doc_id, n, hash, 0, 0, 0, 0.0)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) undecoded
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, false, false)
            val nFrames =
              try reader.getNumImages(true) catch { case _: Exception => 1 }
            // header-only dims (no pixel allocation) gate the real decode
            val hw = reader.getWidth(0).toLong
            val hh = reader.getHeight(0).toLong
            if (hw <= 0 || hh <= 0 || hw * hh > MaxPixels)
              return DecodedMedia(r.doc_id, n, hash, hw.toInt, hh.toInt,
                math.max(nFrames, 1), -1.0)
            val img = reader.read(0)
            val w = img.getWidth; val h = img.getHeight
            // ceil division: floor would sample 65..127-px dims at every
            // pixel, 4x the documented <=64x64 budget
            val sx = math.max(1, (w + 63) / 64); val sy = math.max(1, (h + 63) / 64)
            var sum = 0.0; var cnt = 0; var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                cnt += 1; x += sx
              }
              y += sy
            }
            DecodedMedia(r.doc_id, n, hash, w, h, math.max(nFrames, 1),
              if (cnt == 0) 0.0 else sum / cnt)
          } finally reader.dispose()
        }
      } catch {
        case scala.util.control.NonFatal(_) => undecoded
      } finally if (iis != null) iis.close()
    }
  }

  /** Decode a binary media column partition-batch-wise. The partition
    * iterator is the batch boundary — a real codec would reuse its native
    * context across the whole partition (the reason this is mapPartitions
    * and not a per-row UDF). `codec` defaults to the deterministic stub
    * (the oracle-hashable twin); pass [[ImageIoCodec.decode]] for real
    * image bytes. */
  def decodeMedia(media: Dataset[MediaRecord],
      codec: MediaRecord => DecodedMedia = FakeCodec.decode): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup would happen here (codec init, buffers)
      it.map(codec)
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
