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

    /** A REAL 8×8 grayscale PNG container from a byte payload — the
      * image sibling of `Audio.WavCodec.wrapPcm16` (round 12, VERDICT
      * r11 #3): pixel j (row-major, j = 0..63) carries gray value
      * payload[j mod n] (0 for an empty payload), written through the
      * JDK's own PNG encoder. PNG is lossless, so a decode of these
      * bytes recovers the exact gray values — which is what lets a
      * catalog row hash the real write→decode roundtrip against a SQL
      * oracle computed on the raw payload bytes (the
      * `image_png_phash` contract; spec-pinned per payload in
      * MultimodalCodecSpec). 8×8 makes [[lumaGrid64]]'s ≤64×64 sample
      * grid the identity map (gx·(w−1)/7 = gx at w = 8), so the decoded
      * luminance grid is exactly Rec.601(v_j) per pixel. */
    def grayPng8x8(payload: Array[Byte]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val n = payload.length
      var j = 0
      while (j < 64) {
        val v = if (n == 0) 0 else payload(j % n) & 0xff
        img.setRGB(j % 8, j / 8, (v << 16) | (v << 8) | v)
        j += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** 8×8 sampled Rec.601 luminance grid as 64 bytes — the real-image
      * input to [[graft.functions.VectorOps.aHashBands]] (feed these
      * bytes instead of the raw payload and the banded aHash becomes a
      * true perceptual image hash: resize/re-encode-stable, noise-
      * tolerant). Same guards as [[decode]]: undecodable or
      * bomb-flagged payloads yield an EMPTY array (phash = all-zero
      * bands, which [[Multimodal.phashNearDups]]'s bucket cap keeps
      * from exploding into a giant candidate clique). */
    def lumaGrid64(r: MediaRecord): Array[Byte] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Array.emptyByteArray
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, false, false)
            val hw = reader.getWidth(0).toLong
            val hh = reader.getHeight(0).toLong
            if (hw <= 0 || hh <= 0 || hw * hh > MaxPixels) Array.emptyByteArray
            else {
              val img = reader.read(0)
              val w = img.getWidth; val h = img.getHeight
              val out = new Array[Byte](64)
              var gy = 0
              while (gy < 8) {
                val y = if (h == 1) 0 else (gy * (h - 1)) / 7
                var gx = 0
                while (gx < 8) {
                  val x = if (w == 1) 0 else (gx * (w - 1)) / 7
                  val rgb = img.getRGB(x, y)
                  val luma = 0.299 * ((rgb >> 16) & 0xff) +
                    0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                  out(gy * 8 + gx) = luma.toInt.toByte
                  gx += 1
                }
                gy += 1
              }
              out
            }
          } finally reader.dispose()
        }
      } catch {
        case scala.util.control.NonFatal(_) => Array.emptyByteArray
      } finally if (iis != null) iis.close()
    }
  }

  /** Banded perceptual fingerprint (average-hash) of a binary payload
    * column: four 16-bit bands per record
    * ([[graft.functions.VectorOps.aHashBands]], a codegen'd Catalyst
    * expression — no UDF, no decode detour). Over raw payload bytes this
    * is the deterministic oracle-hashable stand-in (same stub contract
    * as [[FakeCodec]]); for real images feed
    * [[ImageIoCodec.lumaGrid64]]'s luminance bytes instead — the
    * packing and all downstream dedup machinery are identical. */
  def perceptualHashBands(media: DataFrame, payloadCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val ph = graft.functions.VectorExpressions.aHashBands(col(payloadCol))
    media.select(col(idCol), ph.as("ph"))
      .select(col(idCol), col("ph").getItem(0).as("b0"),
        col("ph").getItem(1).as("b1"), col("ph").getItem(2).as("b2"),
        col("ph").getItem(3).as("b3"))
  }

  /** Perceptual near-duplicate detection over banded fingerprints
    * (output of [[perceptualHashBands]]): multi-index Hamming search.
    * Candidates = pairs sharing at least one EXACT band value (bucket
    * self-join on (band_idx, value) — never all-pairs), verified by full
    * Hamming distance ≤ `hammingMax`. With 4 bands of 16 bits this is
    * pigeonhole-EXACT for `hammingMax` ≤ 3: a pair within distance 3
    * has ≤ 3 differing bits across 4 bands, so some band is intact and
    * the pair reaches verification (Norouzi et al., multi-index
    * hashing). Beyond 3 it degrades to approximate recall, the LSH
    * trade. `maxBucketSize` caps a hot band bucket (e.g. a degenerate
    * all-zero band over tiny payloads) at bounded pair work — the same
    * guard as MinHash-LSH's, mirrored in the catalog oracle. The cap
    * DROPS every row of an over-sized bucket in that band, so a record
    * whose ALL four bands land in hot buckets (e.g. many tiny payloads
    * sharing all-zero bands) generates no candidates at all — recall
    * loss under the cap concentrates on exactly the densest duplicate
    * groups, not uniformly. That is stronger than merely bounding pair
    * work: callers sizing `maxBucketSize` should set it above the
    * largest EXPECTED legitimate dup-group size so only degenerate
    * (near-constant-band) buckets are sacrificed.
    *
    * Returns one row per record: (id, b0..b3, dup_of, kept), dup_of =
    * smallest matched id (NULL if none). */
  def phashNearDups(hashes: DataFrame, idCol: String = "doc_id",
      hammingMax: Int = 3, maxBucketSize: Int = 100): DataFrame = {
    val bandCols = Seq("b0", "b1", "b2", "b3")
    val h = hashes.select(col(idCol) +: bandCols.map(col): _*)
    val dups = phashPairs(hashes, idCol, hammingMax, maxBucketSize)
      .groupBy(col("b")).agg(min(col("a")).as("dup_of"))
    h.join(dups, col(idCol) === col("b"), "left")
      .select(col(idCol), col("b0"), col("b1"), col("b2"), col("b3"),
        col("dup_of"), col("dup_of").isNull.as("kept"))
  }

  /** The PAIR-level form of [[phashNearDups]]: every (a < b) pair within
    * `hammingMax` bits of banded Hamming distance, multi-index blocked
    * (pigeonhole-exact for radius ≤ 3 at 4 bands). The edge input of the
    * cross-modal dedup ensemble. For `hammingMax` > 3 candidate
    * generation is BEST-EFFORT recall (blocking-bounded, the LSH trade):
    * a pair whose differing bits spread ≥ 4 per band shares no intact
    * band and never reaches verification — callers past the pigeonhole
    * radius (e.g. dedup_cross_modal at 12) accept that bound, and their
    * oracles mirror the blocking so certification measures the same
    * candidate set (ADVICE r11). */
  def phashPairs(hashes: DataFrame, idCol: String = "doc_id",
      hammingMax: Int = 3, maxBucketSize: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(hammingMax >= 0, "hammingMax must be >= 0")
    require(maxBucketSize >= 1, "maxBucketSize must be >= 1")
    val bandCols = Seq("b0", "b1", "b2", "b3")
    val h = hashes.select(col(idCol) +: bandCols.map(col): _*)
    val bands = h.select(col(idCol) +: bandCols.map(col) :+
      posexplode(array(bandCols.map(col): _*)).as(Seq("band_idx", "v")): _*)
    val capped = bands
      .withColumn("bn",
        count(lit(1)).over(Window.partitionBy(col("band_idx"), col("v"))))
      .where(col("bn") <= maxBucketSize)
    val l = capped.select(col(idCol).as("a"), col("band_idx"), col("v"),
      col("b0").as("a0"), col("b1").as("a1"),
      col("b2").as("a2"), col("b3").as("a3"))
    val r = capped.select(col(idCol).as("b"), col("band_idx"), col("v"),
      col("b0").as("c0"), col("b1").as("c1"),
      col("b2").as("c2"), col("b3").as("c3"))
    val cand = l.join(r, Seq("band_idx", "v"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), col("a0"), col("a1"), col("a2"), col("a3"),
        col("c0"), col("c1"), col("c2"), col("c3"))
      .distinct()
    val hamming = (
      bit_count(col("a0").bitwiseXOR(col("c0"))) +
      bit_count(col("a1").bitwiseXOR(col("c1"))) +
      bit_count(col("a2").bitwiseXOR(col("c2"))) +
      bit_count(col("a3").bitwiseXOR(col("c3")))).cast("int")
    cand.withColumn("hamming", hamming)
      .where(col("hamming") <= hammingMax)
      .select(col("a"), col("b"), col("hamming"))
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
