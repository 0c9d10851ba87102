package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{ImageIoCodec, MediaRecord}
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** [[Multimodal.ImageIoCodec]] — the real image decode path (JDK
  * javax.imageio) behind the mapPartitions plumbing. Fixtures are
  * synthesized in-test (no image files ship with the repo). */
class MultimodalCodecSpec extends SparkSpec {
  import spark.implicits._

  private def imageBytes(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  test("decodes real PNG/BMP/GIF bytes: dimensions, frames, brightness") {
    val white = 0xffffff
    val black = 0x000000
    val media = Seq(
      MediaRecord(0L, imageBytes(40, 30, white, "png")),
      MediaRecord(1L, imageBytes(17, 23, black, "bmp")),
      MediaRecord(2L, imageBytes(8, 8, 0x808080, "gif")),
      MediaRecord(3L, "definitely not an image".getBytes("UTF-8")))
    val out = media.map(ImageIoCodec.decode).map(d => d.doc_id -> d).toMap

    out(0L).width shouldBe 40
    out(0L).height shouldBe 30
    out(0L).n_frames shouldBe 1
    out(0L).brightness shouldBe 255.0 +- 0.5 // uniform white

    out(1L).width shouldBe 17
    out(1L).height shouldBe 23
    out(1L).brightness shouldBe 0.0 +- 0.5 // uniform black

    out(2L).width shouldBe 8
    out(2L).height shouldBe 8
    // GIF is palettized: mid-gray may quantize, but stays mid-range
    out(2L).brightness should (be >= 100.0 and be <= 156.0)

    // corrupt payload: degraded row, not an exception — n_bytes and the
    // content hash stay usable for exact dedup
    out(3L).width shouldBe 0
    out(3L).height shouldBe 0
    out(3L).n_frames shouldBe 0
    out(3L).n_bytes should be > 0L
    out(3L).content_hash.length shouldBe 32
  }

  test("lumaGrid64 + aHashBands: perceptual hash survives resize, separates different images") {
    def gradient(w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach { x =>
        val v = (x * 255) / math.max(1, w - 1)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      img
    }
    def checker(w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach { x =>
        val v = if (((x / 4) + (y / 4)) % 2 == 0) 255 else 0
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      img
    }
    def png(img: BufferedImage): Array[Byte] = {
      val out = new ByteArrayOutputStream(); ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def bands(payload: Array[Byte]): Seq[Int] = {
      val grid = ImageIoCodec.lumaGrid64(MediaRecord(0L, payload))
      val a = graft.functions.VectorOps.aHashBands(grid)
      (0 until 4).map(a.getInt)
    }
    def ham(x: Seq[Int], y: Seq[Int]): Int =
      x.zip(y).map { case (a, b) => Integer.bitCount(a ^ b) }.sum
    val big = bands(png(gradient(64, 48)))
    val resized = bands(png(gradient(32, 24))) // same scene, half size
    val other = bands(png(checker(64, 48)))
    ham(big, resized) should be <= 6 // perceptually identical
    ham(big, other) should be >= 16  // different structure
    // undecodable payload: empty grid, all-zero bands, no exception
    bands("not an image".getBytes("UTF-8")) shouldBe Seq(0, 0, 0, 0)
  }

  test("real codec runs distributed through the mapPartitions stage") {
    val media = spark.createDataset(Seq(
      MediaRecord(0L, imageBytes(12, 5, 0xff0000, "png")),
      MediaRecord(1L, imageBytes(6, 9, 0x00ff00, "png"))))
      .repartition(2)
    val rows = Multimodal.decodeMedia(media, ImageIoCodec.decode)
      .collect().sortBy(_.doc_id)
    rows.map(d => (d.width, d.height)).toSeq shouldBe Seq((12, 5), (6, 9))
    // decode is deterministic across runs/partitionings
    val again = Multimodal.decodeMedia(media.repartition(1), ImageIoCodec.decode)
      .collect().sortBy(_.doc_id)
    rows.map(_.brightness).toSeq shouldBe again.map(_.brightness).toSeq
  }

  test("brightness sampling grid bounds work on large images") {
    // 1024x1024 image decodes with the same ≤64x64 sample budget
    val big = MediaRecord(0L, imageBytes(1024, 1024, 0xffffff, "png"))
    val d = ImageIoCodec.decode(big)
    d.width shouldBe 1024
    d.brightness shouldBe 255.0 +- 0.5
  }

  test("pathological blob fuzz: truncated, bit-flipped, empty — degraded rows, no exception") {
    val good = imageBytes(40, 30, 0x123456, "png")
    val fixtures = Seq(
      MediaRecord(0L, good.take(24)),                       // truncated after IHDR start
      MediaRecord(1L, good.take(good.length / 2)),          // truncated mid-stream
      MediaRecord(2L, {                                     // bit-flipped body
        val b = good.clone(); b(b.length / 2) = (b(b.length / 2) ^ 0xff).toByte; b
      }),
      MediaRecord(3L, Array.empty[Byte]),                   // empty payload
      MediaRecord(4L, Array.fill(4096)(0x41.toByte)),       // 4 KB of 'A'
      MediaRecord(5L, good))                                // control: still decodes
    val out = fixtures.map(r =>
      r.doc_id -> ImageIoCodec.decode(r)).toMap // must not throw
    out(5L).width shouldBe 40
    fixtures.foreach { r =>
      out(r.doc_id).n_bytes shouldBe r.payload.length.toLong
      out(r.doc_id).content_hash.length shouldBe 32
    }
    // degraded rows carry no phantom pixel stats
    Seq(3L, 4L).foreach { id =>
      out(id).width shouldBe 0
      out(id).brightness shouldBe 0.0
    }
  }

  test("decompression-bomb guard: huge declared dims are never pixel-decoded") {
    // hand-crafted PNG signature + IHDR declaring 100000x100000 (1e10
    // pixels from a <100-byte payload — reader.read would allocate ~40 GB)
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(ihdr)
    dos.writeInt(100000); dos.writeInt(100000) // width, height
    dos.writeByte(8); dos.writeByte(2)         // bit depth, RGB
    dos.writeByte(0); dos.writeByte(0); dos.writeByte(0)
    val body = ihdr.toByteArray
    val chunk = new java.io.DataOutputStream(out)
    chunk.writeInt(body.length)
    out.write("IHDR".getBytes("US-ASCII"))
    out.write(body)
    val crc = new java.util.zip.CRC32()
    crc.update("IHDR".getBytes("US-ASCII")); crc.update(body)
    chunk.writeInt(crc.getValue.toInt)
    val bomb = MediaRecord(9L, out.toByteArray)

    val t0 = System.nanoTime()
    val d = ImageIoCodec.decode(bomb)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    d.width shouldBe 100000     // header dims still reported
    d.height shouldBe 100000
    d.brightness shouldBe -1.0  // the documented pixel-decode-skip sentinel
    elapsedMs should be < 2000.0 // and it returned immediately, no 40 GB read
  }

  test("oversize-skip sentinel is countable through the mapPartitions stage") {
    val media = spark.createDataset(Seq(
      MediaRecord(0L, imageBytes(10, 10, 0xffffff, "png")),
      MediaRecord(1L, "garbage".getBytes("UTF-8"))))
    val rows = Multimodal.decodeMedia(media, ImageIoCodec.decode).collect()
    rows.count(_.brightness >= 0.0) shouldBe 2 // neither hits the cap
    rows.count(_.width == 0) shouldBe 1        // corrupt row degraded
  }

  test("grayPng8x8 write→decode roundtrip is exact per payload: the " +
      "decoded luminance grid equals Rec.601 of the source bytes " +
      "(the image_png_phash contract)") {
    def expectedLuma(payload: Array[Byte]): Array[Byte] = {
      val n = payload.length
      (0 until 64).map { j =>
        val v = if (n == 0) 0 else payload(j % n) & 0xff
        // the codec's own arithmetic order: Rec.601 sum then truncate
        (0.299 * v + 0.587 * v + 0.114 * v).toInt.toByte
      }.toArray
    }
    val payloads = Seq(
      "the quick brown fox".getBytes("UTF-8"),
      Array.tabulate(200)(i => ((i * 37 + 5) % 256).toByte),
      Array[Byte](0, -1, 127, -128), // full signed-byte range
      Array.emptyByteArray)
    payloads.foreach { p =>
      val png = ImageIoCodec.grayPng8x8(p)
      // a genuine PNG container: magic bytes + decodable header
      png.take(4) shouldBe Array(0x89.toByte, 'P'.toByte, 'N'.toByte,
        'G'.toByte)
      val dec = ImageIoCodec.decode(MediaRecord(9L, png))
      dec.width shouldBe 8
      dec.height shouldBe 8
      ImageIoCodec.lumaGrid64(MediaRecord(9L, png)).toSeq shouldBe
        expectedLuma(p).toSeq
    }
  }
}
