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
}
