package graft.sources

import graft.SparkSpec
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRecord
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The media-ingestion path: raw files read with the `binaryFile` source
  * (path, modificationTime, length, content) and piped straight into the
  * multimodal decode stage — this is how image/audio/video payloads enter
  * the engine at scale (one task per file split; pathGlobFilter prunes by
  * extension at listing time, before any bytes are read).
  */
class BinaryFileSourceSpec extends SparkSpec {
  import spark.implicits._

  test("binaryFile source reads payloads and feeds the multimodal decode stage") {
    val dir = Files.createTempDirectory("binsrc").toString
    val payloads = Map(
      "a.img" -> Array[Byte](1, 2, 3, 4, 5),
      "b.img" -> Array[Byte](9, 8, 7),
      "skip.txt" -> Array[Byte](0))
    payloads.foreach { case (name, bytes) =>
      Files.write(Paths.get(dir, name), bytes)
    }

    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.img")
      .load(dir)
    files.columns.toSet shouldBe Set("path", "modificationTime", "length", "content")
    files.count() shouldBe 2 // glob filter pruned skip.txt at listing time

    // filename-derived ids, payload into the typed decode stage
    val media = files
      .select(
        element_at(split(col("path"), "/"), -1).as("name"),
        col("content"))
      .withColumn("doc_id",
        when(col("name") === "a.img", 0L).otherwise(1L))
      .select(col("doc_id"), col("content").as("payload"))
      .as[MediaRecord]
    val decoded = Multimodal.decodeMedia(media).collect().sortBy(_.doc_id)

    decoded.map(_.n_bytes).toSeq shouldBe Seq(5L, 3L)
    // stub codec is deterministic on the byte payload
    val again = Multimodal.decodeMedia(media).collect().sortBy(_.doc_id)
    decoded.map(_.content_hash).toSeq shouldBe again.map(_.content_hash).toSeq
  }
}
