package graft.sources

import graft.SparkSpec
import graft.sources.v2.StagedCommitSink
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class StagedCommitSinkSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = classOf[StagedCommitSink].getName

  test("two-phase commit: staged files are promoted atomically with a _SUCCESS manifest") {
    val dir = Files.createTempDirectory("stagedsink").toString
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, null: String, 3.5))
      .toDF("id", "name", "score")
      .repartition(2)
    df.write.format(fmt).option("path", dir).mode("append").save()

    val files = Files.list(Paths.get(dir)).iterator().asScala.map(_.getFileName.toString).toSet
    files should contain("_SUCCESS")
    files.count(_.startsWith("part-")) shouldBe 2
    files should not contain "_staging" // staging area cleaned after promote

    // manifest lists every promoted file with its row count
    val manifest = Files.readAllLines(Paths.get(dir, "_SUCCESS")).asScala
      .map(_.split("\t")).map(a => a(0) -> a(1).toLong).toMap
    manifest.keySet shouldBe files.filter(_.startsWith("part-"))
    manifest.values.sum shouldBe 3L

    // all rows present; NULL encoded as empty field
    val lines = files.filter(_.startsWith("part-"))
      .flatMap(f => Files.readAllLines(Paths.get(dir, f)).asScala)
    lines.size shouldBe 3
    lines.count(_.split("\t", -1)(1).isEmpty) shouldBe 1
  }

  test("failed job leaves no committed output") {
    val dir = Files.createTempDirectory("stagedabort").toString
    val boom = spark.range(100).repartition(2)
      .selectExpr("id", "CASE WHEN id = 99 THEN raise_error('boom') ELSE 'x' END AS s")
    intercept[Exception] {
      boom.write.format(fmt).option("path", dir).mode("append").save()
    }
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).toSet
    files should not contain "_SUCCESS" // no manifest -> readers see nothing
  }
}
