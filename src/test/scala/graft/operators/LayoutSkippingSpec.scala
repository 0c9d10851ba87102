package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end proof that the space-filling-curve layout operators buy
  * real SCAN SAVINGS, not just pretty key order: clustering by
  * hilbert/morton key makes each parquet row group's (x, y) min/max
  * envelope tight, so a pushed 2-D range predicate skips almost every
  * row group, while the same data in a decorrelated layout must read
  * every row. This is the mechanism that turns a 100 TB full scan into
  * a few-GB windowed read on a clustered table — asserted here via task
  * input metrics (records actually READ from disk), the only metric
  * that sees row-group skipping.
  */
class LayoutSkippingSpec extends SparkSpec {
  import spark.implicits._

  /** Sum of records read from files across all tasks of `action`,
    * collected via listener (task-end events are async: poll until the
    * bus drains — stable sum twice in a row). */
  private def recordsRead(action: => Unit): Long = {
    @volatile var sum = 0L
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) sum += m.inputMetrics.recordsRead
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      action
      var prev = -1L
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 100) {
        Thread.sleep(100); waited += 1
        if (sum == prev) stable += 1 else { stable = 0; prev = sum }
      }
      sum
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("hilbert/morton clustering lets parquet min/max stats skip row groups on 2-D windows") {
    val n = 256 // 256x256 grid = 65536 rows
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).as("x"),
      floor(col("id") / n).as("y"),
      col("id").as("payload"))

    val root = Files.createTempDirectory("graft-skip").toString
    // small row groups so skipping granularity is sub-file — at real
    // scale the default 128 MB block gives the same effect per group
    def write(df: DataFrame, name: String): String = {
      val p = s"$root/$name"
      df.write.option("parquet.block.size", 16384).mode("overwrite").parquet(p)
      p
    }
    // decorrelated baseline: row order independent of (x, y), every row
    // group's envelope spans the whole plane
    val flat = write(grid.orderBy(xxhash64(col("payload"))), "flat")
    val hil = write(grid.orderBy(
      Layout.hilbertKey(col("x"), col("y"), 8)), "hilbert")
    val mor = write(grid.orderBy(
      Layout.mortonKey(col("x"), col("y"))), "morton")

    // 16x16 window = 0.4% of rows, deliberately UNALIGNED to the curve's
    // power-of-two tiles (the realistic case: user windows don't align);
    // predicate pushes down on both dims
    def winCount(path: String): (Long, Long) = {
      var rows = 0L
      val read = recordsRead {
        rows = spark.read.parquet(path)
          .where(col("x").between(40, 55) && col("y").between(100, 115))
          .count()
      }
      (rows, read)
    }
    val (rowsFlat, readFlat) = winCount(flat)
    val (rowsHil, readHil) = winCount(hil)
    val (rowsMor, readMor) = winCount(mor)

    // same answer from every layout
    rowsFlat shouldBe 256L
    rowsHil shouldBe 256L
    rowsMor shouldBe 256L

    // the flat layout reads essentially everything; the clustered
    // layouts read a small fraction (generous 20% bound — in practice
    // ~1-2%: tight envelopes skip all but a handful of row groups)
    info(s"records read — flat: $readFlat, hilbert: $readHil, morton: $readMor")
    readFlat should be >= (n.toLong * n)
    readHil should be < readFlat / 5
    readMor should be < readFlat / 5

    // cleanup
    import scala.jdk.CollectionConverters._
    Files.walk(java.nio.file.Paths.get(root)).iterator().asScala.toSeq
      .reverse.foreach(p => Files.deleteIfExists(p))
  }
}
