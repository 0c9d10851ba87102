package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("mortonKey interleaves bits (known values)") {
    val got = Seq((0L, 0L), (3L, 5L), (0L, 1L), (1L, 0L), (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
      .select(Layout.mortonKey(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    // interleave(x even bits, y odd bits): z(3,5) = x:011,y:101 -> 100111
    got shouldBe Seq(0L, 39L, 2L, 1L, 0x55555555L, 0xAAAAAAAAL)
  }

  test("mortonKey sort preserves locality in both dimensions") {
    // sorting by z-key then splitting into files: each half's min/max
    // envelope on EACH dim must be tighter than the full range (the
    // pruning property a one-dimension sort can't give both columns)
    val df = (0 until 32).flatMap(x => (0 until 32).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
      .orderBy(Layout.mortonKey(col("x"), col("y")))
    val rows = df.as[(Long, Long)].collect()
    val (first, second) = rows.splitAt(rows.length / 2)
    def span(part: Array[(Long, Long)], f: ((Long, Long)) => Long): Long =
      part.map(f).max - part.map(f).min
    // each z-ordered half covers at most half the y range (top-level bit
    // of the interleave is y's msb) and the full-but-local x quadrants
    span(first, _._2) should be < 32L
    span(second, _._2) should be < 32L
    (span(first, _._1) + span(first, _._2)) should be < 64L
  }
}
