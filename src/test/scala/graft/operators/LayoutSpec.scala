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

  test("rangeBucket: null inputs and degenerate hi < lo profile both yield NULL") {
    val rows = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (5L, 0L, 9L),      // in range
      (null, 0L, 9L),    // null key
      (5L, 9L, 0L),      // degenerate profile: hi < lo
      (5L, 5L, 5L),      // single-point profile (divisor 1, valid)
      // profiles spanning > half the Long domain: Long subtraction
      // would wrap (and DuckDB would raise) — the double-space
      // arithmetic must bucket sanely instead
      (Long.MaxValue, Long.MinValue, 0L),
      (Long.MaxValue, 0L, 0L))  // out-of-range key, tiny range: clamp,
                                // never an engine-divergent huge cast
      .toDF("c", "lo", "hi")
    val got = rows.select(
      Layout.rangeBucket(col("c"), col("lo"), col("hi"), 4).as("b"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    got(0) shouldBe Some(8L)  // floor(5 * 16 / 10)
    got(1) shouldBe None
    got(2) shouldBe None      // NOT bucket 0: engines diverge on div-by-neg
    got(3) shouldBe Some(0L)
    got(4) shouldBe Some(15L) // key above the (huge) range: top bucket
    got(5) shouldBe Some(15L)
    // the SQL twin carries the same guard textually
    Layout.rangeBucketSql("c", "lo", "hi", 4) should include("hi < lo")
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

  test("hilbertKey: bijection onto [0, 4^order) and consecutive keys are ADJACENT cells") {
    // the defining property (and what Morton lacks): walking the key
    // order never jumps — every step is Manhattan distance 1
    val order = 4
    val n = 1 << order
    val cells = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.hilbertKey(col("x"), col("y"), order).as("h"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    cells.map(_._3).toSeq shouldBe (0L until (n.toLong * n)).toSeq
    cells.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, _)) =>
      ((x1 - x2).abs + (y1 - y2).abs) shouldBe 1L
    }
    // Morton on the same grid DOES jump (quadrant seams) — the contrast
    // that justifies Hilbert for range-scan locality
    val mort = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
      .select(col("x"), col("y"), Layout.mortonKey(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    val jumps = mort.sliding(2).count { case Array((x1, y1, _), (x2, y2, _)) =>
      (x1 - x2).abs + (y1 - y2).abs > 1 }
    jumps should be > 0
  }

  test("hilbertKey matches the scalar kernel on random coordinates") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select(Layout.hilbertKey(col("x"), col("y"), 16).as("h"))
      .as[Long].collect().toSeq
    val want = pts.map { case (x, y) =>
      graft.functions.VectorOps.hilbertKey(16, x, y) }
    got shouldBe want
  }
}
