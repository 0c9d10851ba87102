package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) joins WITHOUT an equi-key.
  *
  * A raw `r.ts BETWEEN l.ts AND l.ts + w` join has no equality conjunct,
  * so Spark can only plan BroadcastNestedLoopJoin (or a cartesian) — at
  * 100 TB that is |L|x|R| comparisons and a broadcast requirement on one
  * whole side. The banded form buckets event time into width-`w` bands
  * and joins on band equality: the left side duplicates into its own and
  * the following band (any right row within (l.ts, l.ts+w] lands in one
  * of those two), then the exact interval predicate filters the band
  * collisions. Cost: one shuffle of 2|L|+|R| rows on an integer key and
  * per-band local joins — the standard interval-bucketing rewrite.
  *
  * Skew note: band cardinality is time-range/width, so a hot hour is a
  * hot partition. AQE's skew-join splitting handles moderate cases;
  * for pathological ones compose the band with a salt on the right and
  * replicate the left over the salt range (Skew.saltedEquiJoin pattern).
  */
object RangeJoin {

  /** Inner join of every left row to the right rows with
    * `l(leftTs) < r(rightTs) <= l(leftTs) + widthSec`. Band arithmetic
    * uses whole epoch seconds (timestamp->long cast truncates), which is
    * conservative: a right row at most `widthSec` after the left row is
    * never more than one band ahead. */
  def bandedIntervalAfter(
      left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, widthSec: Long): DataFrame = {
    require(widthSec > 0, "widthSec must be positive")
    val lBand = floor(col(leftTs).cast("long") / widthSec)
    val l2 = left.withColumn("_band", explode(array(lBand, lBand + 1)))
    val r2 = right.withColumn("_band", floor(col(rightTs).cast("long") / widthSec))
    l2.join(r2, Seq("_band"))
      .where(col(rightTs) > col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $widthSec SECOND"))
      .drop("_band")
  }

  /** INTERVAL × INTERVAL overlap join: every (a, b) pair with
    * `aStart < bEnd && bStart < aEnd` (half-open [start, end) overlap
    * semantics) and equal `keys`.
    *
    * Banding rewrite: each interval replicates to every width-`bandSec`
    * band it touches (`sequence(floor(start/w), floor((end-ε)/w))`), the
    * join runs on (keys..., band), and the exact predicate filters band
    * collisions. A pair overlapping across k shared bands would emit k
    * times; instead of a `distinct` (an extra shuffle of the OUTPUT,
    * which is the largest frame in the query), each true pair is
    * attributed to exactly ONE canonical band — the band containing
    * `max(aStart, bStart)`, the start of the overlap region, which both
    * rows' band ranges always cover. Cost: one shuffle of
    * Σ(interval_len/band + 1) rows per side; replication is bounded by
    * `maxBands` (intervals longer than maxBands·bandSec are truncated to
    * their first maxBands bands for CANDIDATE generation — pick bandSec
    * of the order of typical interval length so replication stays a
    * small constant; a pathological monster interval is then still
    * matched for overlaps beginning in its first maxBands bands).
    *
    * Both ts columns are compared in whole epoch seconds (cast
    * truncates) — band math and the exact predicate use the same
    * truncated values, so banding can never drop a pair the predicate
    * would keep.
    *
    * Rows with `end <= start` are DROPPED before banding: an empty or
    * inverted interval overlaps nothing under half-open semantics, and
    * mechanically `sequence(lo, hi)` with hi < lo generates a
    * DESCENDING band array — one garbage row with a far-past end would
    * otherwise explode into millions of band replicas. */
  def intervalOverlapJoin(
      a: DataFrame, b: DataFrame,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      keys: Seq[String], bandSec: Long, maxBands: Int = 64,
      strict: Boolean = false): DataFrame = {
    require(bandSec > 0, "bandSec must be positive")
    require(maxBands > 0, "maxBands must be positive")
    // `strict = true` turns silent candidate truncation into a hard
    // failure: an interval spanning more than maxBands bands fails the
    // job with its width in the message instead of quietly losing any
    // overlap that begins beyond band maxBands. Default stays lenient
    // (documented truncation) because the lenient form is the one that
    // survives a single garbage far-future `end` at 100 TB; flip strict
    // on when the band width was sized from known data bounds and a
    // violation means the bounds are wrong.
    def bands(s: String, e: String): Column = {
      val lo = floor(col(s).cast("long") / bandSec)
      // end is exclusive: an interval ending exactly on a band boundary
      // does not touch the next band
      val hi = floor((col(e).cast("long") - 1) / bandSec)
      val hiCapped = least(hi, lo + (maxBands - 1))
      val hiOut =
        if (!strict) hiCapped
        else when(hi > lo + (maxBands - 1), raise_error(concat(
          lit(s"intervalOverlapJoin: interval [$s, $e) spans "),
          (hi - lo + 1).cast("string"),
          lit(s" bands > maxBands=$maxBands (bandSec=$bandSec); " +
            "widen bandSec/maxBands or clean the interval"))))
          .otherwise(hiCapped)
      sequence(lo, hiOut)
    }
    val a2 = a.where(col(aStart).cast("long") < col(aEnd).cast("long"))
      .withColumn("_band", explode(bands(aStart, aEnd)))
    val b2 = b.where(col(bStart).cast("long") < col(bEnd).cast("long"))
      .withColumn("_band", explode(bands(bStart, bEnd)))
    a2.join(b2, keys :+ "_band")
      .where(
        col(aStart).cast("long") < col(bEnd).cast("long") &&
          col(bStart).cast("long") < col(aEnd).cast("long") &&
          // canonical-band attribution: emit the pair only from the band
          // where the overlap region begins
          col("_band") === floor(
            greatest(col(aStart).cast("long"), col(bStart).cast("long"))
              / bandSec))
      .drop("_band")
  }
}
