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
}
