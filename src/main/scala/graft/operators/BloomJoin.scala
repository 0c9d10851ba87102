package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter runtime pre-filtering for selective joins — the manual,
  * stage-explicit form of Spark's `InjectRuntimeFilter` rewrite, built on
  * the same Catalyst internals (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, which are not SQL-registered).
  *
  * Shape: (1) one pass over the (selective) build side aggregates its
  * join keys into a bloom filter; (2) the filter is materialized to the
  * driver and embedded as a binary literal in the probe-side scan's
  * predicate, discarding most non-matching probe rows BEFORE the join
  * shuffle; (3) an exact semi join removes the bloom's false positives.
  * At 100 TB this is the difference between shuffling the full fact table
  * and shuffling only the ~selectivity fraction that can possibly match.
  */
object BloomJoin {

  private def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    GraftBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(GraftBridge.expression(key))),
        Literal(expectedItems), Literal(numBits), 0, 0
      ).toAggregateExpression())

  private def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    GraftBridge.column(
      new BloomFilterMightContain(
        Literal(bloomBytes),
        new XxHash64(Seq(GraftBridge.expression(key)))))

  /** Exact left-semi join of `probe` against `build`'s keys, with a bloom
    * pre-filter on the probe side. Result-identical to the plain semi
    * join (false positives verified away); the bloom only prunes the
    * probe shuffle. */
  def bloomPrefilteredSemiJoin(
      probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      expectedItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    val bfBytes = build
      .agg(bloomAgg(col(buildKey), expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val keys = build.select(col(buildKey).as(probeKey)).distinct()
    probe
      .where(mightContain(bfBytes, col(probeKey)))
      .join(keys, Seq(probeKey), "left_semi")
  }
}
