package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {

  test("bloomPrefilteredSemiJoin: result identical to the plain left-semi join") {
    val probe = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_linenumber"))
    val build = Tables.orders(spark, sf)
      .where(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val got = BloomJoin.bloomPrefilteredSemiJoin(
        probe, "l_orderkey", build, "o_orderkey",
        expectedItems = 10000L, numBits = 1L << 17)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = probe
      .join(build.withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    got shouldBe want
    got should not be empty
  }

  test("bloom prefilter with a tiny, collision-heavy filter still verifies exactly") {
    val probe = Tables.lineitem(spark, sf).select(col("l_orderkey"))
    val build = Tables.orders(spark, sf)
      .where(col("o_orderkey") % 100 === 0).select(col("o_orderkey"))
    // 1024 bits for thousands of keys -> high false-positive rate; the
    // exact semi join must still remove every false positive
    val got = BloomJoin.bloomPrefilteredSemiJoin(
        probe, "l_orderkey", build, "o_orderkey",
        expectedItems = 100L, numBits = 1024L)
      .agg(count(lit(1))).head().getLong(0)
    val want = probe
      .join(build.withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"), "left_semi")
      .agg(count(lit(1))).head().getLong(0)
    got shouldBe want
  }
}
