package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** `Dataset.observe` — data-quality counters collected ON THE SAME PASS
  * as the query (an accumulator-backed aggregate, no extra scan). At
  * 100 TB a separate validation query doubles the I/O bill; observe()
  * makes row counts / null rates / domain violations free side-outputs
  * of the job that's already running. */
class InstrumentationSpec extends SparkSpec {

  test("observe() collects quality metrics without a second scan") {
    val obs = Observation("lineitem-quality")
    val li = Tables.lineitem(spark, sf)
      .observe(obs,
        count(lit(1)).as("rows"),
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("nonpositive_qty"),
        sum(when(col("l_extendedprice").isNull, 1L).otherwise(0L)).as("null_price"),
        max(col("l_shipdate")).as("max_shipdate"))
      .where(col("l_quantity") > 0) // downstream transform continues as usual
    val kept = li.count()
    val m = obs.get
    m("rows").asInstanceOf[Long] should be > 0L
    m("nonpositive_qty") shouldBe 0L
    m("null_price") shouldBe 0L
    // the observation sees pre-filter rows: metrics are on the full scan
    m("rows").asInstanceOf[Long] shouldBe kept + m("nonpositive_qty").asInstanceOf[Long]
  }

  test("observe() on a grouped pipeline reports input cardinality") {
    val obs = Observation("orders-in")
    val out = Tables.orders(spark, sf)
      .observe(obs, count(lit(1)).as("n_in"))
      .groupBy(col("o_orderpriority")).agg(sum(col("o_totalprice")).as("s"))
      .collect()
    out.length should be > 0
    obs.get("n_in").asInstanceOf[Long] shouldBe Tables.orders(spark, sf).count()
  }
}
