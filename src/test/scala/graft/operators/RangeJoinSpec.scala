package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Banded interval join == the naive theta join it replaces, including
  * the boundary semantics (strict >, inclusive <= width). */
class RangeJoinSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("click_id"), col("p_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bandedIntervalAfter matches the theta join on real events") {
    val e = Tables.events(spark, sf)
    val clicks = e.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))

    val banded = RangeJoin.bandedIntervalAfter(
      clicks, purchases, "click_ts", "p_ts", widthSec = 3600L)
    val theta = clicks.join(purchases,
      col("p_ts") > col("click_ts") &&
        col("p_ts") <= col("click_ts") + expr("INTERVAL 3600 SECOND"))

    val got = pairs(banded)
    got shouldBe pairs(theta)
    got.size should be > 0 // non-vacuous on the fixture
    // band fan-out must not duplicate pairs
    banded.count() shouldBe banded.distinct().count()
  }

  test("boundary rows: exactly at +width included, at 0 excluded") {
    import spark.implicits._
    val l = Seq((1L, java.sql.Timestamp.valueOf("2025-01-01 00:00:00")))
      .toDF("click_id", "click_ts")
    val r = Seq(
      (10L, java.sql.Timestamp.valueOf("2025-01-01 00:00:00")), // ==, excluded
      (11L, java.sql.Timestamp.valueOf("2025-01-01 01:00:00")), // +w, included
      (12L, java.sql.Timestamp.valueOf("2025-01-01 01:00:01"))) // >+w, excluded
      .toDF("p_id", "p_ts")
    pairs(RangeJoin.bandedIntervalAfter(l, r, "click_ts", "p_ts", 3600L)) shouldBe
      Set((1L, 11L))
  }
}
