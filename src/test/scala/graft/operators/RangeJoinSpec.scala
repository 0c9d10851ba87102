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

  private def opairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("intervalOverlapJoin: half-open semantics, one row per pair across bands") {
    import spark.implicits._
    val a = Seq(
      (1L, "k", 0L, 100L),    // long interval spanning many bands
      (2L, "k", 50L, 60L),
      (3L, "k", 100L, 110L),  // touches 1 only at the boundary -> no overlap
      (4L, "x", 0L, 10L))     // different key, never pairs with "k"
      .toDF("a_id", "key", "a_s", "a_e")
    val b = Seq(
      (10L, "k", 90L, 150L),  // overlaps 1 ([90,100)) and 3
      (11L, "k", 55L, 58L),   // nested in 1 and 2
      (12L, "k", 100L, 101L), // boundary-touches 1 -> excluded
      (13L, "x", 5L, 6L))     // pairs with 4 on key x
      .toDF("b_id", "key", "b_s", "b_e")
    val got = opairs(RangeJoin.intervalOverlapJoin(
      a, b, "a_s", "a_e", "b_s", "b_e", Seq("key"), bandSec = 10L))
    // each pair exactly once despite multi-band replication
    got.size shouldBe got.toSet.size
    got.toSet shouldBe Set(
      (1L, 10L), (1L, 11L), (3L, 10L), (3L, 12L), (2L, 11L), (4L, 13L))
  }

  test("intervalOverlapJoin: empty and inverted intervals drop, never explode") {
    import spark.implicits._
    val a = Seq(
      (1L, "k", 10L, 10L),          // zero-length: overlaps nothing
      (2L, "k", 1000000000L, 0L),   // inverted garbage row: dropped, no band blow-up
      (3L, "k", 5L, 15L))           // valid
      .toDF("a_id", "key", "a_s", "a_e")
    val b = Seq((10L, "k", 0L, 20L)).toDF("b_id", "key", "b_s", "b_e")
    opairs(RangeJoin.intervalOverlapJoin(
      a, b, "a_s", "a_e", "b_s", "b_e", Seq("key"), bandSec = 10L))
      .toSet shouldBe Set((3L, 10L))
  }

  test("intervalOverlapJoin == theta join on real shipping windows") {
    val li = Tables.lineitem(spark, sf).where(col("l_quantity") >= 45)
      .select(
        (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("id"),
        col("l_suppkey").as("supp"),
        col("l_shipdate").cast("timestamp").cast("long").as("st"),
        (col("l_shipdate").cast("timestamp").cast("long")
          + col("l_quantity").cast("long") * 86400L).as("en"))
    val a = li.select(col("id").as("a_id"), col("supp"),
      col("st").as("a_s"), col("en").as("a_e"))
    val b = li.select(col("id").as("b_id"), col("supp"),
      col("st").as("b_s"), col("en").as("b_e"))
    val banded = RangeJoin.intervalOverlapJoin(
      a, b, "a_s", "a_e", "b_s", "b_e", Seq("supp"), bandSec = 50L * 86400L)
      .where(col("a_id") < col("b_id"))
    val theta = a.join(b, Seq("supp"))
      .where(col("a_id") < col("b_id") &&
        col("a_s") < col("b_e") && col("b_s") < col("a_e"))
    val got = opairs(banded).toSet
    got shouldBe opairs(theta).toSet
    got.size should be > 0
    banded.count() shouldBe got.size // no per-band duplicates
  }
}
