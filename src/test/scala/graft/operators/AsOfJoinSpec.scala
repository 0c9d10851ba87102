package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direction/tie/tolerance semantics of the as-of join family on
  * hand-computable fixtures, plus theta-join equivalence on real events
  * (the operator's contract: same result as the quadratic formulation,
  * at one shuffle instead of |L|×|R| per key). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: (id, key, t) — right: (rid, key, t, v)
  private def L = Seq(
    (1L, "a", 100L), (2L, "a", 200L), (3L, "a", 250L),
    (4L, "b", 100L), // key with no right rows at/before
    (5L, "c", 500L)  // key with no right rows at all
  ).toDF("id", "key", "t")
  private def R = Seq(
    (10L, "a", 100L, 1.0),  // exactly at left 1's t
    (11L, "a", 150L, 2.0),
    (12L, "a", 400L, 3.0),
    (13L, "b", 300L, 4.0)
  ).toDF("rid", "key", "rt", "v")

  private def run(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
    df.select(col("id"), col("m_rid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

  test("backward: latest right at-or-before; inclusive at equal ts") {
    val got = run(AsOfJoin.leftAsOf(L, R, Seq("key"), "t", "rt",
      payload = Seq("rt", "rid", "v"), tiebreakCol = "rid", outPrefix = "m_"))
    got shouldBe Map(
      1L -> Some(10L), // equal-ts row matches (inclusive)
      2L -> Some(11L), // latest of {100, 150}
      3L -> Some(11L),
      4L -> None,      // right exists only later
      5L -> None)      // no right rows for key
  }

  test("forward: earliest right at-or-after; inclusive at equal ts") {
    val got = run(AsOfJoin.leftAsOfForward(L, R, Seq("key"), "t", "rt",
      payload = Seq("rt", "rid", "v"), tiebreakCol = "rid", outPrefix = "m_"))
    got shouldBe Map(
      1L -> Some(10L), // equal-ts row matches (inclusive)
      2L -> Some(12L), // next future right
      3L -> Some(12L),
      4L -> Some(13L), // only-future right found
      5L -> None)
  }

  test("forward tolerance nulls matches beyond the gap, keeps left rows") {
    val got = run(AsOfJoin.leftAsOfForward(L, R, Seq("key"), "t", "rt",
      payload = Seq("rt", "rid", "v"), tiebreakCol = "rid",
      tolerance = Some(150.0), outPrefix = "m_"))
    got shouldBe Map(
      1L -> Some(10L), // gap 0
      2L -> None,      // gap 200 > 150
      3L -> Some(12L), // gap 150 == tolerance (inclusive)
      4L -> None,      // gap 200 > 150
      5L -> None)
  }

  test("nearest: smaller |gap| wins, backward wins exact-distance ties") {
    val got = run(AsOfJoin.leftAsOfNearest(L, R, Seq("key"), "t", "rt",
      payload = Seq("rt", "rid", "v"), tiebreakCol = "rid", outPrefix = "m_"))
    got shouldBe Map(
      1L -> Some(10L), // gap 0 backward
      2L -> Some(11L), // back gap 50 < forward gap 200
      3L -> Some(11L), // back gap 100 < forward gap 150
      4L -> Some(13L), // only forward exists
      5L -> None)
    // exact-distance tie: left at 275 is 125 from right 150 and 125 from
    // right 400 — backward (rid 11) must win
    val tie = run(AsOfJoin.leftAsOfNearest(
      Seq((9L, "a", 275L)).toDF("id", "key", "t"), R, Seq("key"), "t", "rt",
      payload = Seq("rt", "rid", "v"), tiebreakCol = "rid", outPrefix = "m_"))
    tie(9L) shouldBe Some(11L)
  }

  test("nearest tolerance gates each side independently") {
    // left 2 (t=200): back gap 50, forward gap 200 — tol 100 keeps only back;
    // left 4 (t=100): forward gap 200 — tol 100 nulls it
    val got = run(AsOfJoin.leftAsOfNearest(L, R, Seq("key"), "t", "rt",
      payload = Seq("rt", "rid", "v"), tiebreakCol = "rid",
      tolerance = Some(100.0), outPrefix = "m_"))
    got(2L) shouldBe Some(11L)
    got(4L) shouldBe None
  }

  test("backward tiebreak at identical rightTs: largest tiebreak wins; forward: smallest") {
    val r2 = Seq((20L, "a", 100L, 1.0), (21L, "a", 100L, 2.0)).toDF("rid", "key", "rt", "v")
    val l2 = Seq((1L, "a", 100L)).toDF("id", "key", "t")
    val b = run(AsOfJoin.leftAsOf(l2, r2, Seq("key"), "t", "rt",
      payload = Seq("rt", "rid", "v"), tiebreakCol = "rid", outPrefix = "m_"))
    b(1L) shouldBe Some(21L)
    val f = run(AsOfJoin.leftAsOfForward(l2, r2, Seq("key"), "t", "rt",
      payload = Seq("rt", "rid", "v"), tiebreakCol = "rid", outPrefix = "m_"))
    f(1L) shouldBe Some(20L)
  }

  test("forward == theta join reference on real timestamped events") {
    val e = graft.Tables.events(spark, sf)
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("cts"))
      .agg(min(col("event_id")).as("cid"))
    val got = AsOfJoin.leftAsOfForward(purchases, clicks, Seq("user_id"),
      "ts", "cts", payload = Seq("cts", "cid"), tiebreakCol = "cid",
      outPrefix = "n_")
    // reference: per purchase, the minimum (cts, cid) among future clicks
    val ref = purchases.as("p")
      .join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") && col("c.cts") >= col("p.ts"),
        "left")
      .groupBy(col("p.event_id").as("event_id"))
      .agg(min(struct(col("c.cts"), col("c.cid"))).as("m"))
      .select(col("event_id"), col("m.cts").as("n_cts"), col("m.cid").as("n_cid"))
    val a = got.select("event_id", "n_cts", "n_cid").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    val b = ref.collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    a shouldBe b
  }
}
