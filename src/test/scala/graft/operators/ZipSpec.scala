package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Zip]] — positional join / zipWithIndex without a global single-task
  * window (the reference's `rdd.zip` parity surface, Main.scala:183). */
class ZipSpec extends SparkSpec {
  import spark.implicits._

  test("zipWithIndex matches global-window row_number on real events") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("value"))
    val got = Zip.zipWithIndex(ev, Seq("value", "event_id"))
      .select(col("event_id"), col("pos"))
      .orderBy("pos").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ref = ev.select(col("event_id"),
        row_number().over(Window.orderBy(col("value"), col("event_id")))
          .cast("long").as("pos"))
      .orderBy("pos").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe ref
  }

  test("zipByOrder pairs i-th rows and stops at the shorter side") {
    val a = Seq((10L, "x"), (30L, "y"), (20L, "z"))
      .toDF("ak", "av")
    val b = Seq((5L, 100.0), (1L, 200.0), (3L, 300.0), (2L, 400.0))
      .toDF("bk", "bv")
    val out = Zip.zipByOrder(a, Seq("ak"), b, Seq("bk"))
      .orderBy("pos")
      .collect().map(r => (r.getAs[Long]("pos"), r.getAs[String]("av"),
        r.getAs[Double]("bv"))).toSeq
    // a sorted by ak: x(10), z(20), y(30); b sorted by bk: 200, 400, 300, 100
    out shouldBe Seq((1L, "x", 200.0), (2L, "z", 400.0), (3L, "y", 300.0))
  }

  test("no unpartitioned window anywhere in the plan") {
    val ev = Tables.events(spark, sf).select(col("event_id"), col("value"))
    val plan = Zip.zipWithIndex(ev, Seq("event_id")).queryExecution.optimizedPlan
    val bad = plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    bad shouldBe empty
  }

  test("positions are dense 1..n with unique pairing") {
    val ev = Tables.events(spark, sf).select(col("event_id"))
    val n = ev.count()
    val pos = Zip.zipWithIndex(ev, Seq("event_id"))
      .agg(count(lit(1)), min(col("pos")), max(col("pos")),
        countDistinct(col("pos")))
      .head()
    pos.getLong(0) shouldBe n
    pos.getLong(1) shouldBe 1L
    pos.getLong(2) shouldBe n
    pos.getLong(3) shouldBe n
  }
}
