package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopKAggregator: the bounded-heap aggregate must agree exactly with
  * the window row_number formulation, under any partitioning.
  */
class TopKSpec extends SparkSpec {

  private def topkDf(k: Int, parts: Int) = {
    val tk = TopK.udafFor(k)
    Tables.orders(spark, sf)
      .repartition(parts, col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(tk(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).as("rnk"),
        col("col._1").as("price"), col("col._2").as("key"))
  }

  private def windowDf(k: Int) = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    Tables.orders(spark, sf)
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("o_orderpriority"), col("rnk"),
        col("o_totalprice").as("price"), col("o_orderkey").as("key"))
  }

  test("heap aggregate equals the window formulation (k=3)") {
    val got = topkDf(3, 4).collect().map(r =>
      (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    val want = windowDf(3).collect().map(r =>
      (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    got shouldBe want
    want.size should be > 3
  }

  test("result is partitioning-invariant") {
    val a = topkDf(5, 1).collect().map(_.toSeq).toSeq
    val b = topkDf(5, 13).collect().map(_.toSeq).toSeq
    a.toSet shouldBe b.toSet
  }

  test("k larger than the group returns the whole group, ordered") {
    import spark.implicits._
    val df = Seq((1.0, 10L), (3.0, 30L), (2.0, 20L)).toDF("v", "id")
    val tk = TopK.udafFor(10)
    val out = df.agg(tk(col("v"), col("id"))).head().getSeq[Row](0)
      .map(r => (r.getDouble(0), r.getLong(1)))
    out shouldBe Seq((3.0, 30L), (2.0, 20L), (1.0, 10L))
  }

  test("ties break by id descending, eviction keeps the larger pair") {
    import spark.implicits._
    val df = Seq((5.0, 1L), (5.0, 2L), (5.0, 3L), (4.0, 9L)).toDF("v", "id")
    val tk = TopK.udafFor(2)
    val out = df.agg(tk(col("v"), col("id"))).head().getSeq[Row](0)
      .map(r => (r.getDouble(0), r.getLong(1)))
    out shouldBe Seq((5.0, 3L), (5.0, 2L))
  }

  test("NaN values rank greatest (Spark double order) regardless of arrival order") {
    val agg = new TopKAggregator(2)
    val orders = Seq(
      Seq(Double.NaN -> 0L, 10.0 -> 1L, 20.0 -> 2L, 30.0 -> 3L),
      Seq(20.0 -> 2L, 30.0 -> 3L, Double.NaN -> 0L, 10.0 -> 1L),
      Seq(30.0 -> 3L, Double.NaN -> 0L, 20.0 -> 2L, 10.0 -> 1L))
    val results = orders.map(xs =>
      agg.finish(xs.foldLeft(agg.zero)((b, a) => agg.reduce(b, a)))
        .map { case (v, id) => (if (v.isNaN) "NaN" else v.toString, id) })
    results.distinct.size shouldBe 1
    results.head shouldBe Seq(("NaN", 0L), ("30.0", 3L))
  }

  test("raw reduce/merge: eviction and ordering invariants") {
    val agg = new TopKAggregator(3)
    val full = Seq(1.0 -> 1L, 5.0 -> 5L, 3.0 -> 3L, 4.0 -> 4L, 2.0 -> 2L)
      .foldLeft(agg.zero)((b, a) => agg.reduce(b, a))
    agg.finish(full) shouldBe Seq((5.0, 5L), (4.0, 4L), (3.0, 3L))
    // merge of disjoint partials == reduce over the union
    val left = Seq(1.0 -> 1L, 5.0 -> 5L).foldLeft(agg.zero)((b, a) => agg.reduce(b, a))
    val right = Seq(3.0 -> 3L, 4.0 -> 4L, 2.0 -> 2L).foldLeft(agg.zero)((b, a) => agg.reduce(b, a))
    agg.finish(agg.merge(left, right)) shouldBe Seq((5.0, 5L), (4.0, 4L), (3.0, 3L))
  }
}
