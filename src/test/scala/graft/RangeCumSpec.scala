package graft

import graft.operators.RangeCum
import graft.operators.RangeCum.Cum
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[RangeCum]] — the distributed prefix aggregation that replaces
  * unpartitioned `Window.orderBy` cumulatives (the single-task
  * scale-killer) in the rank/ECDF query family. */
class RangeCumSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random frame: unique keys, signed values
  private def frame(n: Int): DataFrame =
    spark.range(n).select(
      (pmod(col("id") * 2654435761L, lit(1000003L))).as("k"),
      (pmod(col("id") * 40503 + 7, lit(997L)) - 498).as("v1"),
      (pmod(col("id") * 69069 + 11, lit(101L))).as("v2"))
      .dropDuplicates("k")

  private def globalRef(df: DataFrame): DataFrame = {
    val wi = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val we = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col("k"), col("v1"), col("v2"),
      sum(col("v1")).over(wi).as("cs"),
      max(col("v2")).over(we).as("pm"))
  }

  test("cum sum + exclusive max match the global-window reference") {
    val df = frame(5000)
    val got = RangeCum.withCums(df, "k",
        Seq(Cum("v1", "cs"), Cum("v2", "pm", agg = "max", inclusive = false)),
        partitions = 7)
      .select(col("k"), col("v1"), col("v2"), col("cs"), col("pm"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    val ref = globalRef(df).orderBy("k").collect().map(_.toSeq).toSeq
    got.size shouldBe ref.size
    got shouldBe ref
  }

  test("first-row semantics: exclusive frame is null, inclusive is the row") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 5L)).toDF("k", "v")
    val out = RangeCum.withCums(df, "k",
        Seq(Cum("v", "cs"), Cum("v", "pm", agg = "max", inclusive = false)),
        partitions = 3)
      .orderBy("k").collect()
    out.map(_.getAs[Long]("cs")).toSeq shouldBe Seq(10L, 30L, 35L)
    out(0).isNullAt(out(0).fieldIndex("pm")) shouldBe true
    out(1).getAs[Long]("pm") shouldBe 10L
    out(2).getAs[Long]("pm") shouldBe 20L
  }

  test("more partitions than rows (empty range partitions) still exact") {
    val df = Seq((5L, 1L), (9L, 2L)).toDF("k", "v")
    val out = RangeCum.withCums(df, "k", Seq(Cum("v", "cs")), partitions = 16)
      .orderBy("k").collect()
    out.map(_.getAs[Long]("cs")).toSeq shouldBe Seq(1L, 3L)
  }

  test("no unpartitioned Window node anywhere in the plan") {
    val df = frame(100)
    val out = RangeCum.withCums(df, "k", Seq(Cum("v1", "cs")))
    val bare = out.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    bare shouldBe empty
  }

  test("grouped cum matches the grouped-window reference") {
    val df = frame(4000)
      .withColumn("g", pmod(col("v2"), lit(3L)))
    val wi = Window.partitionBy(col("g")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val we = Window.partitionBy(col("g")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = df.select(col("g"), col("k"),
        sum(col("v1")).over(wi).as("cs"),
        max(col("v2")).over(we).as("pm"))
      .orderBy("g", "k").collect().map(_.toSeq).toSeq
    val got = RangeCum.withCumsGrouped(df, Seq("g"), "k",
        Seq(Cum("v1", "cs"), Cum("v2", "pm", agg = "max", inclusive = false)),
        partitions = 7)
      .select(col("g"), col("k"), col("cs"), col("pm"))
      .orderBy("g", "k").collect().map(_.toSeq).toSeq
    got.size shouldBe ref.size
    got shouldBe ref
  }

  test("grouped: each group's first row restarts the prefix") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 1L, 5L), ("b", 3L, 7L))
      .toDF("g", "k", "v")
    val out = RangeCum.withCumsGrouped(df, Seq("g"), "k",
        Seq(Cum("v", "cs"), Cum("v", "pm", agg = "max", inclusive = false)),
        partitions = 4)
      .orderBy("g", "k").collect()
    out.map(_.getAs[Long]("cs")).toSeq shouldBe Seq(10L, 30L, 5L, 12L)
    out(0).isNullAt(out(0).fieldIndex("pm")) shouldBe true
    out(2).isNullAt(out(2).fieldIndex("pm")) shouldBe true
    out(1).getAs[Long]("pm") shouldBe 10L
    out(3).getAs[Long]("pm") shouldBe 5L
  }

  test("grouped: null group key behaves as its own group") {
    val df = Seq((Option("a"), 1L, 1L), (None, 1L, 2L), (None, 2L, 3L),
        (Option("a"), 2L, 4L))
      .toDF("g", "k", "v")
    val out = RangeCum.withCumsGrouped(df, Seq("g"), "k",
        Seq(Cum("v", "cs")), partitions = 3)
      .orderBy(col("g").asc_nulls_first, col("k")).collect()
    out.map(_.getAs[Long]("cs")).toSeq shouldBe Seq(2L, 5L, 1L, 5L)
  }

  test("grouped: no unpartitioned Window node in the plan") {
    val df = frame(200).withColumn("g", pmod(col("v2"), lit(4L)))
    val out = RangeCum.withCumsGrouped(df, Seq("g"), "k", Seq(Cum("v1", "cs")))
    val bare = out.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    bare shouldBe empty
  }

  // The four rewritten catalog queries must never fall back to a global
  // window: their grid cardinality scales with the data.
  private val rewritten =
    Seq("stats_ks_drift", "stats_mannwhitney_u", "stats_qq_deciles",
      "stats_spearman", "sort_pareto_skyline", "events_changepoint",
      "stats_isotonic_calibration")

  rewritten.foreach { name =>
    test(s"$name: plan has no unpartitioned Window over row-scaling input") {
      val df = SparkEntry.queries(name)(spark, sf)
      val bare = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      bare shouldBe empty
      spark.catalog.clearCache()
    }
  }
}
