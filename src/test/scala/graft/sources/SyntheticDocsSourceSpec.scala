package graft.sources

import graft.SparkSpec
import graft.sources.v2.{SyntheticDocs, SyntheticDocsSource}
import org.apache.spark.sql.functions._

class SyntheticDocsSourceSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = classOf[SyntheticDocsSource].getName
  private def docs = spark.read.format(fmt)
    .option("rows", "1000").option("chunk", "125").load()

  test("reads the full synthetic corpus with chunk-sized partitions") {
    docs.count() shouldBe 1000L
    docs.rdd.getNumPartitions shouldBe 8 // 1000 / 125
    // deterministic: same ids -> same text on every read
    val a = docs.where(col("doc_id") === 7).select("text").as[String].head()
    val b = docs.where(col("doc_id") === 7).select("text").as[String].head()
    a shouldBe b
    a.split(" ").length shouldBe 8
  }

  test("doc_id range filters push down and prune input partitions") {
    val filtered = docs.where(col("doc_id") >= 250 && col("doc_id") < 500)
    filtered.count() shouldBe 250L
    // the pushed range [250,500) plans 2 chunks instead of 8
    filtered.rdd.getNumPartitions shouldBe 2
    val plan = filtered.queryExecution.executedPlan.toString
    plan should include("range=[250,500)")
  }

  test("column pruning reaches the reader") {
    val pruned = docs.select("doc_id")
    pruned.queryExecution.executedPlan.toString should include("cols=doc_id")
    pruned.agg(sum(col("doc_id"))).as[Long].head() shouldBe (0L until 1000L).sum
  }

  test("ungrouped COUNT(*) pushes down completely and composes with filter pruning") {
    val counted = docs.where(col("doc_id") >= 100 && col("doc_id") < 350)
      .groupBy().count()
    counted.as[Long].head() shouldBe 250L
    // the scan answered the count itself — no aggregation planned at all
    counted.queryExecution.executedPlan.toString should include(
      "AGG pushdown [count] range=[100,350)")
  }

  test("MIN/MAX/SUM/COUNT push down together in closed form") {
    val agged = docs.where(col("doc_id") >= 10 && col("doc_id") < 20)
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
        sum(col("doc_id")).as("sm"), count(lit(1)).as("ct"),
        count(col("doc_id")).as("ctc"))
    agged.as[(Long, Long, Long, Long, Long)].head() shouldBe
      ((10L, 19L, (10L until 20L).sum, 10L, 10L))
    // Spark dedups the two equivalent counts before pushing
    agged.queryExecution.executedPlan.toString should include(
      "AGG pushdown [min,max,sum,count] range=[10,20)")
  }

  test("aggregates over a fully-pruned range answer NULL/0 without reading rows") {
    val empty = docs.where(col("doc_id") >= 900 && col("doc_id") < 900)
      .agg(min(col("doc_id")).as("mn"), count(lit(1)).as("ct"))
    val row = empty.head()
    row.isNullAt(0) shouldBe true
    row.getLong(1) shouldBe 0L
  }

  test("AVG pushes down as Spark's sum/count rewrite; DISTINCT falls back to the scan") {
    // Catalyst rewrites Average into Sum+Count when the source supports
    // complete pushdown of both — the final divide runs in the Project
    val avgq = docs.where(col("doc_id") < 100).agg(avg(col("doc_id")))
    avgq.as[Double].head() shouldBe 49.5
    avgq.queryExecution.executedPlan.toString should include(
      "AGG pushdown [sum,count] range=[0,100)")

    val dq = docs.where(col("doc_id") < 100).agg(countDistinct(col("doc_id")))
    dq.as[Long].head() shouldBe 100L
    dq.queryExecution.executedPlan.toString should not include "AGG pushdown"
  }

  test("columnar batches are the default read path and equal the row path") {
    docs.queryExecution.executedPlan.toString should include("ColumnarToRow")
    val rowPath = spark.read.format(fmt).option("rows", "1000")
      .option("chunk", "125").option("columnar", "false").load()
    rowPath.queryExecution.executedPlan.toString should not include "ColumnarToRow"
    docs.orderBy("doc_id").collect().map(_.toSeq.toList) shouldBe
      rowPath.orderBy("doc_id").collect().map(_.toSeq.toList)
  }

  test("runtime filtering: broadcast-join key values re-plan the scan partitions") {
    import graft.sources.v2.SyntheticDocsRuntime
    SyntheticDocsRuntime.reset()
    // selective dim side: 3 ids in chunks 0, 3 and 7 of the 8-chunk corpus
    val dim = spark.range(0, 1000).select(col("id").as("doc_id"))
      .where(col("doc_id") % 450 === 5)
    val joined = docs.join(broadcast(dim), Seq("doc_id"))
      .select(col("doc_id"), col("text"))
    joined.collect().map(_.getLong(0)).sorted shouldBe Array(5L, 455L, 905L)
    // the scan received the IN-set after the dim side executed...
    SyntheticDocsRuntime.lastFilterIds shouldBe Array(5L, 455L, 905L)
    // ...and re-planned to ONLY the 3 chunks holding those ids (from 8)
    SyntheticDocsRuntime.lastPlannedPartitions shouldBe 3
  }

  test("filter-narrowed statistics drive automatic broadcast of the small side") {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val filtered = docs.where(col("doc_id") < 100)
    val scanStats = filtered.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.stats
    }.head
    scanStats.rowCount shouldBe Some(BigInt(100))
    scanStats.sizeInBytes shouldBe BigInt(100 * 68)

    // the probe side (~16 MB by its own stats) exceeds the 10 MB broadcast
    // threshold; the 6.8 KB filtered scan qualifies — no hint anywhere
    val big = spark.range(2000000).withColumnRenamed("id", "doc_id")
    val joined = big.join(filtered, "doc_id")
    joined.count() shouldBe 100L
    val plan = joined.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should include("BroadcastExchange")
  }

  test("textOf survives ids past the Long-wrap point of the hash product") {
    // (id*8+w)*2654435761 wraps Long near id ~4.3e8; floorMod keeps the
    // vocab index non-negative (a bare % indexed vocab(-k) and threw)
    val t = SyntheticDocs.textOf(500000000L)
    t.split(" ").length shouldBe 8
    // determinism across calls
    SyntheticDocs.textOf(500000000L) shouldBe t
    // oversized chunk is a loud construction error, not a corrupt scan
    an[IllegalArgumentException] should be thrownBy
      spark.read.format("graft.sources.v2.SyntheticDocsSource")
        .option("rows", "10").option("chunk", (Int.MaxValue.toLong + 1).toString)
        .load().count()
  }
}
