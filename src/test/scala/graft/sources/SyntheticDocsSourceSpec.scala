package graft.sources

import graft.SparkSpec
import graft.sources.v2.SyntheticDocsSource
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
    counted.queryExecution.executedPlan.toString should include("COUNT pushdown range=[100,350)")
  }
}
