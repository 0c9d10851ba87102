package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ParquetSinkSpec extends SparkSpec {

  test("partitioned + sorted write round-trips and prunes partitions on read") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    ParquetSink.write(orders, dir,
      partitionBy = Seq("o_orderpriority"), sortBy = Seq("o_totalprice"))

    val back = spark.read.parquet(dir)
    back.count() shouldBe orders.count()

    // directory-partition layout exists
    val parts = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    parts.count(_.startsWith("o_orderpriority=")) should be >= 2

    // a predicate on the partition column prunes to that partition's files
    val pruned = back.where(col("o_orderpriority") === "1-URGENT")
    val plan = pruned.queryExecution.executedPlan.toString
    pruned.count() shouldBe orders.where(col("o_orderpriority") === "1-URGENT").count()
    plan should include("o_orderpriority") // partition filter present in scan
  }
}
