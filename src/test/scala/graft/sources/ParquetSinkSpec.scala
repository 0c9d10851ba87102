package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ParquetSinkSpec extends SparkSpec {

  test("bucketed tables join without any exchange (co-located SMJ)") {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_extendedprice"))
      val ord = Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_orderpriority"))
      ParquetSink.writeBucketed(li, "li_bucketed",
        Seq("l_orderkey"), buckets = 4, sortCols = Seq("l_orderkey"))
      ParquetSink.writeBucketed(ord, "ord_bucketed",
        Seq("o_orderkey"), buckets = 4, sortCols = Seq("o_orderkey"))

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val n = joined.collect().length // materialize -> AQE final plan
      val plan = joined.queryExecution.executedPlan.toString

      n shouldBe li.join(ord, col("l_orderkey") === col("o_orderkey")).count().toInt
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

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

  test("filesPerPartition > 1 actually yields multiple files per directory partition") {
    val dir = Files.createTempDirectory("graft-sink-fpp").toString
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"))
    ParquetSink.write(orders, dir,
      partitionBy = Seq("o_orderpriority"), filesPerPartition = 3)
    spark.read.parquet(dir).count() shouldBe orders.count()
    // without the salt the partition-column hash put each directory
    // partition in ONE task -> exactly one file, a silent no-op
    val perDir = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("o_orderpriority="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    perDir.length should be >= 2
    perDir.max should be > 1
    perDir.foreach(_ should be <= 3)
  }

  test("filesPerPartition salt is a deterministic function of row content") {
    // retry-safety contract: the salt must reproduce the same shuffle
    // assignment on task re-execution. Observable consequence: rows with
    // IDENTICAL content always carry the same salt, so duplicates of a
    // row land in the SAME output file. A positional salt
    // (monotonically_increasing_id — the SPARK-23207 class) spreads them.
    val dir = Files.createTempDirectory("graft-sink-detsalt").toString
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority")).limit(200)
    val dupd = base.union(base).union(base) // 3 copies of each row
    ParquetSink.write(dupd, dir,
      partitionBy = Seq("o_orderpriority"), filesPerPartition = 4)
    val back = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
    back.count() shouldBe dupd.count()
    back.groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(countDistinct(col("f")).as("nf"))
      .agg(max(col("nf"))).head().getLong(0) shouldBe 1L
  }
}
