package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketed-table co-located join: both fact tables written bucketed on
  * the join key land pre-partitioned, so the join plans with NO shuffle
  * exchange on either side — the storage-level answer to the
  * lineitem⋈orders shuffle at 100 TB (SCALING.md).
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bucketing LOCATION '$wh'")
    spark.sql("USE graft_bucketing")
    try {
      Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_extendedprice"))
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString

      // co-located: sort-merge join with ZERO shuffle exchanges
      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning"

      // and it computes the same answer as the plain join
      val n = joined.count()
      val want = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .count()
      n shouldBe want
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      spark.sql("USE default")
    }
  }

  test("join_bucketed_smj catalog query: join + per-order agg with zero hash exchanges") {
    val wh = Files.createTempDirectory("graft-warehouse2").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bucketing2 LOCATION '$wh'")
    spark.sql("USE graft_bucketing2")
    try {
      val df = graft.SparkEntry.queries("join_bucketed_smj")(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      // the ONLY exchange is the rangepartitioning for the presentation
      // orderBy; join AND the per-order aggregate reuse the bucket layout
      plan should not include "Exchange hashpartitioning"
      df.count() shouldBe Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey")).distinct().count()
    } finally {
      val tag = sf.split('/').filter(_.nonEmpty).last.replace('.', '_')
      spark.sql(s"DROP TABLE IF EXISTS graft_orders_b_$tag")
      spark.sql(s"DROP TABLE IF EXISTS graft_lineitem_b_$tag")
      spark.sql("USE default")
    }
  }
}
