package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.Files

/** Source-format breadth: the engine's tables round-trip through CSV and
  * JSON with explicit schemas (schema inference is banned at scale — one
  * inference pass over 100 TB costs as much as the query). */
class FormatRoundTripSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("orders round-trips through CSV with an explicit schema") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/orders"
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
    orders.write.mode("overwrite")
      .option("header", "true").option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(dir)
    val back = spark.read
      .schema(orders.schema)
      .option("header", "true")
      .csv(dir)
    canon(back) shouldBe canon(orders)
    back.schema shouldBe orders.schema
  }

  test("nation round-trips through JSON lines with an explicit schema") {
    val dir = Files.createTempDirectory("graft-json").toString + "/nation"
    val nation = Tables.nation(spark, sf)
    nation.write.mode("overwrite").json(dir)
    val back = spark.read.schema(nation.schema).json(dir)
    canon(back) shouldBe canon(nation)
  }

  test("lineitem round-trips through ORC with predicate pushdown on read") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/lineitem"
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"))
    li.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).where(col("l_quantity") > 40)
    canon(back) shouldBe canon(li.where(col("l_quantity") > 40))
    // the quantity predicate must reach the ORC scan as a pushed filter
    val formatted = back.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    formatted should include("PushedFilters")
    formatted should include("GreaterThan(l_quantity,40.0)")
  }

  test("malformed CSV rows are quarantined, not fatal (PERMISSIVE + corrupt column)") {
    val dir = Files.createTempDirectory("graft-badcsv").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "data.csv"),
      "id,price\n1,10.5\n2,notanumber\n3,7.25\n".getBytes("UTF-8"))
    val schema = StructType.fromDDL("id BIGINT, price DOUBLE, _corrupt_record STRING")
    val back = spark.read
      .schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .cache() // corrupt-record column requires materialized rows
    back.where(col("_corrupt_record").isNotNull).count() shouldBe 1
    back.where(col("_corrupt_record").isNull).count() shouldBe 2
  }
}
