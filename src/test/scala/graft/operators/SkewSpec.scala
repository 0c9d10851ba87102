package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedEquiJoin: result identical to the plain equi-join") {
    val probe = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val build = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_orderpriority"))
    val salted = Skew.saltedEquiJoin(probe, build, "o_orderkey",
        saltFrom = col("o_orderkey") * lit(8) + col("l_linenumber"), buckets = 8)
      .select("o_orderkey", "l_linenumber", "o_orderpriority")
      .collect().map(_.toSeq).toSet
    val plain = probe.join(build, Seq("o_orderkey"))
      .select("o_orderkey", "l_linenumber", "o_orderpriority")
      .collect().map(_.toSeq).toSet
    salted shouldBe plain
    salted should not be empty
  }

  test("twoPhaseCountSum: identical to plain groupBy count/sum") {
    val li = Tables.lineitem(spark, sf)
    val two = Skew.twoPhaseCountSum(li, "l_returnflag", "l_extendedprice",
        saltFrom = col("l_orderkey") * lit(8) + col("l_linenumber"), buckets = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = li
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("l_extendedprice") * 100, 0).cast("long")).cast("double") / 100).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    two shouldBe plain
  }
}
