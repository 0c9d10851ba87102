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

  test("saltedEquiJoin bounds per-reducer rows under a power-law key (one key = 30% of rows)") {
    // The scale claim behind Skew.saltedEquiJoin and Graph.scala's
    // "celebrity skew" note, asserted at the shuffle-unit level: after
    // salting, the unit of shuffle distribution is (key, salt), so the
    // hot key's rows MUST spread over `buckets` bounded slices instead
    // of landing on one reducer. 30% of the probe on a single key is the
    // power-law shape a corpus-scale join sees (one viral document, one
    // celebrity node).
    val n = 60000L
    val buckets = 16
    val probe = spark.range(0, n)
      .select(when(col("id") % 10 < 3, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("rid"))
    val build = spark.range(0, n).select(col("id").as("k"), (col("id") % 7).as("tag"))
    // result parity first: salt must never change the answer
    val salted = Skew.saltedEquiJoin(probe, build, "k", saltFrom = col("rid"), buckets)
    val plainCount = probe.join(build, Seq("k")).count()
    salted.count() shouldBe plainCount
    // the join itself must be keyed on the salted pair, not the raw key
    salted.queryExecution.optimizedPlan.toString should include("_salt")
    val hotRows = (n * 3 / 10).toLong // 18k rows on key 0
    // unsalted shuffle unit: the entire hot key on ONE reducer
    val unsaltedMax = probe.groupBy(col("k")).count()
      .agg(max("count")).head().getLong(0)
    unsaltedMax shouldBe hotRows
    // salted shuffle unit (k, salt), recomputed exactly as saltedEquiJoin
    // derives it: every unit is a bounded slice — 2x the ideal split
    // absorbs hash imbalance, still 8x better than the unsalted unit
    val saltedMax = probe
      .withColumn("_salt", pmod(xxhash64(col("rid")), lit(buckets.toLong)))
      .groupBy(col("k"), col("_salt")).count()
      .agg(max("count")).head().getLong(0)
    saltedMax should be <= hotRows / buckets * 2
  }

  test("AQE skew-join splits a hot partition at runtime (skew=true in the final plan)") {
    import spark.implicits._
    // one hot key carrying ~5 MB vs 8 KB advisory/skew thresholds: AQE
    // must mark the sort-merge join skewed and split the hot partition
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1", // AQE too
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val pad = "x" * 100
      // 90% of rows on key 0 (~4.5 MB in one shuffle partition), the rest
      // one row per distinct key (~125 KB per partition): hot partition is
      // far beyond 2x median AND the 8 KB threshold
      val left = spark.range(0, 50000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
          lit(pad).as("pad"))
      val right = spark.range(0, 50000).select(col("id").as("k"), lit(1).as("tag"))
      val joined = left.join(right, Seq("k"))
      // collect() drives THIS dataset's own QueryExecution — count() would
      // execute a separate agg-on-top plan and leave joined.queryExecution
      // un-finalized (isFinalPlan=false, no skew markers yet)
      joined.collect().length shouldBe 50000
      val finalPlan = joined.queryExecution.executedPlan.toString
      finalPlan should include("skew=true")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
