package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the round-8 session-2 additions: the
  * data-validation suite, the MAD robust-outlier statistic (vs an
  * in-memory sorted reference), and the additive identity of the
  * seasonal decomposition. Oracle hashing covers cross-engine equality;
  * these pin the SEMANTICS against independent re-computations. */
class NewOpsR8Spec extends SparkSpec {

  test("quality_constraints: six checks; the suite detects the fixtures'" +
      " real duplicate-key defect") {
    val rows = SparkEntry.queries("quality_constraints")(spark, sf).collect()
    rows.length shouldBe 6
    rows.map(_.getAs[String]("check_name")).toSeq shouldBe
      Seq("bounds_l_quantity", "completeness_l_returnflag",
        "domain_l_returnflag", "positivity_l_extendedprice",
        "ref_integrity_orderkey", "uniqueness_pk")
    val byName = rows.map(r => r.getString(0) ->
      ((r.getAs[Double]("metric"), r.getAs[Boolean]("passed")))).toMap
    // the synthetic lineitem REUSES (l_orderkey, l_linenumber) pairs
    // (~77% distinct) — the uniqueness check must catch that, every
    // other constraint holds on the fixtures
    val (uniq, uniqPassed) = byName("uniqueness_pk")
    uniqPassed shouldBe false
    uniq should (be > 0.5 and be < 1.0)
    byName.filterKeys(_ != "uniqueness_pk").values
      .foreach { case (_, p) => p shouldBe true }
    byName("completeness_l_returnflag")._1 shouldBe 1.0
  }

  test("stats_mad_outliers matches an in-memory sorted reference") {
    val got = SparkEntry.queries("stats_mad_outliers")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("med"),
          r.getAs[Double]("mad"), r.getAs[Long]("n_outliers")))).toMap
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    // lower median: smallest x with 2*rank(x) >= n
    def loMed(sorted: Seq[Double]): Double = sorted((sorted.size - 1) / 2)
    byType.foreach { case (t, vs) =>
      val (n, med, mad, nOut) = got(t)
      n shouldBe vs.size
      med shouldBe loMed(vs)
      mad shouldBe loMed(vs.map(v => math.abs(v - med)).sorted)
      nOut shouldBe vs.count(v => math.abs(v - med) > 3.0 * 1.4826 * mad)
    }
  }

  test("events_seasonal_decompose: additive identity and hod consistency") {
    val rows = SparkEntry.queries("events_seasonal_decompose")(spark, sf)
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      val y = r.getAs[Double]("y"); val t = r.getAs[Double]("trend")
      val s = r.getAs[Double]("seasonal"); val res = r.getAs[Double]("resid")
      // resid is fixed-rounded at 1e-6, so the identity holds to 5e-7
      math.abs(y - t - s - res) should be <= 5e-7
      r.getAs[Int]("hod") shouldBe
        r.getAs[java.sql.Timestamp]("h").toInstant
          .atZone(java.time.ZoneOffset.UTC).getHour
    }
    // every ±12h trend window averages only hours present in the grid:
    // interior hours of the dense fixture grid see all 25 contributors,
    // so trend differs from y (smoothing happened) somewhere
    rows.count(r => r.getAs[Double]("y") != r.getAs[Double]("trend")) should
      be > 0
  }
}
