package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Behavior checks for the round-3 drift/selection/chunking queries:
  * invariants a correct implementation must satisfy beyond the DuckDB
  * hash (which pins exact values but not semantics).
  */
class DriftStatsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("stats_ks_drift: D is a probability-scale statistic in [0,1]") {
    val Row(n1: Long, n2: Long, d: Double) = q("stats_ks_drift").head()
    n1 should be > 0L
    n2 should be > 0L
    d should (be >= 0.0 and be <= 1.0)
  }

  test("stats_ks_drift: identical samples give D = 0") {
    import spark.implicits._
    val ev = Seq.tabulate(100)(i => (i.toLong, "click", i * 0.5)) ++
      Seq.tabulate(100)(i => (100L + i, "error", i * 0.5))
    val df = ev.toDF("event_id", "event_type", "value")
    // Recompute the statistic inline on identical distributions.
    val grid = df.groupBy($"value").agg(
      sum(when($"event_type" === "click", 1L).otherwise(0L)).as("c1"),
      sum(when($"event_type" === "error", 1L).otherwise(0L)).as("c2"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"value")
      .rowsBetween(Long.MinValue, 0)
    val tot = grid.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
    val d = grid
      .select(sum($"c1").over(w).as("k1"), sum($"c2").over(w).as("k2"))
      .crossJoin(broadcast(tot))
      .agg(max(abs($"k1" / $"n1" - $"k2" / $"n2")))
      .head().getDouble(0)
    d shouldBe 0.0
  }

  test("stats_psi_drift: 10 bins, every per-bin PSI term is nonnegative") {
    val rows = q("stats_psi_drift").collect()
    rows.length shouldBe 10
    // (p1-p2) and ln(p1/p2) always share a sign, so each term >= 0.
    rows.foreach(r => r.getAs[Double]("psi_term") should be >= -1e-6)
    rows.map(_.getAs[Long]("bin")).toSeq shouldBe (0L to 9L)
  }

  test("stats_js_divergence: 10 bins, terms nonnegative, total bounded by ln 2") {
    val rows = q("stats_js_divergence").collect()
    rows.length shouldBe 10
    // per bin, p1·ln(p1/m)+p2·ln(p2/m) with m=(p1+p2)/2 is >= 0 (Jensen),
    // and the total JSD of two (smoothed, ~unit-mass) distributions is
    // bounded by ln 2 — the saturation property PSI lacks
    rows.foreach(r => r.getAs[Double]("jsd_term") should be >= -1e-6)
    val total = rows.map(_.getAs[Double]("jsd_term")).sum
    total should be <= (math.log(2.0) + 1e-6)
    rows.map(_.getAs[Long]("bin")).toSeq shouldBe (0L to 9L)
  }

  test("stats_chisq_independence: chi2 >= 0 and dof = (L-1)(S-1)") {
    val r = q("stats_chisq_independence").head()
    r.getAs[Double]("chi2") should be >= 0.0
    val docs = graft.Tables.documents(spark, sf)
    val nl = docs.select("lang").distinct.count()
    val ns = docs.select("source").distinct.count()
    r.getAs[Long]("dof") shouldBe (nl - 1) * (ns - 1)
  }

  test("chunk_documents: chunks tile each doc — sum of stride-covered tokens matches") {
    val chunks = q("chunk_documents")
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), org.apache.spark.sql.functions.size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
    // Last chunk ends exactly at the doc end; starts advance by 48.
    val agg = chunks.groupBy("doc_id").agg(
      max(col("start_tok") + col("n_tokens")).as("covered"),
      count(lit(1)).as("n_chunks"),
      max("start_tok").as("last_start"))
    val joined = agg.join(docs, "doc_id")
    joined.filter(col("covered") =!= col("n")).count() shouldBe 0L
    // n_chunks = ceil(n / 48) for the start grid 0,48,...
    joined.filter(col("n_chunks") =!= ceil(col("n") / lit(48.0)).cast("long"))
      .count() shouldBe 0L
  }

  test("chunk_documents: non-tail chunks are exactly 64 tokens") {
    val chunks = q("chunk_documents")
    chunks.filter(col("n_tokens") > 64).count() shouldBe 0L
    // every chunk that is not the last one in its doc has the full width
    // only when the remaining doc is >= 64; equivalently short chunks may
    // appear only at the tail (start + n == doc length, checked above).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("chunk_id").desc)
    val rn = row_number().over(w)
    chunks.withColumn("from_end", rn)
      .filter(col("from_end") > 2 && col("n_tokens") < 64)
      .count() shouldBe 0L
  }

  test("text_tfidf_topk: exactly <=3 ranks per doc, scores positive and ranked desc") {
    val r = q("text_tfidf_topk")
    r.groupBy("doc_id").count().filter(col("count") > 3).count() shouldBe 0L
    r.filter(col("tfidf") <= 0.0).count() shouldBe 0L
    // rank order matches score order within each doc
    val bad = r.alias("a").join(r.alias("b"),
      col("a.doc_id") === col("b.doc_id") && col("a.rnk") < col("b.rnk") &&
        col("a.tfidf") < col("b.tfidf") - lit(1e-9))
    bad.count() shouldBe 0L
  }

  test("text_pmi_pairs: support bounds — dfab <= min(dfa, dfb) <= n_docs") {
    val r = q("text_pmi_pairs")
    r.filter(col("dfab") > least(col("dfa"), col("dfb"))).count() shouldBe 0L
    val n = graft.Tables.documents(spark, sf).count()
    r.filter(col("dfa") > n || col("dfb") > n).count() shouldBe 0L
  }

  test("curation_dsir_weights: top-100 is enriched for the target domain") {
    val top = q("curation_dsir_weights")
    val docs = graft.Tables.documents(spark, sf)
    val topEn = top.join(docs.select("doc_id", "lang"), "doc_id")
      .filter(col("lang") === "en").count().toDouble / top.count()
    val baseEn = docs.filter(col("lang") === "en").count().toDouble / docs.count()
    topEn should be > baseEn
  }

  test("events_ewma: average lies within the min/max envelope of the series") {
    val r = q("events_ewma")
    val env = graft.Tables.events(spark, sf).groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
    r.join(env, "user_id")
      .filter(col("ewma") < col("lo") - 1e-6 || col("ewma") > col("hi") + 1e-6)
      .count() shouldBe 0L
  }

  test("stats_spearman: rho in [-1,1]; near zero on the independent fixture columns") {
    val r = q("stats_spearman").head()
    val rho = r.getAs[Double]("rho")
    rho should (be >= -1.0 and be <= 1.0)
    // the synthetic fixture draws quantity and price independently —
    // a correct rank correlation must be near zero here (a bug that
    // rank-correlates row order instead of values would inflate this)
    math.abs(rho) should be < 0.1
  }

  test("stats_spearman: perfect monotone series gives rho = 1") {
    import spark.implicits._
    val df = Seq.tabulate(50)(i => (i.toDouble, math.exp(i * 0.1))).toDF("x", "y")
    // same grid-rank formulation inline
    def grid(c: String) = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(c))
        .rowsBetween(Long.MinValue, 0)
      df.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .select(col(c), (sum(col("cnt")).over(w) * 2 - col("cnt") + 1).as(s"r$c"))
    }
    val s = df.join(grid("x"), "x").join(grid("y"), "y")
      .agg(count(lit(1)).as("n"), sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("rx")).as("sxx"), sum(col("ry") * col("ry")).as("syy"),
        sum(col("rx") * col("ry")).as("sxy")).head()
    val (n, sx, sy, sxx, syy, sxy) = (s.getLong(0).toDouble, s.getLong(1).toDouble,
      s.getLong(2).toDouble, s.getLong(3).toDouble, s.getLong(4).toDouble, s.getLong(5).toDouble)
    val rho = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    rho shouldBe 1.0 +- 1e-12
  }

  test("stats_mannwhitney_u: U within [0, n1*n2] and consistent with rank-sum identity") {
    val r = q("stats_mannwhitney_u").head()
    val (n1, n2) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"))
    val u1 = r.getAs[Double]("u1")
    u1 should (be >= 0.0 and be <= (n1 * n2).toDouble)
    // z has the sign of (U - n1 n2 / 2)
    val z = r.getAs[Double]("z")
    (z > 0) shouldBe (u1 > n1 * n2 / 2.0)
  }

  test("stats_qq_deciles: deciles are nondecreasing and bounded by the sample range") {
    val rows = q("stats_qq_deciles").collect()
    rows.length shouldBe 9
    val qc = rows.map(_.getAs[Double]("q_click"))
    val qe = rows.map(_.getAs[Double]("q_error"))
    qc.sliding(2).foreach { case Array(a, b) => b should be >= a }
    qe.sliding(2).foreach { case Array(a, b) => b should be >= a }
    val env = graft.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "error"))
      .agg(min("value"), max("value")).head()
    val (lo, hi) = (env.getDouble(0), env.getDouble(1))
    (qc ++ qe).foreach { v => v should (be >= lo and be <= hi) }
  }

  test("stats_anova_f: F >= 0 and SSB/SSW partition the total sum of squares") {
    val r = q("stats_anova_f").head()
    val (ssb, ssw, f) = (r.getAs[Double]("ssb"), r.getAs[Double]("ssw"),
      r.getAs[Double]("f_stat"))
    f should be >= 0.0
    ssb should be >= 0.0
    ssw should be >= 0.0
    // SSB + SSW == total SS (computed independently, tolerance for the
    // two independent fixed-point estimators of x and x²)
    val ev = graft.Tables.events(spark, sf)
    val Row(n: Long, s: Double, q2: Double) = ev.agg(count(lit(1)),
      sum(col("value")), sum(col("value") * col("value"))).head()
    val sst = q2 - s * s / n
    (ssb + ssw) shouldBe sst +- math.max(1e-3, sst * 1e-6)
  }

  test("events_changepoint: index within range") {
    val r = q("events_changepoint").head()
    val (t, nh) = (r.getAs[Long]("t_index"), r.getAs[Long]("n_hours"))
    t should (be >= 1L and be <= nh)
  }

  test("events_changepoint: flat series has cusum 0 everywhere; a planted step is found") {
    import spark.implicits._
    def cusumArgmax(xs: Seq[Long]): (Long, Double) = {
      // inline replica of the query's scaled-cusum argmax over a series
      val n = xs.size.toLong
      val s = xs.sum
      val picks = xs.scanLeft(0L)(_ + _).tail.zipWithIndex.map { case (k, i) =>
        (i + 1L, n * k - (i + 1) * s)
      }
      val (t, cn) = picks.maxBy { case (t, cn) => (cn.abs, -t) }
      (t, cn.toDouble / n)
    }
    val (tFlat, cFlat) = cusumArgmax(Seq.fill(10)(5L))
    cFlat shouldBe 0.0
    tFlat shouldBe 1L // all-zero cusum: earliest hour wins the tie
    // a step from 5 to 15 at position 6 puts the argmax at the step edge
    val (tStep, cStep) = cusumArgmax(Seq.fill(5)(5L) ++ Seq.fill(5)(15L))
    tStep shouldBe 5L
    cStep should be < 0.0 // level rises after t=5 → cusum dips most there
  }

  test("stats_isotonic_calibration: fit is monotone and preserves the weighted mean") {
    val rows = q("stats_isotonic_calibration").collect()
    rows.length should be > 3
    val iso = rows.map(_.getAs[Double]("rate_iso"))
    iso.sliding(2).foreach { case Array(a, b) => b should be >= a - 1e-12 }
    // isotonic regression preserves the weighted mean: Σ n·ŷ = Σ pos
    val fitted = rows.map(r => r.getAs[Long]("n") * r.getAs[Double]("rate_iso")).sum
    val posSum = rows.map(_.getAs[Long]("pos")).sum.toDouble
    fitted shouldBe posSum +- 1e-6 * posSum
    // and stays within the raw-rate envelope
    val raw = rows.map(_.getAs[Double]("rate_raw"))
    iso.foreach { y => y should (be >= raw.min - 1e-12 and be <= raw.max + 1e-12) }
  }

  test("events_ewma: single-event series returns that value") {
    import spark.implicits._
    // build a 1-event fold inline with the same expression shape
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, 42.5))
      .toDF("user_id", "ts", "event_id", "value")
    val sorted = array_sort(collect_list(struct(col("ts"), col("event_id"), col("value"))))
    val out = df.groupBy(col("user_id"))
      .agg(transform(sorted, x => x.getField("value")).as("vals"))
      .select(aggregate(
        slice(col("vals"), lit(2), greatest(org.apache.spark.sql.functions.size(col("vals")) - 1, lit(0))),
        element_at(col("vals"), 1),
        (acc, x) => graft.util.Det.fixed(acc * lit(0.875) + x * lit(0.125), 9)))
      .head().getDouble(0)
    out shouldBe 42.5
  }
}
