package graft.operators

import graft.SparkSpec
import graft.util.Det
import org.apache.spark.sql.functions._

/** Contracts of the one-pass covariance aggregator that replaced the
  * double-posexplode formulation: (1) the scale-0 rounding fast path is
  * bit-equal to BigDecimal decimal-HALF_UP everywhere, including the FP
  * half-boundary puzzler values; (2) the aggregated sufficient statistics
  * reproduce the exploded formulation exactly, including ragged vectors
  * (a row contributes to pair (i,j) iff it has length > j).
  */
class CovAggregatorSpec extends SparkSpec {

  test("fixHalfUp matches BigDecimal HALF_UP on adversarial and random doubles") {
    def ref(v: Double): Long =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val adversarial = Seq(
      0.5, -0.5, 1.5, -1.5, 2.5, -2.5,
      0.49999999999999994, -0.49999999999999994, // +0.5 rounds to 1.0 in IEEE
      1.4999999999999998, -1.4999999999999998,
      4503599627370495.5, -4503599627370495.5, // 2^52 - 0.5
      4.503599627370496e15, 9.007199254740992e15, // 2^52, 2^53
      1e18, -1e18, 0.0, -0.0, 1e-300, -1e-300)
    adversarial.foreach { v =>
      CovSuffStatsAggregator.fixHalfUp(v) shouldBe ref(v)
    }
    val rnd = new scala.util.Random(42)
    (1 to 20000).foreach { _ =>
      val v = (rnd.nextDouble() - 0.5) * math.pow(10.0, rnd.nextInt(12).toDouble)
      CovSuffStatsAggregator.fixHalfUp(v) shouldBe ref(v)
      // values engineered near half boundaries
      val h = math.floor(v) + 0.5
      CovSuffStatsAggregator.fixHalfUp(h) shouldBe ref(h)
      CovSuffStatsAggregator.fixHalfUp(math.nextAfter(h, Double.NegativeInfinity)) shouldBe
        ref(math.nextAfter(h, Double.NegativeInfinity))
      CovSuffStatsAggregator.fixHalfUp(math.nextAfter(h, Double.PositiveInfinity)) shouldBe
        ref(math.nextAfter(h, Double.PositiveInfinity))
    }
  }

  test("fixHalfUpDouble matches Spark round(x, 0) on adversarial, random and non-finite doubles") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val adversarial = Seq(
      0.5, -0.5, 2.5, -2.5, -0.3, -0.8, // negatives: no -0.0 output
      0.49999999999999994, -0.49999999999999994,
      4503599627370495.5, 4.503599627370496e15, 1e300, -1e300,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, 0.0, -0.0)
    val randoms = (1 to 5000).flatMap { _ =>
      val v = (rnd.nextDouble() - 0.5) * math.pow(10.0, rnd.nextInt(10).toDouble)
      val h = math.floor(v) + 0.5
      Seq(v, h, math.nextAfter(h, Double.NegativeInfinity),
        math.nextAfter(h, Double.PositiveInfinity))
    }
    val vals = adversarial ++ randoms
    val rows = vals.toDF("v")
      .select(round(col("v"), 0).as("spark"),
        graft.functions.VectorExpressions.fixedRound(col("v")).as("kernel"))
      .collect()
    rows.zip(vals).foreach { case (r, v) =>
      val (s, k) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToLongBits(s) ==
        java.lang.Double.doubleToLongBits(k),
        s"fixedRound($v) = $k, Spark round = $s")
    }
  }

  test("fixHalfUp matches round()+cast(long) on non-finite and huge doubles") {
    CovSuffStatsAggregator.fixHalfUp(Double.NaN) shouldBe 0L
    CovSuffStatsAggregator.fixHalfUp(Double.PositiveInfinity) shouldBe Long.MaxValue
    CovSuffStatsAggregator.fixHalfUp(Double.NegativeInfinity) shouldBe Long.MinValue
    CovSuffStatsAggregator.fixHalfUp(1e300) shouldBe Long.MaxValue // saturate, not wrap
    CovSuffStatsAggregator.fixHalfUp(-1e300) shouldBe Long.MinValue
    CovSuffStatsAggregator.fixHalfUp(9.3e18) shouldBe Long.MaxValue
  }

  test("kernel tokenization matches the Spark expression on edge whitespace") {
    import spark.implicits._
    // tab/newline-edged and multi-space texts: the kernels must produce
    // exactly what split(trim(text), "\s+")-based expressions produce
    val texts = Seq("a b c d", "\ta b c", "a b c\n", "  a b c  ", "", " ",
      "\t", "a b c d", "x  y\tz w")
    val df = texts.toDF("text")
    val viaKernel = df.select(
      graft.functions.VectorExpressions.wordShingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    val sz = org.apache.spark.sql.functions.size _ // scalatest shadows `size`
    val toks = split(trim(col("text")), "\\s+")
    val viaExpr = df.select(
      when(sz(toks) >= 3,
        array_distinct(transform(
          sequence(lit(1), sz(toks) - lit(2)),
          i => concat_ws(" ", slice(toks, i, lit(3))))))
        .otherwise(array().cast("array<string>")).as("sh"))
      .collect().map(_.getSeq[String](0))
    viaKernel.zip(viaExpr).zip(texts).foreach { case ((k, e), t) =>
      assert(k == e, s"tokenization diverged for ${t.replace("\t", "\\t")}: $k vs $e")
    }
  }

  test("l2_sq is NULL on ragged pairs like the zip_with form") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 1.0)), (Seq(1.0, 2.0), Seq(1.0)))
      .toDF("a", "b")
    val got = df.select(
      graft.functions.VectorExpressions.l2Sq(col("a"), col("b")).as("d"))
      .collect()
    got(0).getDouble(0) shouldBe 1.0
    got(1).isNullAt(0) shouldBe true
  }

  test("aggregated covariance equals the exploded formulation, ragged input included") {
    val scale = 7
    val f = math.pow(10.0, scale.toDouble)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data: Seq[Seq[Double]] =
      (1 to 60).map(_ => Seq.fill(1 + rnd.nextInt(5))(rnd.nextGaussian() * 3))
    val df = data.toDF("emb").repartition(5) // multi-partition: exercises merge
    // the pre-rewrite double-posexplode formulation, verbatim
    val v = col("emb").cast("array<double>")
    val xi = df.select(posexplode(v).as(Seq("i", "xi")), v.as("v"))
    val expected = xi
      .select(col("i"), col("xi"), posexplode(col("v")).as(Seq("j", "xj")))
      .where(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(
        count(lit(1)).as("n"),
        sum(Det.toFixed(col("xi") * col("xj"), scale)).as("sxy"),
        sum(Det.toFixed(col("xi"), scale)).as("sx"),
        sum(Det.toFixed(col("xj"), scale)).as("sy"))
      .withColumn("cov",
        (col("sxy").cast("double") / lit(f) / col("n").cast("double"))
          - (col("sx").cast("double") / lit(f) / col("n").cast("double"))
          * (col("sy").cast("double") / lit(f) / col("n").cast("double")))
      .select(col("i"), col("j"), col("n"), col("cov"))
      .orderBy(col("i"), col("j"))
      .collect()
    val got = Similarity.covarianceUpperTriangle(df, "emb", scale)
      .orderBy(col("i"), col("j"))
      .collect()
    got.length shouldBe expected.length
    got.zip(expected).foreach { case (g, e) =>
      g.getInt(0) shouldBe e.getInt(0)
      g.getInt(1) shouldBe e.getInt(1)
      g.getLong(2) shouldBe e.getLong(2)
      // bit-identical, not approximately equal
      java.lang.Double.doubleToLongBits(g.getDouble(3)) shouldBe
        java.lang.Double.doubleToLongBits(e.getDouble(3))
    }
  }
}
