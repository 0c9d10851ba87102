package graft.gmm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Expectation-Maximization for a 1-D Gaussian mixture, Spark-SQL-first.
  *
  * Design point (SURVEY.md §4.3): the reference
  * (Krosent/ema-bigdata `Main.scala:59-92`) runs ~17 Spark jobs per EM
  * iteration — a separate full pass for the gamma denominator, five more
  * per component for the M-step, one for the log-likelihood. Here each
  * iteration is ONE whole-stage-codegen'd aggregation computing all
  * sufficient statistics (sum gamma_k, sum gamma_k*x, sum gamma_k*x^2 for
  * every k) plus the log-likelihood in a single pass. No intermediate RDD,
  * no persist/unpersist churn, no zip. At 100 TB this is the difference
  * between 1 scan and 17 scans per iteration; the aggregation is a
  * partial+final hash-agg with a single-row result, so shuffle volume is
  * K*3+2 doubles regardless of data size.
  *
  * Two semantic variants (SURVEY.md §7.4):
  *  - Textbook: per-point-normalized responsibilities, monotone
  *    log-likelihood, |delta|-tolerance or fixed-iteration stop.
  *  - RefCompat: the reference's exact arithmetic — deviant density
  *    (`Main.scala:106-107`), responsibilities normalized by a GLOBAL
  *    dataset-wide denominator (`Main.scala:128-142`), `-Infinity`
  *    log filtering (`Main.scala:112`), and the inverted
  *    `continue while (delta > 80)` stop rule (`Main.scala:89`).
  *    Even the global denominator folds into the same single pass: with
  *    A_k = sum w_k*pdf_k(x), B_k = sum w_k*pdf_k(x)*x,
  *    C_k = sum w_k*pdf_k(x)*x^2 and D = sum mix(x), the reference's
  *    updates are phi_k = A_k/(D*N), mu_k = B_k/A_k,
  *    sigma2_k = (C_k - 2*mu_k*B_k + mu_k^2*A_k)/A_k.
  *
  * Unseeded init (`Main.scala:95`) is NOT replicated — init is either a
  * deterministic moment-spread or an explicitly seeded sample
  * (SURVEY.md §7.4).
  */
object EM {

  sealed trait Variant
  case object Textbook extends Variant
  case object RefCompat extends Variant

  sealed trait Init
  /** Deterministic: mu_j = mean + stddev * spread_j, variance_j = var(X),
    * w_j = 1/K. Scale-free and reproducible across engines/partitionings. */
  case object SpreadInit extends Init
  /** Seeded uniform sample of K datapoints as initial means (the
    * reference's `takeSample`, `Main.scala:94-96`, made deterministic). */
  final case class SampleInit(seed: Long) extends Init

  final case class FitResult(model: GmmModel, logLikelihood: Double, iterations: Int)

  /** Variance floor to keep components from collapsing on duplicated points. */
  private val VarFloor = 1e-9

  def fit(
      df: DataFrame,
      xCol: String,
      k: Int,
      maxIter: Int,
      tol: Option[Double] = None,
      variant: Variant = Textbook,
      init: Init = SpreadInit): FitResult = {

    val x = col(xCol).cast("double")
    val data = df.select(x.as("x")).where(col("x").isNotNull)
    // One pass for dataset moments (reference does count/mean/variance as
    // three separate jobs, Main.scala:61-64).
    val m0 = data.agg(
      count(lit(1)).as("n"), avg(col("x")).as("mean"),
      var_pop(col("x")).as("var")).head()
    val n = m0.getLong(0)
    require(n > 0, s"EM.fit: no non-null rows in $xCol")
    val dsMean = m0.getDouble(1)
    val dsVar = math.max(m0.getDouble(2), VarFloor)

    val means0: Array[Double] = init match {
      case SpreadInit =>
        // k quantile-ish spread points in [-1.5, 1.5] sigma
        Array.tabulate(k)(j => dsMean + math.sqrt(dsVar) * (-1.5 + 3.0 * (j + 0.5) / k))
      case SampleInit(seed) =>
        // Seeded exact-K sample; deterministic given fixed seed AND input
        // partitioning. K rows only — the sort is a top-K (TakeOrdered),
        // not a full sort, so this scales.
        data.select(col("x")).orderBy(rand(seed)).limit(k)
          .collect().map(_.getDouble(0)).sorted
    }
    var model = GmmModel(Array.fill(k)(1.0 / k), means0, Array.fill(k)(dsVar))

    // Cache the single projected column across iterations (reference
    // persists the raw RDD, Main.scala:41).
    data.cache()
    try fitLoop(data, n, model, maxIter, tol, variant)
    finally data.unpersist()
  }

  private def fitLoop(
      data: DataFrame, n: Long, init: GmmModel,
      maxIter: Int, tol: Option[Double], variant: Variant): FitResult = {
    var model = init
    var lnpPrev = Double.NaN
    var lnp = Double.NaN
    var iters = 0
    var stop = false

    while (iters < maxIter && !stop) {
      val row = iterationAggregate(data, model, variant)
      val k = model.k
      // layout: [A_1.., B_1.., C_1.., D, loglik]
      def d(i: Int): Double = if (row.isNullAt(i)) 0.0 else row.getDouble(i)
      val A = Array.tabulate(k)(j => d(3 * j))
      val B = Array.tabulate(k)(j => d(3 * j + 1))
      val C = Array.tabulate(k)(j => d(3 * j + 2))
      val D = d(3 * k)
      val ll = if (row.isNullAt(3 * k + 1)) Double.NegativeInfinity else row.getDouble(3 * k + 1)

      lnpPrev = lnp
      lnp = ll

      // Convergence check BEFORE applying this iteration's update mirrors
      // the reference's post-update test (see scaladoc): the model returned
      // is the one whose log-likelihood failed to improve enough.
      val converged = variant match {
        case RefCompat => !lnpPrev.isNaN && !((lnp - lnpPrev) > 80.0)
        case Textbook  => tol.exists(t => !lnpPrev.isNaN && math.abs(lnp - lnpPrev) < t)
      }
      if (converged) { stop = true }
      else {
        val weights = new Array[Double](k)
        val means = new Array[Double](k)
        val vars = new Array[Double](k)
        var j = 0
        while (j < k) {
          val aj = A(j)
          variant match {
            case Textbook =>
              // A_j here is sum of per-point-normalized gamma_j
              weights(j) = aj / n
              means(j) = if (aj > 0) B(j) / aj else model.means(j)
              vars(j) = if (aj > 0) math.max(C(j) / aj - means(j) * means(j), VarFloor)
                        else model.variances(j)
            case RefCompat =>
              // Reference updates (Main.scala:177-210) with the global
              // denominator D: gamma_j(x) = w_j*pdf_j(x)/D.
              weights(j) = if (D != 0) aj / D / n else model.weights(j)
              means(j) = if (aj != 0) B(j) / aj else model.means(j)
              vars(j) = if (aj != 0) (C(j) - 2 * means(j) * B(j) + means(j) * means(j) * aj) / aj
                        else model.variances(j)
          }
          j += 1
        }
        model = GmmModel(weights, means, vars)
        iters += 1
      }
    }
    FitResult(model, lnp, iters)
  }

  /** Fixed-point EM: the same one-aggregation-per-iteration dataflow as
    * [[fit]], but every per-point sufficient-statistic contribution is
    * integerized to `scale` decimals BEFORE the sum (exact BIGINT
    * accumulation, see [[graft.util.Det]]), and every parameter update is
    * a ratio/product of those exact integers — so the ENTIRE multi-
    * iteration fit is bit-identical across engines and partitionings,
    * which makes the iterative algorithm DuckDB-oracle-hashable
    * (chained-CTE oracle: one pair of CTEs per iteration). Runs a fixed
    * `iters` iterations from explicit `init` parameters (data-derived
    * init would reintroduce order-dependent float moments).
    *
    * The quantization perturbs each gamma by ≤ 5e-7 — far below the
    * statistical noise of the fit — while buying exact reproducibility;
    * the native-double [[fit]] remains the throughput path. */
  def fitFixedPoint(
      df: DataFrame, xCol: String, init: GmmModel,
      iters: Int, scale: Int = 6): GmmModel = {
    val f = math.pow(10.0, scale.toDouble)
    val data = df.select(col(xCol).cast("double").as("x"))
      .where(col("x").isNotNull)
    data.cache()
    try {
      val nD = data.count().toDouble
      var model = init
      var t = 0
      while (t < iters) {
        val row = fixedIterationAggregate(data, model, scale)
        val k = model.k
        val weights = new Array[Double](k)
        val means = new Array[Double](k)
        val vars = new Array[Double](k)
        var j = 0
        while (j < k) {
          val a = row.getLong(3 * j)
          val b = row.getLong(3 * j + 1)
          val c = row.getLong(3 * j + 2)
          if (a > 0) {
            weights(j) = a.toDouble / f / nD
            means(j) = b.toDouble / a.toDouble
            vars(j) = math.max(
              c.toDouble / a.toDouble - means(j) * means(j), VarFloor)
          } else {
            weights(j) = model.weights(j)
            means(j) = model.means(j)
            vars(j) = model.variances(j)
          }
          j += 1
        }
        model = GmmModel(weights, means, vars)
        t += 1
      }
      model
    } finally data.unpersist()
  }

  /** One fixed-point iteration: Row of 3k longs
    * [toFixed-sums of gamma_j, gamma_j*x, gamma_j*x^2]. Params ride a
    * broadcast relation (codegen-stable, see [[iterationAggregate]]). */
  private def fixedIterationAggregate(data: DataFrame, m: GmmModel, scale: Int): Row = {
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    import graft.util.Det
    val x = col("x")
    val k = m.k
    val schema = StructType((0 until k).flatMap(j => Seq(
      StructField(s"w$j", DoubleType, nullable = false),
      StructField(s"mu$j", DoubleType, nullable = false),
      StructField(s"s2$j", DoubleType, nullable = false))))
    val paramsRow = Row.fromSeq(
      (0 until k).flatMap(j => Seq(m.weights(j), m.means(j), m.variances(j))))
    val params = data.sparkSession.createDataFrame(
      java.util.Collections.singletonList(paramsRow), schema)
    val joined = data.crossJoin(broadcast(params))
    val weighted = (0 until k).map(j =>
      col(s"w$j") * Gaussian.pdf(x, col(s"mu$j"), col(s"s2$j")))
    val mix = weighted.reduce(_ + _)
    val gammas = weighted.map(wj =>
      when(mix > lit(0.0), wj / mix).otherwise(lit(1.0 / k)))
    val aggs: Seq[Column] = gammas.flatMap(g => Seq(
      sum(Det.toFixed(g, scale)),
      sum(Det.toFixed(g * x, scale)),
      sum(Det.toFixed(g * x * x, scale))))
    joined.agg(aggs.head, aggs.tail: _*).head()
  }

  /** Builds and runs the ONE aggregation for an EM iteration.
    * Returns a single Row: [A_k, B_k, C_k per k] ++ [D, loglik].
    *
    * Model parameters are NOT literals: they ride a broadcast 1-row
    * LocalRelation cross-joined onto the data. Literal params would embed
    * the values in the generated Java source, recompiling the aggregate
    * stage every iteration (~0.5 s/iteration of Janino); as input columns
    * the generated source is identical across iterations and the codegen
    * cache serves it after the first. Arithmetic order matches the
    * literal form bit-for-bit (Gaussian column overloads).
    */
  private def iterationAggregate(data: DataFrame, m: GmmModel, variant: Variant): Row = {
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val x = col("x")
    val k = m.k
    val schema = StructType((0 until k).flatMap(j => Seq(
      StructField(s"w$j", DoubleType, nullable = false),
      StructField(s"mu$j", DoubleType, nullable = false),
      StructField(s"s2$j", DoubleType, nullable = false))))
    val paramsRow = Row.fromSeq(
      (0 until k).flatMap(j => Seq(m.weights(j), m.means(j), m.variances(j))))
    val params = data.sparkSession.createDataFrame(
      java.util.Collections.singletonList(paramsRow), schema)
    val joined = data.crossJoin(broadcast(params))
    val weighted: Seq[Column] = variant match {
      case Textbook  => (0 until k).map(j => col(s"w$j") * Gaussian.pdf(x, col(s"mu$j"), col(s"s2$j")))
      case RefCompat => (0 until k).map(j => col(s"w$j") * Gaussian.refPdf(x, col(s"mu$j"), col(s"s2$j")))
    }
    val mix = weighted.reduce(_ + _)
    val gammas: Seq[Column] = variant match {
      case Textbook =>
        // per-point normalization; guard against total underflow
        weighted.map(wj => when(mix > 0, wj / mix).otherwise(lit(1.0 / k)))
      case RefCompat =>
        // UN-normalized numerators; the global denominator D is aggregated
        // in the same pass and applied driver-side (it cancels in the
        // mean/variance ratios).
        weighted
    }
    val logMix = log(mix)
    // -Infinity guard from Main.scala:112 (log of an underflowed mixture).
    val llTerm = when(logMix =!= lit(Double.NegativeInfinity), logMix)
    val aggs: Seq[Column] =
      gammas.flatMap(g => Seq(sum(g), sum(g * x), sum(g * x * x))) ++
        Seq(sum(mix), sum(llTerm))
    joined.agg(aggs.head, aggs.tail: _*).head()
  }
}
