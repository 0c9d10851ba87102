package graft.gmm

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Output of one sufficient-statistics pass under a fixed model. */
final case class GmmSuffStats(
    sumGamma: Array[Double],
    sumGammaX: Array[Double],
    sumGammaX2: Array[Double],
    sumMix: Double,
    loglik: Double)

/** Typed single-pass EM sufficient-statistics aggregator — the
  * `Aggregator`/`udaf` form of the pure-expression aggregate in
  * [[EM]] (SURVEY.md §7.5 lists it as the alternative when expression
  * width becomes a problem at large K).
  *
  * Accumulates FIXED-POINT integer units: each per-row term is rounded
  * half-up (away from zero, matching Spark `round` and DuckDB `ROUND`)
  * to `scale` decimals and added as a Long. Integer addition is exact and
  * commutative, so the result is independent of partition count and merge
  * order — reproducible across runs, cluster layouts, and engines, which
  * no double accumulation guarantees (see graft.util.Det).
  *
  * Per-row arithmetic mirrors [[Gaussian.pdf]] / the DuckDB oracle SQL
  * operation-for-operation (Math.pow square, precomputed 2*sigma^2 and
  * sqrt(2*pi*sigma^2) constants, left-to-right mixture sum, -Infinity
  * log guard from the reference's Main.scala:112) so all three paths are
  * bit-identical before rounding.
  */
final class GmmSuffStatsAggregator(
    weights: Array[Double], means: Array[Double], variances: Array[Double],
    scale: Int = 6)
  extends Aggregator[Double, Array[Long], GmmSuffStats] with Serializable {

  private val k = weights.length
  private val f = math.pow(10.0, scale.toDouble)
  private val twoVar = variances.map(2.0 * _)
  private val sqrtNorm = variances.map(v => math.sqrt(2.0 * math.Pi * v))

  private def halfUp(v: Double): Long =
    (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong

  // buffer layout: [A_0..A_{k-1} | B_0.. | C_0.. | D | loglik]
  override def zero: Array[Long] = new Array[Long](3 * k + 2)

  override def reduce(buf: Array[Long], x: Double): Array[Long] = {
    val wp = new Array[Double](k)
    var mix = 0.0
    var j = 0
    while (j < k) {
      wp(j) = weights(j) *
        (math.exp(-math.pow(x - means(j), 2) / twoVar(j)) / sqrtNorm(j))
      mix += wp(j)
      j += 1
    }
    j = 0
    while (j < k) {
      val g = if (mix > 0) wp(j) / mix else 1.0 / k
      buf(j) += halfUp(g * f)
      buf(k + j) += halfUp(g * x * f)
      buf(2 * k + j) += halfUp(g * x * x * f)
      j += 1
    }
    buf(3 * k) += halfUp(mix * f)
    val ll = math.log(mix)
    if (ll != Double.NegativeInfinity) buf(3 * k + 1) += halfUp(ll * f)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): GmmSuffStats =
    GmmSuffStats(
      Array.tabulate(k)(j => buf(j) / f),
      Array.tabulate(k)(j => buf(k + j) / f),
      Array.tabulate(k)(j => buf(2 * k + j) / f),
      buf(3 * k) / f,
      buf(3 * k + 1) / f)

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[GmmSuffStats] = Encoders.product[GmmSuffStats]
}
