package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import graft.util.Det

/** Logistic regression by full-batch gradient descent as a fixed-point
  * dataflow — the third member of the oracle-exact iterative-ML family
  * (EM.fitFixedPoint, Graph.pageRank): per-point gradient contributions
  * `(sigmoid(w·x) − y)·x_j` are integerized (Det.toFixed) so the 1-ulp
  * exp() wobble between libm implementations dies in the rounding, the
  * per-iteration reduction is an exact BIGINT sum (independent of
  * partitioning), and the weight update is pure IEEE arithmetic on
  * identical inputs — bit-identical across engines, so a 5-iteration
  * FIT hashes against a chained-CTE DuckDB oracle.
  *
  * Scale shape: one aggregation job per iteration over the cached
  * feature projection (k+1 BIGINT partial sums per task — map-side
  * combine, O(k) shuffle bytes per partition); weights ride a broadcast
  * 1-row relation so the generated code is iteration-stable (codegen
  * cache, see NOTES.md).
  */
object LogReg {

  /** Fit weights [bias, w_1..w_k] with `iters` full-batch GD steps at
    * learning rate `lr`, starting from zeros. `featCols` must be DOUBLE
    * columns of `df`; `labelCol` must be 0.0/1.0. */
  def fitFixedPoint(df: DataFrame, featCols: Seq[String], labelCol: String,
      iters: Int, lr: Double, scale: Int = 9): Array[Double] = {
    val f = math.pow(10.0, scale.toDouble)
    val k = featCols.size
    val data = df.select(
      (featCols.zipWithIndex.map { case (c, i) =>
        col(c).cast("double").as(s"x${i + 1}") } :+
        col(labelCol).cast("double").as("y")): _*)
    data.cache()
    try {
      val n = data.count().toDouble
      var w = new Array[Double](k + 1) // w(0) = bias
      var t = 0
      while (t < iters) {
        val grads = gradientAggregate(data, w, scale)
        val next = new Array[Double](k + 1)
        var j = 0
        while (j <= k) {
          // identical op order to the oracle: w - lr * (g / 10^s / n)
          next(j) = w(j) - lr * (grads(j).toDouble / f / n)
          j += 1
        }
        w = next
        t += 1
      }
      w
    } finally { data.unpersist(); () }
  }

  /** One GD step: Row of k+1 BIGINTs — exact sums of the integerized
    * per-point gradient components [∂/∂b, ∂/∂w_1, ..]. */
  private def gradientAggregate(data: DataFrame, w: Array[Double],
      scale: Int): Array[Long] = {
    val k = w.length - 1
    val schema = StructType(StructField("b", DoubleType, nullable = false) +:
      (1 to k).map(j => StructField(s"w$j", DoubleType, nullable = false)))
    val params = data.sparkSession.createDataFrame(
      java.util.Collections.singletonList(Row.fromSeq(w.toSeq)), schema)
    val z = (1 to k).foldLeft(col("b")) { (acc, j) =>
      acc + col(s"x$j") * col(s"w$j") }
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    val aggs = (sum(Det.toFixed(p - col("y"), scale)).as("gb") +:
      (1 to k).map(j =>
        sum(Det.toFixed((p - col("y")) * col(s"x$j"), scale)).as(s"g$j")))
    val row = data.crossJoin(broadcast(params)).agg(aggs.head, aggs.tail: _*).head()
    Array.tabulate(k + 1)(row.getLong)
  }

  /** Score `df` under fixed weights: adds probability + predicted label
    * columns (pure IEEE on identical inputs — deterministic given the
    * fixed-point-derived weights). */
  def score(df: DataFrame, featCols: Seq[String], w: Array[Double]): DataFrame = {
    val z = featCols.zipWithIndex.foldLeft(lit(w(0))) { case (acc, (c, i)) =>
      acc + col(c).cast("double") * lit(w(i + 1)) }
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    df.withColumn("prob", p).withColumn("pred",
      when(p >= 0.5, 1.0).otherwise(0.0))
  }
}
