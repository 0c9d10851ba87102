package graft.gmm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Immutable 1-D GMM model state, threaded through the EM driver loop.
  * Replaces the reference's three mutable driver arrays
  * (Krosent/ema-bigdata `Main.scala:16-19`).
  */
case class GmmModel(
    weights: Array[Double],
    means: Array[Double],
    variances: Array[Double]) {
  require(weights.length == means.length && means.length == variances.length,
    "weights/means/variances must have equal length")

  def k: Int = weights.length

  /** Model as a query result: DataFrame(k INT, weight, mean, variance),
    * ordered by k — so EM output is a comparable table, not printed text
    * (the reference's only sink was println, `Main.scala:46-47`).
    */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until k).map(i => (i, weights(i), means(i), variances(i)))
      .toDF("k", "weight", "mean", "variance")
  }
}
