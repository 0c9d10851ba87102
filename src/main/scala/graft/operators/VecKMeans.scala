package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.cosineSim

/** Spherical k-means (cosine-similarity Lloyd's) over an embedding
  * column — the coarse-quantizer refinement for [[Similarity.ivfTopK]].
  * Same architecture as the EM fit: a driver loop where each iteration is
  * distributed aggregation (assignment is k native-codegen cosines per
  * row; the centroid update reduces to per-(cell, dimension) means via
  * posexplode — k*dim result rows regardless of corpus size). Seeded
  * sample init, deterministic throughout.
  */
object VecKMeans {

  final case class Result(
      centroids: Array[Array[Float]], inertia: Double, iterations: Int)

  /** Nearest-centroid cell id via argmax cosine (ties break to the lower
    * cell id: struct ordering compares cos first, then -cell). */
  private def cellExpr(vec: Column, centroids: Array[Array[Float]]): Column =
    array_max(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(
        cosineSim(vec, typedlit(c.toSeq)).as("cos"),
        lit(-i).as("negCell"))
    }: _*))

  def fit(
      corpus: DataFrame, vecCol: String,
      k: Int, maxIter: Int, seed: Long = 42L,
      idCol: String = "vec_id"): Result = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    var centroids: Array[Array[Float]] = corpus
      .select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol) + lit(seed)))
      .limit(k)
      .orderBy(col(idCol))
      .collect().map(_.getSeq[Float](1).toArray)

    var inertia = Double.NaN
    var it = 0
    while (it < maxIter) {
      val best = cellExpr(col(vecCol), centroids)
      val assigned = corpus
        .select(
          col(vecCol).as("v"),
          (-best.getField("negCell")).as("cell"),
          best.getField("cos").as("cos"))
        .persist()
      try {
        // per-(cell, dim) means -> k*dim rows to the driver
        val sums = assigned
          .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy(col("cell"), col("pos"))
          .agg(avg(col("x")).as("m"))
          .collect()
        val next = Array.tabulate(k)(i => centroids(i).clone()) // empty cells keep position
        sums.foreach { r =>
          next(r.getAs[Int]("cell"))(r.getAs[Int]("pos")) = r.getAs[Double]("m").toFloat
        }
        inertia = assigned.agg(sum(lit(1.0) - col("cos"))).head().getDouble(0)
        centroids = next
      } finally assigned.unpersist()
      it += 1
    }
    Result(centroids, inertia, it)
  }
}
