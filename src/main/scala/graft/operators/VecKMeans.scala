package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.{cosineSim, cosineSimFD}
import graft.util.Det

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

  /** ORACLE-EXACT spherical k-means — the em_gmm_fixed recipe applied to
    * Lloyd's: every per-iteration quantity either is an exact integer
    * (counts, BIGINT sums of integerized coordinates) or derives from
    * exact integers by deterministic IEEE ops (ratio mean, scale-0
    * round), so `iters` full Lloyd rounds are bit-identical across
    * engines and partitionings and have a chained-CTE DuckDB twin.
    *
    * Per iteration: (1) assignment is row-local — argmax cosine over the
    * k centroid literals via the native float×double kernel
    * ([[graft.functions.VectorExpressions.CosineSimFD]]; computed
    * centroids live on a 10^-scale decimal grid that float cannot
    * represent, so the literals must stay double); (2) the update is ONE
    * hash aggregate keyed (cell, dim) — k·d result rows to the driver
    * regardless of corpus size, like the EM sufficient-statistics pass.
    * Init = Knuth-hash corpus sample (SQL-expressible, unlike xxhash64).
    *
    * Contract: every cell must stay non-empty (true for sampled init on
    * the fixtures; an empty cell would keep its stale centroid here but
    * vanish from the SQL twin's state).
    *
    * Returns the final update statistics: (cell, pos, n, m) — centroid
    * coordinate `m` per (cell, dimension) with the cell's member count. */
  def fitFixedPoint(
      corpus: DataFrame, vecCol: String, k: Int, iters: Int,
      seed: Long = 42L, idCol: String = "vec_id", scale: Int = 7): DataFrame = {
    val f = math.pow(10.0, scale.toDouble)
    var cent: Array[Array[Double]] = corpus
      .select(col(idCol), col(vecCol))
      .orderBy(((col(idCol) * lit(2654435761L) + lit(seed)) % lit(4294967296L)).asc,
        col(idCol))
      .limit(k)
      .orderBy(col(idCol))
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    var result: DataFrame = null
    for (t <- 1 to iters) {
      val best = array_max(array(cent.zipWithIndex.map { case (c, i) =>
        struct(cosineSimFD(col(vecCol), typedlit(c.toSeq)).as("cos"),
          lit(-i).as("negCell"))
      }: _*))
      val asg = corpus.select(col(vecCol).as("v"),
        (-best.getField("negCell")).as("cell"))
      result = asg
        .select(col("cell"),
          posexplode(col("v").cast("array<double>")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(count(lit(1)).as("n"), sum(Det.toFixed(col("x"), scale)).as("sx"))
        .select(col("cell"), col("pos"), col("n"),
          Det.fixed(col("sx").cast("double") / lit(f) / col("n").cast("double"),
            scale).as("m"))
      if (t < iters) {
        val next = cent.map(_.clone()) // empty cells would keep position
        result.collect().foreach { r =>
          next(r.getAs[Int]("cell"))(r.getAs[Int]("pos")) = r.getAs[Double]("m")
        }
        cent = next
      }
    }
    result
  }
}
