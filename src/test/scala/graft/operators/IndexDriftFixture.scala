package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared drifted-ingest synthesis for the index-health / rebuild /
  * streaming-rebuild specs: the fixture embeddings are near-isotropic,
  * so a distribution-shifted batch is SYNTHESIZED as the worst-case
  * new-content increment — a tight cluster around a direction orthogonal
  * to every frozen centroid (Gram–Schmidt over the read-back quantizer;
  * model-sized driver math). By construction its assignment fit is
  * ≤ ~0.1 while the corpus's own fit is the max-of-nCells
  * random-cosine statistic (≈ 0.18 mean), so the drift trip is
  * fixture-independent — exactly the regime where the frozen index also
  * loses recall (the whole batch piles into one foreign cell and the
  * hot-cell cap sub-splits it). */
object IndexDriftFixture {

  /** A unit vector orthogonal to every centroid of the index at `dir`. */
  def orthoDirection(spark: SparkSession, dir: String): Array[Float] = {
    val cents = Similarity.readIvfCentroids(spark, dir)
      .map(_.map(_.toDouble))
    val d = cents.head.length
    val basis = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => a(i) * b(i)).sum
    cents.foreach { c0 =>
      val c = c0.clone()
      basis.foreach { b =>
        val p = dot(c, b); c.indices.foreach(i => c(i) -= p * b(i))
      }
      val n = math.sqrt(dot(c, c))
      if (n > 1e-9) basis += c.map(_ / n)
    }
    val u = Array.fill(d)(1.0)
    basis.foreach { b =>
      val p = dot(u, b); u.indices.foreach(i => u(i) -= p * b(i))
    }
    val n = math.sqrt(dot(u, u))
    u.map(x => (x / n).toFloat)
  }

  /** The drifted ingest batch: u + 0.1·(seed-row vector) — a tight
    * cluster (pairwise cos ≈ 0.99) whose fit to the frozen quantizer is
    * ≤ ~0.1 by orthogonality. Ids offset past the corpus; keeps any
    * extra columns of `seedRows` (e.g. label). */
  def driftedDelta(spark: SparkSession, dir: String,
      seedRows: DataFrame): DataFrame = {
    val u = orthoDirection(spark, dir)
    val uCol = typedLit(u.toSeq)
    val extra = seedRows.columns.filterNot(c =>
      c == "vec_id" || c == "embedding").map(col)
    seedRows.select(Seq(
      (col("vec_id") + lit(10000000L)).as("vec_id"),
      zip_with(uCol, col("embedding"), (a, b) => a + lit(0.1f) * b)
        .as("embedding")) ++ extra: _*)
  }
}
