package graft.operators

import graft.{SparkSpec, Tables}

class VecKMeansSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf)

  test("inertia is non-increasing across Lloyd iterations") {
    val inertias = Seq(1, 2, 4, 6).map(i =>
      VecKMeans.fit(emb, "embedding", k = 8, maxIter = i).inertia)
    inertias.sliding(2).foreach { case Seq(a, b) =>
      b should be <= a + 1e-6
    }
  }

  test("deterministic: same seed reproduces identical centroids") {
    val a = VecKMeans.fit(emb, "embedding", k = 4, maxIter = 3, seed = 7L)
    val b = VecKMeans.fit(emb, "embedding", k = 4, maxIter = 3, seed = 7L)
    a.centroids.map(_.toSeq).toSeq shouldBe b.centroids.map(_.toSeq).toSeq
    a.centroids.length shouldBe 4
  }

  test("kmeans-refined IVF achieves reasonable recall vs brute force") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val q = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val refined = Similarity.ivfTopK(emb, q, k = 5, nCells = 16, nProbe = 8,
        refineIters = 3)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(refined).size.toDouble / exact.size
    withClue(s"recall=$recall") { recall should be >= 0.5 }
  }
}
