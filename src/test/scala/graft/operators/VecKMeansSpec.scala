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

  test("fitFixedPoint: valid partition stats, coherent means, partition-stable") {
    import org.apache.spark.sql.functions.col
    val out = VecKMeans.fitFixedPoint(emb, "embedding", k = 8, iters = 3)
      .orderBy("cell", "pos")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // every cell non-empty with all 64 dims; counts sum to the corpus
    val cells = out.map(_._1).distinct.sorted
    cells shouldBe (0 until 8)
    out.groupBy(_._1).values.foreach(_.length shouldBe 64)
    out.groupBy(_._1).values.map(_.head._3).sum shouldBe emb.count()
    // n constant within a cell
    out.groupBy(_._1).values.foreach(rows => rows.map(_._3).distinct.length shouldBe 1)
    // means live inside the coordinate range of the data
    val mn = emb.agg(org.apache.spark.sql.functions.min(
      org.apache.spark.sql.functions.array_min(col("embedding")))).head().getFloat(0)
    val mx = emb.agg(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.array_max(col("embedding")))).head().getFloat(0)
    out.foreach { case (_, _, _, m) =>
      m should be >= mn.toDouble - 1e-6
      m should be <= mx.toDouble + 1e-6
    }
    // integerized rounds: bit-identical under repartitioning
    val again = VecKMeans.fitFixedPoint(emb.repartition(13), "embedding", k = 8, iters = 3)
      .orderBy("cell", "pos")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    again.toSeq shouldBe out.toSeq
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
