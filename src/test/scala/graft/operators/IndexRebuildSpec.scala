package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The atomic-rebuild contract (VERDICT r11 #1): rebuildIvfIndex
  * re-trains the quantizer over everything the index holds and swaps the
  * new generation live with ONE atomic pointer move —
  *  - a crash at the swap failpoint leaves the OLD generation fully
  *    readable (centroids, incremental serving, fold) and a retry
  *    completes;
  *  - the rebuilt index serves identically to a fresh batch build at
  *    the re-trained quantizer (the certified ann_index_rebuild row
  *    pins this against DuckDB; here the pure-operator equivalence);
  *  - post-rebuild folds land in the new generation and replay
  *    idempotence (`_batch_id` dynamic overwrite) survives the swap;
  *  - re-training via the OPERATOR recovers the recall the frozen index
  *    lost to a drifted ingest (IndexHealthSpec's fixture assertion
  *    promoted to the production path).
  */
class IndexRebuildSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf)
  private def old = emb.where(col("vec_id") % 5 =!= 0)
  private def delta = emb.where(col("vec_id") % 5 === 0)
    .select(col("vec_id"), col("embedding"))

  private def freshIndex(nCells: Int = 8): String = {
    val dir = graft.util.Scratch.dir("graft_rebuild_spec_")
    Similarity.writeIvfIndex(old, dir, nCells = nCells, seed = 42L)
    dir
  }

  private def edgeRows(df: DataFrame): Seq[(Long, Int, Long, Double)] =
    df.select(col("qid"), col("rank"), col("neighbor_id"), col("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq

  test("crash at the swap failpoint leaves the old generation live; " +
      "the retry completes and swaps") {
    val dir = freshIndex()
    val before = Similarity.readIvfCentroids(spark, dir)
    val boom = intercept[RuntimeException] {
      Similarity.rebuildIvfIndex(spark, dir,
        beforeSwap = () => throw new RuntimeException("boom-at-swap"))
    }
    boom.getMessage shouldBe "boom-at-swap"
    // pointer never moved: every reader still serves the old generation
    Similarity.currentGen(dir) shouldBe -1L
    Similarity.readIvfCentroids(spark, dir).map(_.toSeq) shouldBe
      before.map(_.toSeq)
    // the old generation still SERVES: incremental kNN over it works
    val served = Similarity.incrementalKnnJoin(
      delta.limit(20), dir, k = 2, nProbe = 2, maxCellSize = 16)
    served.count() should be > 0L
    // retry from the crash: completes, swaps, and the new generation is
    // the one trained on the same contents
    Similarity.rebuildIvfIndex(spark, dir)
    Similarity.currentGen(dir) shouldBe 0L
  }

  test("rebuilt index serves identically to a fresh batch build at the " +
      "re-trained quantizer") {
    val dir = freshIndex(nCells = 8)
    Similarity.appendIvfDelta(delta, dir)
    Similarity.rebuildIvfIndex(spark, dir)
    val union = old.select(col("vec_id"), col("embedding")).unionByName(delta)
    val sample = union.where(col("vec_id") % 7 === 0)
    val viaRebuilt = Similarity.incrementalKnnJoin(
      sample, dir, k = 3, nProbe = 3, maxCellSize = 16)
    val cmFresh = Similarity.readIvfCentroids(spark, dir)
    val fresh = Similarity.knnJoinIvfWithCentroids(
      union, cmFresh, k = 3, nProbe = 3, maxCellSize = 16,
      probeIds = Some(sample.select(col("vec_id"))))
    edgeRows(viaRebuilt) shouldBe edgeRows(fresh)
    // and the re-trained quantizer equals training on the union directly
    val cmDirect = Similarity.sampleCentroids(
      union, "vec_id", "embedding", 8, 42L, refineIters = 0)
    cmFresh.map(_.toSeq) shouldBe cmDirect.map(_.toSeq)
  }

  test("post-rebuild folds land in the new generation and stay " +
      "replay-idempotent") {
    val dir = freshIndex()
    Similarity.rebuildIvfIndex(spark, dir)
    val gen = Similarity.currentGen(dir)
    gen shouldBe 0L
    val batch = delta.limit(50)
    Similarity.appendIvfDelta(batch, dir, batchId = Some(7L))
    Similarity.appendIvfDelta(batch, dir, batchId = Some(7L)) // replay
    val cells = spark.read.parquet(s"$dir/gen_$gen/cells")
    cells.where(col("_batch_id") === 7L).count() shouldBe batch.count()
    // the generation-resolved reader sees them too
    Similarity.readIvfCentroids(spark, dir).length shouldBe 8
  }

  test("operator-path rebuild recovers the recall a frozen index lost " +
      "to a drifted ingest") {
    val k = 3
    val cap = 16
    val dir = freshIndex()
    // the IndexHealthSpec drifted batch: a tight cluster orthogonal to
    // every frozen centroid (worst-case new content)
    val sh = IndexDriftFixture.driftedDelta(spark, dir,
        emb.where(col("vec_id") % 5 === 0))
      .select(col("vec_id"), col("embedding")).persist()
    val union = old.select(col("vec_id"), col("embedding")).unionByName(sh)
    val exact = Similarity.bruteForceTopK(
        union, sh.select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        k = k)
      .select(col("qid"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: DataFrame): Double = {
      val got = df.select(col("qid"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & exact).size.toDouble / exact.size
    }
    // frozen path: serve the drifted batch through the un-rebuilt index
    val rFrozen = recall(Similarity.incrementalKnnJoin(
      sh, dir, k = k, nProbe = 2, maxCellSize = cap))
    // production path: fold, gauge, REBUILD VIA THE OPERATOR, re-serve
    Similarity.appendIvfDelta(sh, dir)
    val verdict = Similarity.ivfIndexHealth(sh, dir, maxCellSize = cap).head()
    verdict.getAs[Boolean]("rebuild") shouldBe true
    Similarity.rebuildIvfIndex(spark, dir, nCells = 16, refineIters = 2)
    val rRebuilt = recall(Similarity.incrementalKnnJoin(
      sh, dir, k = k, nProbe = 2, maxCellSize = cap))
    withClue(s"frozen=$rFrozen rebuilt=$rRebuilt: ") {
      rRebuilt should be > rFrozen
    }
    sh.unpersist()
  }
}
