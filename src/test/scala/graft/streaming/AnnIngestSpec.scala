package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once contract of the streaming ANN ingest (VERDICT r10 #4):
  * a micro-batch replayed from ANY crash point — between the edge write
  * and the index fold, or after the fold but before the checkpoint
  * commit — converges to the same edges and the same index as a clean
  * run, with no double-appended rows. Plus the end-to-end equivalence:
  * the Trigger.AvailableNow stream writer produces the same final state
  * as driving the batches by hand.
  */
class AnnIngestSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf)
  private def old = emb.where(col("vec_id") % 5 =!= 0)
  private def batch0 = emb.where(col("vec_id") % 10 === 0)
    .select(col("vec_id"), col("embedding"))
  private def batch1 = emb.where(col("vec_id") % 10 === 5)
    .select(col("vec_id"), col("embedding"))

  private def freshIndex(): (String, String) = {
    val root = graft.util.Scratch.dir("graft_anningest_spec_")
    val idx = s"$root/index"
    Similarity.writeIvfIndex(old, idx, nCells = 8, seed = 42L)
    (idx, s"$root/edges")
  }

  private def proc(b: DataFrame, id: Long, idx: String, edges: String,
      afterEdges: () => Unit = () => ()): Unit =
    AnnIngest.processBatch(b, id, idx, edges,
      k = 3, nProbe = 3, maxCellSize = 16, afterEdges = afterEdges)

  private def edgeState(edges: String): Seq[(Int, Long, Int, Long, Double)] =
    spark.read.parquet(edges)
      .select(col("_batch_id").cast("int"), col("qid"), col("rank"),
        col("neighbor_id"), col("cos"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
      .sorted.toSeq

  private def indexState(idx: String): Seq[(Long, Int, Long)] =
    spark.read.parquet(s"${Similarity.indexRoot(idx)}/cells")
      .select(col("vec_id"), col("cell"), col("_batch_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sorted.toSeq

  private lazy val cleanState: (Seq[(Int, Long, Int, Long, Double)],
      Seq[(Long, Int, Long)]) = {
    val (idx, edges) = freshIndex()
    proc(batch0, 0L, idx, edges)
    proc(batch1, 1L, idx, edges)
    (edgeState(edges), indexState(idx))
  }

  test("crash between edge write and index fold: replaying the batch " +
      "converges to the clean-run state") {
    val (idx, edges) = freshIndex()
    proc(batch0, 0L, idx, edges)
    val boom = intercept[RuntimeException] {
      proc(batch1, 1L, idx, edges,
        afterEdges = () => throw new RuntimeException("boom-before-fold"))
    }
    boom.getMessage shouldBe "boom-before-fold"
    // batch 1's edges are on disk but its rows are NOT in the index yet
    indexState(idx).count(_._3 == 1L) shouldBe 0
    // resume: foreachBatch replays batch 1 from the checkpoint
    proc(batch1, 1L, idx, edges)
    edgeState(edges) shouldBe cleanState._1
    indexState(idx) shouldBe cleanState._2
  }

  test("crash after the fold but before the checkpoint commit: the " +
      "replay must not double-append or shift the edges") {
    val (idx, edges) = freshIndex()
    proc(batch0, 0L, idx, edges)
    proc(batch1, 1L, idx, edges) // completed, but 'uncommitted'
    proc(batch1, 1L, idx, edges) // the replay
    edgeState(edges) shouldBe cleanState._1
    indexState(idx) shouldBe cleanState._2
    // and a third replay is still a fixed point
    proc(batch1, 1L, idx, edges)
    indexState(idx) shouldBe cleanState._2
  }

  test("AvailableNow stream writer == hand-driven batches") {
    val (idx, edges) = freshIndex()
    val root = graft.util.Scratch.dir("graft_anningest_stream_")
    val in = s"$root/in"
    batch0.coalesce(1).write.mode("overwrite").parquet(in)
    StreamHarness.stampChunk(in, 0)
    batch1.coalesce(1).write.mode("append").parquet(in)
    StreamHarness.stampChunk(in, 1)
    val stream = spark.readStream.schema(batch0.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = AnnIngest.writer(stream, idx, edges,
        k = 3, nProbe = 3, maxCellSize = 16)
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    q.awaitTermination()
    edgeState(edges) shouldBe cleanState._1
    indexState(idx) shouldBe cleanState._2
  }

  // ---- round 12 (VERDICT r11 #1): the gauge wired into the loop ----

  /** Drifted second batch (orthogonal tight cluster) for the mid-stream
    * rebuild scenarios; built against the fresh index's quantizer. */
  private def driftedBatch(idx: String) =
    graft.operators.IndexDriftFixture
      .driftedDelta(spark, idx, batch1)
      .select(col("vec_id"), col("embedding"))

  private def genOf(idx: String): Long =
    graft.operators.Similarity.currentGen(idx)

  test("healthEvery wiring: a drifted batch trips the gauge mid-stream, " +
      "the index rebuilds (generation swap), ingest continues, and the " +
      "final edge set is deterministic") {
    def runIngest(): (String, Seq[(Int, Long, Int, Long, Double)],
        Seq[(Long, Int, Long)]) = {
      val (idx, edges) = freshIndex()
      val sh = driftedBatch(idx)
      // in-distribution batch: gauge consulted (healthEvery = 1), must
      // NOT fire — no generation swap
      AnnIngest.processBatch(batch0, 0L, idx, edges,
        k = 3, nProbe = 3, maxCellSize = 16, healthEvery = 1)
      genOf(idx) shouldBe -1L
      AnnIngest.processBatch(sh, 1L, idx, edges,
        k = 3, nProbe = 3, maxCellSize = 16, healthEvery = 1)
      // the drifted batch fired the verdict: a new generation is live
      genOf(idx) shouldBe 0L
      // ingest continues against the rebuilt index
      val batch2 = emb.where(col("vec_id") % 10 === 1)
        .select(col("vec_id"), col("embedding"))
      AnnIngest.processBatch(batch2, 2L, idx, edges,
        k = 3, nProbe = 3, maxCellSize = 16, healthEvery = 1)
      (idx, edgeState(edges), indexState(idx))
    }
    val (idxA, edgesA, cellsA) = runIngest()
    val (_, edgesB, cellsB) = runIngest()
    edgesA shouldBe edgesB
    cellsA shouldBe cellsB
    // batch 0 (healthEvery = 1, in-distribution) did not rebuild; only
    // the drifted batch did — exactly one generation exists
    new java.io.File(idxA).listFiles().map(_.getName)
      .count(_.startsWith("gen_")) shouldBe 1
  }

  test("replay of the rebuild batch from any crash point converges: " +
      "crash before fold (post-rebuild) and already-folded replay both " +
      "reach the clean state") {
    def clean(): (Seq[(Int, Long, Int, Long, Double)], Seq[(Long, Int, Long)],
        String, String, org.apache.spark.sql.DataFrame) = {
      val (idx, edges) = freshIndex()
      val sh = driftedBatch(idx).persist()
      proc(batch0, 0L, idx, edges)
      AnnIngest.processBatch(sh, 1L, idx, edges,
        k = 3, nProbe = 3, maxCellSize = 16, healthEvery = 1)
      (edgeState(edges), indexState(idx), idx, edges, sh)
    }
    val (cleanEdges, cleanCells, _, _, _) = clean()

    // crash between edge write and fold: the rebuild already swapped;
    // the replay re-checks the gauge against the REBUILT index and
    // converges regardless of whether it fires again
    {
      val (idx, edges) = freshIndex()
      val sh = driftedBatch(idx).persist()
      proc(batch0, 0L, idx, edges)
      intercept[RuntimeException] {
        AnnIngest.processBatch(sh, 1L, idx, edges,
          k = 3, nProbe = 3, maxCellSize = 16, healthEvery = 1,
          afterEdges = () => throw new RuntimeException("boom-before-fold"))
      }.getMessage shouldBe "boom-before-fold"
      genOf(idx) should be >= 0L // the rebuild had already swapped
      AnnIngest.processBatch(sh, 1L, idx, edges,
        k = 3, nProbe = 3, maxCellSize = 16, healthEvery = 1)
      edgeState(edges) shouldBe cleanEdges
      indexState(idx) shouldBe cleanCells
      sh.unpersist()
    }

    // already-folded replay (crash after fold, before checkpoint
    // commit): the health check is SKIPPED, the edges recompute against
    // the generation the crashed attempt used — a fixed point
    {
      val (idx, edges) = freshIndex()
      val sh = driftedBatch(idx).persist()
      proc(batch0, 0L, idx, edges)
      AnnIngest.processBatch(sh, 1L, idx, edges,
        k = 3, nProbe = 3, maxCellSize = 16, healthEvery = 1)
      val genAfter = genOf(idx)
      AnnIngest.processBatch(sh, 1L, idx, edges, // the replay
        k = 3, nProbe = 3, maxCellSize = 16, healthEvery = 1)
      genOf(idx) shouldBe genAfter // skipped check: no second rebuild
      edgeState(edges) shouldBe cleanEdges
      indexState(idx) shouldBe cleanCells
      sh.unpersist()
    }
  }
}
