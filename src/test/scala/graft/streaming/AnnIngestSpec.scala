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
    spark.read.parquet(s"$idx/cells")
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
}
