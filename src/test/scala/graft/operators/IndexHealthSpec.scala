package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The IVF index-health / rebuild-trigger contract (VERDICT r10 #1):
  * an in-distribution increment does NOT trip the rebuild verdict, a
  * distribution-shifted increment DOES (through the assignment-residual
  * drift signal), and re-training the quantizer over the grown corpus
  * recovers the kNN recall the frozen index lost to the shift.
  *
  * The fixture embeddings are near-isotropic (no label clustering), so
  * the drifted ingest is SYNTHESIZED as the worst-case new-content
  * batch: a tight cluster around a direction orthogonal to every frozen
  * centroid (Gram–Schmidt over the read-back quantizer — model-sized
  * driver math). By construction its assignment fit is ≤ ~0.1 while the
  * corpus's own fit is the max-of-nCells random-cosine statistic
  * (≈ 0.18 mean), so the drift trip is fixture-independent — exactly
  * the regime where the frozen index ALSO loses recall: the whole batch
  * piles into one foreign cell and the hot-cell cap sub-splits it.
  */
class IndexHealthSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf)
  private def old = emb.where(col("vec_id") % 5 =!= 0)
  private def inDelta = emb.where(col("vec_id") % 5 === 0)

  private def buildIndex(nCells: Int = 8): String = {
    val dir = graft.util.Scratch.dir("graft_ivfhealth_spec_")
    Similarity.writeIvfIndex(old, dir, nCells = nCells, seed = 42L)
    dir
  }

  /** The drifted ingest batch — shared synthesis in
    * [[IndexDriftFixture]] (Gram–Schmidt orthogonal tight cluster). */
  private def driftedDelta(dir: String): DataFrame =
    IndexDriftFixture.driftedDelta(spark, dir, inDelta)

  private def healthRow(delta: DataFrame, dir: String): Row =
    Similarity.ivfIndexHealth(delta, dir, maxCellSize = 64).head()

  test("in-distribution delta: fit_drift ~ 0, no rebuild trigger") {
    val dir = buildIndex()
    val r = healthRow(inDelta, dir)
    val drift = r.getAs[Double]("fit_drift")
    math.abs(drift) should be < 0.02
    r.getAs[Boolean]("rebuild_due_drift") shouldBe false
    r.getAs[Boolean]("rebuild") shouldBe false
  }

  test("shifted delta trips rebuild_due_drift; in-distribution does not") {
    val dir = buildIndex()
    val ok = healthRow(inDelta, dir)
    val bad = healthRow(driftedDelta(dir), dir)
    // the shifted batch fits the frozen quantizer strictly worse
    bad.getAs[Double]("delta_fit") should be < 0.11
    bad.getAs[Double]("fit_drift") should be > 0.02
    bad.getAs[Boolean]("rebuild_due_drift") shouldBe true
    bad.getAs[Boolean]("rebuild") shouldBe true
    ok.getAs[Boolean]("rebuild") shouldBe false
    // base_fit is a property of the INDEX alone — identical across runs
    bad.getAs[Double]("base_fit") shouldBe ok.getAs[Double]("base_fit")
  }

  private def edgeSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("qid"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recallVsExact(approx: DataFrame, exact: Set[(Long, Long)]): Double =
    (edgeSet(approx) & exact).size.toDouble / exact.size

  test("post-rebuild (re-trained quantizer) recovers the recall the " +
      "frozen index lost to the shifted ingest") {
    val k = 3
    val cap = 16
    val dir = buildIndex()
    val sh = driftedDelta(dir).persist()
    val union = old.select(col("vec_id"), col("embedding"))
      .unionByName(sh.select(col("vec_id"), col("embedding")))
    // ground truth for the shifted queries over the grown corpus: the
    // true neighbors are other members of the new tight cluster
    val exact = edgeSet(Similarity.bruteForceTopK(
      union, sh.select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      k = k))
    // frozen path: fold the shifted batch into the old-corpus index —
    // the whole new cluster lands in one foreign cell, the hot-cell cap
    // sub-splits it, and each probe sees only its own sub-cell
    val frozen = Similarity.incrementalKnnJoin(
      sh, dir, k = k, nProbe = 2, maxCellSize = cap)
    // rebuild path: re-train the quantizer over the grown corpus (the
    // action the health row's rebuild verdict demands); Lloyd refinement
    // gives the new cluster its own cell(s) regardless of the sample
    val rebuilt = Similarity.knnJoinIvf(
        union, k = k, nCells = 16, nProbe = 2, maxCellSize = cap,
        refineIters = 2)
      .join(sh.select(col("vec_id").as("qid")), Seq("qid"))
    val rFrozen = recallVsExact(frozen, exact)
    val rRebuilt = recallVsExact(rebuilt, exact)
    withClue(s"frozen=$rFrozen rebuilt=$rRebuilt: ") {
      rRebuilt should be > rFrozen
    }
    sh.unpersist()
  }
}
