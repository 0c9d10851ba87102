package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorExpressions._
import graft.util.Det

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - `bruteForceTopK`: exact cosine top-k — broadcast the (small) query
  *    set against the full corpus; one scan, no shuffle of the corpus.
  *    The baseline and the verifier for the approximate paths.
  *  - `lshTopK`: random-hyperplane LSH — `tables` independent signatures
  *    of `bits` hyperplanes each; only same-signature buckets are joined.
  *    The 100 TB path: candidate generation is a hash join on the
  *    signature, cost ~|corpus| * avg_bucket instead of |Q| x |corpus|.
  *
  * Cosine is the native codegen expression [[graft.functions.VectorExpressions.CosineSim]]
  * (double accumulation in array order — deterministic).
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * @param queries (qid, qvec) — expected small enough to broadcast. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundTo: Int = 6): DataFrame = {
    val scored = corpus.join(broadcast(queries), col("qid") =!= col(idCol))
      .withColumn("cos", Det.fixed(cosineSim(col("qvec"), col(vecCol)), roundTo))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col(idCol).as("neighbor_id"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplanes (seeded), as literal arrays —
    * shipped in the plan, no side channel. `private[graft]` so the oracle
    * SQL generator can embed the same constants. */
  private[graft] def hyperplanes(dim: Int, bits: Int, tables: Int, seed: Long): Seq[Seq[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(tables)(Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian())))
  }

  /** Signature of a vector under one table's hyperplanes: an int whose
    * bit b = sign(dot(vec, plane_b)) — a native codegen expression
    * ([[graft.functions.VectorExpressions.HyperplaneSig]]); the
    * interpreted-HOF formulation costs bits x |vec| Catalyst evals/row. */
  private def signature(vec: Column, planes: Seq[Array[Double]]): Column =
    graft.functions.VectorExpressions.hyperplaneSig(
      vec, planes.flatten.toIndexedSeq, planes.length)

  /** Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold),
    * exact all-pairs form — O(|corpus|^2), the oracle-checkable baseline;
    * cap the input or use [[lshNearDupPairs]] at scale. */
  def bruteForceNearDupPairs(
      corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundTo: Int = 6): DataFrame = {
    val l = corpus.select(col(idCol).as("a"), col(vecCol).as("va"))
    val r = corpus.select(col(idCol).as("b"), col(vecCol).as("vb"))
    l.join(r, col("a") < col("b"))
      .withColumn("cos", Det.fixed(cosineSim(col("va"), col("vb")), roundTo))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs at scale: candidates must share
    * a random-hyperplane signature in >=1 table (bucket self-join, never
    * all-pairs), then exact-cosine verified. Approximate by construction —
    * recall vs [[bruteForceNearDupPairs]] is asserted in SimilaritySpec. */
  def lshNearDupPairs(
      corpus: DataFrame, threshold: Double, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bits: Int = 4, tables: Int = 8, seed: Long = 42L,
      roundTo: Int = 6): DataFrame = {
    val planes = hyperplanes(dim, bits, tables, seed)
    val sigs = array(planes.zipWithIndex.map { case (ps, t) =>
      struct(lit(t).as("t"), signature(col(vecCol), ps).as("sig"))
    }: _*)
    val bucketed = corpus
      .select(col(idCol).as("id"), explode(sigs).as("s"))
      .select(col("id"), col("s.t").as("t"), col("s.sig").as("sig"))
      .persist() // staged signatures: both sides of the self-join reuse it
    val l = bucketed.select(col("t"), col("sig"), col("id").as("a"))
    val r = bucketed.select(col("t"), col("sig"), col("id").as("b"))
    // distinct over bare id pairs (16 B/row) BEFORE re-attaching the
    // 64-float vectors — the candidate shuffle must not carry payloads
    val cand = l.join(r, Seq("t", "sig"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    cand
      .join(vecs.select(col("id").as("a"), col("v").as("va")), Seq("a"))
      .join(vecs.select(col("id").as("b"), col("v").as("vb")), Seq("b"))
      .withColumn("cos", Det.fixed(cosineSim(col("va"), col("vb")), roundTo))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }

  /** IVF (inverted-file) approximate top-k: a coarse quantizer of
    * `nCells` centroids partitions the corpus into cells; each query
    * probes its `nProbe` nearest cells and ranks only those vectors.
    * Cost: |corpus| x nCells (assignment, one pass, done once) +
    * |Q| x (nProbe/nCells) x |corpus| (search) — the standard
    * recall/cost dial ANN services expose.
    *
    * Centroids here are a deterministic seeded sample of the corpus
    * (k-means would sharpen cells but adds an iterative fit; the IVF
    * plumbing — assignment, cell join, probe pruning — is identical).
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      roundTo: Int = 6, refineIters: Int = 0): DataFrame = {
    val centroids: Array[(Int, Seq[Float])] =
      if (refineIters > 0)
        // Lloyd-refined coarse quantizer: tighter cells, better recall
        // at the same nProbe (see VecKMeans)
        VecKMeans.fit(corpus, vecCol, nCells, refineIters, seed, idCol)
          .centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      else corpus
        .select(col(idCol), col(vecCol))
        // seeded deterministic sample via a multiplicative (Knuth) hash —
        // SQL-expressible in the oracle, unlike xxhash64
        .orderBy(((col(idCol) * lit(2654435761L) + lit(seed)) % lit(4294967296L)).asc,
          col(idCol))
        .limit(nCells)
        .orderBy(col(idCol))
        .collect().zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Float](1)) }
    val centDf = broadcast(
      corpus.sparkSession.createDataFrame(centroids.toIndexedSeq)
        .toDF("cell", "centroid"))

    // cell assignment = nearest centroid by cosine (rank over the small
    // broadcast cross join; nCells is tiny so this is |rows| x nCells)
    def assign(df: DataFrame, id: Column, vec: Column, topN: Int): DataFrame = {
      val w = Window.partitionBy(id).orderBy(
        cosineSim(vec, col("centroid")).desc, col("cell"))
      df.crossJoin(centDf)
        .withColumn("cell_rank", row_number().over(w))
        .where(col("cell_rank") <= topN)
        .drop("centroid", "cell_rank")
    }

    val cells = assign(corpus, col(idCol), col(vecCol), 1)
    val probes = assign(queries, col("qid"), col("qvec"), nProbe)
    val scored = cells.join(broadcast(probes), Seq("cell"))
      .where(col("qid") =!= col(idCol))
      .withColumn("cos", Det.fixed(cosineSim(col("qvec"), col(vecCol)), roundTo))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col(idCol).as("neighbor_id"), col("cos"))
  }

  /** Approximate top-k: candidates share an LSH signature in >=1 table. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bits: Int = 10, tables: Int = 6, seed: Long = 42L,
      roundTo: Int = 6): DataFrame = {
    val planes = hyperplanes(dim, bits, tables, seed)
    def sigs(vec: Column): Column =
      array(planes.zipWithIndex.map { case (ps, t) =>
        struct(lit(t).as("t"), signature(vec, ps).as("sig"))
      }: _*)

    val c = corpus
      .select(col(idCol), col(vecCol), explode(sigs(col(vecCol))).as("s"))
      .select(col(idCol), col(vecCol), col("s.t").as("t"), col("s.sig").as("sig"))
    val q = queries
      .select(col("qid"), col("qvec"), explode(sigs(col("qvec"))).as("s"))
      .select(col("qid"), col("qvec"), col("s.t").as("t"), col("s.sig").as("sig"))

    val cand = c.join(broadcast(q), Seq("t", "sig"))
      .where(col("qid") =!= col(idCol))
      .select(col("qid"), col("qvec"), col(idCol), col(vecCol))
      .distinct()
      .withColumn("cos", Det.fixed(cosineSim(col("qvec"), col(vecCol)), roundTo))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col(idCol))
    cand
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col(idCol).as("neighbor_id"), col("cos"))
  }
}
