package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.VectorExpressions._
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine expression matches a scalar Scala reimplementation") {
    val rows = Tables.embeddings(spark, sf).limit(8)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    val pairs = rows.combinations(2).take(10).toSeq
    val df = pairs.map { case Array((ia, a), (ib, b)) => (ia, ib, a, b) }
      .toDF("a_id", "b_id", "a", "b")
      .select(col("a_id"), col("b_id"), cosineSim(col("a"), col("b")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pairs.foreach { case Array((ia, a), (ib, b)) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      val expect = dot / (math.sqrt(na) * math.sqrt(nb))
      df((ia, ib)) shouldBe expect // kernel accumulates in array order -> bit-identical
    }
  }

  test("cosine of a vector with itself is ~1; l2Norm positive") {
    val r = Tables.embeddings(spark, sf).limit(5)
      .select(cosineSim(col("embedding"), col("embedding")).as("c"),
        l2Norm(col("embedding")).as("n"))
      .collect()
    r.foreach { row =>
      row.getDouble(0) shouldBe 1.0 +- 1e-12
      row.getDouble(1) should be > 0.0
    }
  }

  test("brute-force top-k: k rows per query, descending, no self-match") {
    val q = Tables.embeddings(spark, sf).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val out = Similarity.bruteForceTopK(Tables.embeddings(spark, sf), q, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    out.groupBy(_._1).foreach { case (qid, rows) =>
      rows.length shouldBe 5
      rows.map(_._3) should not contain qid
      val byRank = rows.sortBy(_._2).map(_._4)
      byRank.sliding(2).foreach { case Array(x, y) => x should be >= y }
    }
  }

  test("LSH top-k achieves reasonable recall vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    // near-random synthetic embeddings: per-bit collision prob for a top-5
    // neighbor is only ~0.65, so short signatures + more tables are needed
    // for recall (4 bits, 8 tables -> ~1-(1-0.65^4)^8 ~ 0.78 expected)
    val approx = Similarity.lshTopK(emb, q, k = 5, dim = 64, bits = 4, tables = 8)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    withClue(s"recall=$recall") { recall should be >= 0.5 }
  }

  test("IVF top-k achieves reasonable recall vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    // probing half the cells must recover well over half the neighbors
    val approx = Similarity.ivfTopK(emb, q, k = 5, nCells = 16, nProbe = 8)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    withClue(s"recall=$recall") { recall should be >= 0.5 }
  }

  test("knnJoinIvf: full-probe run is exact; default probes keep good recall") {
    val emb = Tables.embeddings(spark, sf)
    // nProbe = nCells probes every cell -> candidates = whole corpus ->
    // must equal the brute-force kNN graph exactly (same tie-breaks)
    val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, q, k = 3)
      .select("qid", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    val full = Similarity.knnJoinIvf(emb, k = 3, nCells = 16, nProbe = 16)
      .select("qid", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    full shouldBe exact
    // default 4-of-16 probes: every vector still present with k dense
    // ranks, and the recalled edge set stays well above half
    val approx = Similarity.knnJoinIvf(emb, k = 3)
    val perQ = approx.groupBy("qid")
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"))
      .where(col("n") =!= 3 || col("mx") =!= 3).count()
    perQ shouldBe 0L
    val approxSet = approx.select("qid", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val exactSet = exact.map(t => (t._1, t._3))
    val recall = exactSet.intersect(approxSet).size.toDouble / exactSet.size
    withClue(s"recall=$recall") { recall should be >= 0.5 }
  }

  test("knnJoinIvf: sub-split cap is a no-op when no cell exceeds it") {
    val emb = Tables.embeddings(spark, sf)
    val off = Similarity.knnJoinIvf(emb, k = 3, maxCellSize = 0)
      .select("qid", "rank", "neighbor_id", "cos")
      .as[(Long, Int, Long, Double)].collect().toSet
    // fixture corpus is tiny: a cap far above any cell count must leave
    // every candidate pair (and hence the graph) bit-identical
    val capped = Similarity.knnJoinIvf(emb, k = 3, maxCellSize = 100000)
      .select("qid", "rank", "neighbor_id", "cos")
      .as[(Long, Int, Long, Double)].collect().toSet
    capped shouldBe off
  }

  test("knnJoinIvf: a biting cap keeps dense rank prefixes and is a " +
      "subset of the uncapped candidate graph") {
    val emb = Tables.embeddings(spark, sf)
    // k = 1000 > any per-query candidate count, so this IS the full
    // uncapped candidate graph
    val uncapped = Similarity.knnJoinIvf(emb, k = 1000, maxCellSize = 0)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val capped = Similarity.knnJoinIvf(emb, k = 3, maxCellSize = 4)
    // ranks are a dense 1..n prefix per query (n ≤ k when a sub-cell
    // holds fewer candidates than k)
    val bad = capped.groupBy("qid")
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"))
      .where(col("mx") =!= col("n") || col("n") > 3).count()
    bad shouldBe 0L
    // every capped edge exists in the uncapped candidate graph: the
    // sub-split only removes candidates, never invents them
    val cappedSet = capped.select("qid", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    cappedSet.subsetOf(uncapped) shouldBe true
  }

  test("PQ top-k (ADC shortlist + exact re-rank) achieves high recall vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    // 64-bit codes (16 subspaces x 4 bits) + a 100-vector exact re-rank:
    // measured recall@5 = 0.90 on the near-random fixture embeddings
    val approx = Similarity.pqTopK(emb, q, k = 5)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    withClue(s"recall=$recall") { recall should be >= 0.7 }
  }

  test("embedding near-dup: LSH pairs are a subset of exact pairs with decent recall") {
    val emb = Tables.embeddings(spark, sf).where(col("vec_id") < 300)
    val exact = Similarity.bruteForceNearDupPairs(emb, threshold = 0.35)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshNearDupPairs(emb, threshold = 0.35, dim = 64)
      .select("a", "b").as[(Long, Long)].collect().toSet
    withClue(s"exact=${exact.size} approx=${approx.size}") {
      exact should not be empty
      approx.subsetOf(exact) shouldBe true // verify step guarantees no false positives
      approx.size.toDouble / exact.size should be >= 0.5
    }
  }

  test("covarianceUpperTriangle: diag = variances, matches direct computation, partition-stable") {
    val emb = Tables.embeddings(spark, sf)
    val cov = Similarity.covarianceUpperTriangle(emb, "embedding")
    val d = 64
    cov.count() shouldBe (d * (d + 1) / 2).toLong
    // diagonal entries are population variances: non-negative
    cov.where(col("i") === col("j") && col("cov") < -1e-9).count() shouldBe 0L
    // spot-check (0,1) against a direct two-column computation
    val xy = emb.select(
      col("embedding").getItem(0).cast("double").as("x"),
      col("embedding").getItem(1).cast("double").as("y"))
    val r = xy.agg(avg(col("x") * col("y")).as("exy"),
      avg(col("x")).as("ex"), avg(col("y")).as("ey")).head()
    val want = r.getDouble(0) - r.getDouble(1) * r.getDouble(2)
    val got = cov.where(col("i") === 0 && col("j") === 1)
      .select("cov").head().getDouble(0)
    got shouldBe want +- 1e-6
    // integerized sums: bit-identical under repartitioning
    val again = Similarity.covarianceUpperTriangle(emb.repartition(13), "embedding")
      .orderBy("i", "j").select("cov").as[Double].collect().toSeq
    cov.orderBy("i", "j").select("cov").as[Double].collect().toSeq shouldBe again
  }

  test("powerIterationTopEigen: unit vector, dominant Rayleigh quotient, monotone, partition-stable") {
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.powerIterationTopEigen(emb, "embedding", iters = 4)
      .orderBy("i").collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    out.length shouldBe 64
    val v = out.map(_._2)
    math.sqrt(v.map(x => x * x).sum) shouldBe 1.0 +- 1e-6
    val eig = out.head._3
    eig should be > 0.0
    // Rayleigh dominance: v'Cv must beat a few arbitrary unit directions
    val cov = Similarity.covarianceUpperTriangle(emb, "embedding")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    def rayleigh(x: Array[Double]): Double = {
      var s = 0.0
      for (i <- 0 until 64; j <- 0 until 64) {
        val c = if (i <= j) cov((i, j)) else cov((j, i))
        s += x(i) * c * x(j)
      }
      s / x.map(t => t * t).sum
    }
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val x = Array.fill(64)(rnd.nextGaussian())
      rayleigh(v) should be >= rayleigh(x)
    }
    // more iterations estimate at least as much mass (monotone ‖Cv‖)
    val eig2 = Similarity.powerIterationTopEigen(emb, "embedding", iters = 2)
      .select("eigval").head().getDouble(0)
    eig should be >= eig2 - 1e-9
    // integerized iterations: bit-identical under repartitioning
    val again = Similarity.powerIterationTopEigen(emb.repartition(13), "embedding", iters = 4)
      .orderBy("i").collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    again.toSeq shouldBe out.toSeq
  }

  test("pcaProject: scores match a driver-side dot with the learned eigenvector") {
    val emb = Tables.embeddings(spark, sf)
    val v = Similarity.powerIterationTopEigen(emb, "embedding", iters = 4)
      .orderBy("i").collect().map(_.getDouble(1))
    val scores = Similarity.pcaProject(emb, "embedding", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    scores.size shouldBe vecs.length
    vecs.foreach { case (id, x) =>
      val want = x.indices.map(j =>
        math.round(x(j).toDouble * v(j) * 1e9)).sum / 1e9
      withClue(s"vec $id") { scores(id) shouldBe want +- 1e-12 }
    }
    // projection onto the dominant direction captures more mass than
    // onto an arbitrary coordinate axis (variance comparison)
    def variance(xs: Iterable[Double]): Double = {
      val n = xs.size; val m = xs.sum / n
      xs.map(t => (t - m) * (t - m)).sum / n
    }
    val axisVar = variance(vecs.map(_._2(0).toDouble))
    variance(scores.values) should be > axisVar
  }

  test("cosineSimFD matches cosineSim when the double side is an exact float image") {
    val emb = Tables.embeddings(spark, sf).limit(20)
    val both = emb.select(
      cosineSim(col("embedding"), col("embedding")).as("ff"),
      graft.functions.VectorExpressions.cosineSimFD(
        col("embedding"), col("embedding").cast("array<double>")).as("fd"))
      .collect()
    both.foreach(r => r.getDouble(1) shouldBe r.getDouble(0))
  }

  test("semanticDedup: drop rule matches brute-force within-cell recompute; kept set is dup-free") {
    val emb = Tables.embeddings(spark, sf)
    val thr = 0.3
    val out = Similarity.semanticDedup(emb, threshold = thr)
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
    rows.length shouldBe emb.count().toInt
    rows.foreach { case (_, _, dupOf, kept) => kept shouldBe dupOf.isEmpty }
    // recompute: same-cell pairs above threshold, min smaller id
    val cellOf = rows.map(r => r._1 -> r._2).toMap
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      math.round(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val ids = rows.map(_._1).sorted
    val expect = ids.map { b =>
      val smaller = ids.filter(a => a < b && cellOf(a) == cellOf(b) &&
        cos(vecs(a), vecs(b)) >= thr)
      b -> (if (smaller.isEmpty) None else Some(smaller.min))
    }.toMap
    rows.foreach { case (id, _, dupOf, _) =>
      withClue(s"vec $id") { dupOf shouldBe expect(id) }
    }
    // no same-cell near-dup pair survives with both sides kept
    val kept = rows.filter(_._4).map(_._1)
    for (a <- kept; b <- kept if a < b && cellOf(a) == cellOf(b))
      cos(vecs(a), vecs(b)) should be < thr
  }

  test("semanticDedup hot-cell guard: a skewed corpus is sub-split to bounded in-cell pair work") {
    // Adversarial quantizer skew: every vector is a tiny perturbation of
    // one direction, so cosine-argmax assignment drops the WHOLE corpus
    // into a handful of cells — the O((n/cells)²) worst case the
    // maxCellSize guard exists for. Perturbations are deterministic
    // (hash-derived), magnitudes small enough that all pairs stay above
    // any sane threshold.
    val n = 600
    val dim = 8
    val cap = 40
    val skewed = (0 until n).map { i =>
      val v = Array.tabulate(dim) { d =>
        val noise = ((i * 31 + d * 7) % 13).toFloat / 1000f
        if (d == 0) 1f else noise
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val out = Similarity.semanticDedup(
      skewed, threshold = 0.9, nCells = 4, maxCellSize = cap)
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
    rows.length shouldBe n // one row per vector survives the guard path
    rows.foreach { case (_, _, dupOf, k2) => k2 shouldBe dupOf.isEmpty }
    // Reconstruct the guarded join's group key (cell, subcell) exactly as
    // the operator computes it and assert the per-group bound that caps a
    // task's pair count: with the corpus concentrated in ≤ 4 cells,
    // ⌈|cell|/cap⌉-way hash splitting must keep every group near cap
    // (2× slack for multinomial imbalance of the deterministic hash) —
    // vs the unguarded worst case of a single ~600-row group.
    val cellSizes = rows.groupBy(_._2).map { case (c, rs) => c -> rs.length }
    cellSizes.values.max should be > cap // the skew is real: guard engaged
    val groupSizes = rows.groupBy { case (id, cell, _, _) =>
      val nsub = math.max(1L, math.ceil(
        cellSizes(cell).toDouble / cap).toLong)
      (cell, ((id * 2654435761L + 43L) % 4294967296L % nsub).toInt)
    }.map(_._2.size)
    groupSizes.max should be <= 2 * cap
    // Precision is preserved under the guard: every reported dup pair is
    // a genuine same-cell near-duplicate (sub-splitting may MISS pairs —
    // the documented recall trade — but must never invent one).
    val vecMap = skewed.as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      math.round(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val cellOf = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (b, _, dupOf, _) =>
      dupOf.foreach { a =>
        a should be < b
        cellOf(a) shouldBe cellOf(b)
        cos(vecMap(a), vecMap(b)) should be >= 0.9
      }
    }
  }

  test("whiten: whitened covariance is the identity (diag ~1, off-diag ~0)") {
    val w = Similarity.whiten(graft.Tables.embeddings(spark, sf))
    val cells = w.as("p")
      .join(w.as("q"),
        col("p.vec_id") === col("q.vec_id") && col("q.i") >= col("p.i"))
      .groupBy(col("p.i").as("i"), col("q.i").as("j"))
      .agg((avg(col("p.y") * col("q.y"))
        - avg(col("p.y")) * avg(col("q.y"))).as("c"))
      .collect().map(r => (r.getAs[Int]("i"), r.getAs[Int]("j"), r.getAs[Double]("c")))
    cells.length shouldBe 64 * 65 / 2
    cells.foreach { case (i, j, c) =>
      if (i == j) withClue(s"diag $i") { c shouldBe 1.0 +- 0.05 }
      else withClue(s"off-diag ($i,$j)") { math.abs(c) should be < 0.05 }
    }
  }

  test("whiten: mean of whitened coordinates is ~0") {
    val w = Similarity.whiten(graft.Tables.embeddings(spark, sf))
    val worst = w.groupBy(col("i")).agg(abs(avg(col("y"))).as("m"))
      .agg(max(col("m"))).head().getDouble(0)
    worst should be < 1e-6
  }

  test("whiten: empty input and ragged vectors fail loudly, not as NaN/mis-sized output") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    an[IllegalArgumentException] should be thrownBy
      Similarity.whiten(empty)
    val ragged = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    an[IllegalArgumentException] should be thrownBy
      Similarity.whiten(ragged)
  }

  test("TopCellsByCos kernel == the per-centroid literal formulation" +
      " (argmax cell AND probe order), incl. duplicate-centroid ties") {
    val emb = Tables.embeddings(spark, sf01)
    // centroid sets: the knnJoinIvf Knuth-hash sample at nCells 16 and
    // the scale sizing ceil(sqrt(n)), plus a DUPLICATED first centroid
    // appended so at least one exact cosine tie exists (tie must break
    // to the SMALLER cell on both paths)
    val n = emb.count()
    Seq(16, math.ceil(math.sqrt(n.toDouble)).toInt).foreach { nCells =>
      val cents0 = emb
        .select(col("vec_id"), col("embedding"))
        .orderBy(((col("vec_id") * lit(2654435761L) + lit(42L)) % lit(4294967296L)).asc,
          col("vec_id"))
        .limit(nCells).orderBy(col("vec_id"))
        .collect().zipWithIndex.map { case (r, i) => (i, r.getSeq[Float](1)) }
      val cents = cents0 :+ ((cents0.length, cents0.head._2)) // forced tie
      val nProbe = 4
      // literal formulation (what knnJoinIvf used before the kernel)
      val probeSorted = array_sort(array(cents.map { case (i, c) =>
        struct((-cosineSim(col("embedding"), typedlit(c))).as("negcos"),
          lit(i).as("cell"))
      }: _*))
      val legacy = emb.select(col("vec_id"),
          slice(probeSorted, 1, nProbe).as("pc"))
        .select(col("vec_id"), expr("transform(pc, x -> x.cell)").as("cells"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val kernel = emb.select(col("vec_id"),
          graft.functions.VectorExpressions.topCellsByCos(
            col("embedding"), cents.map(_._2.toArray).toArray, nProbe).as("cells"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      kernel shouldBe legacy
      // the duplicated centroid (largest cell id) must NEVER outrank its
      // original on equal cosine
      kernel.values.foreach { cells =>
        if (cells.contains(cents0.length)) cells.indexOf(0) should be >= 0
      }
    }
  }

  test("TopCellsByCos: zero vector -> cos 0.0 everywhere, cells in id order") {
    import spark.implicits._
    val z = Seq((1L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val cents = Array(Array.fill(8)(1.0f), Array.fill(8)(2.0f), Array.fill(8)(3.0f))
    val got = z.select(graft.functions.VectorExpressions
        .topCellsByCos(col("embedding"), cents, 2).as("c"))
      .collect().head.getSeq[Int](0)
    got shouldBe Seq(0, 1) // all ties at 0.0 -> ascending cell ids
  }

  test("probeIds restriction == full kNN graph filtered to the sample " +
      "(both capped and uncapped)") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val cm = Similarity.sampleCentroids(
      emb, "vec_id", "embedding", nCells = 8, seed = 42L, refineIters = 0)
    val qids = graft.operators.Curation
      .exactKSample(emb, col("vec_id"), 16, 93L).select(col("vec_id"))
    val sample = qids.as[Long].collect().toSet
    for (cap <- Seq(0, 16)) {
      val restricted = Similarity.knnJoinIvfWithCentroids(
          emb, cm, k = 3, maxCellSize = cap, probeIds = Some(qids))
        .collect().map(_.toString).sorted
      val filtered = Similarity.knnJoinIvfWithCentroids(
          emb, cm, k = 3, maxCellSize = cap)
        .where(col("qid").isInCollection(sample))
        .collect().map(_.toString).sorted
      withClue(s"cap=$cap") { restricted.toSeq shouldBe filtered.toSeq }
    }
  }

  test("appendIvfDelta completes the ingest loop: fold, append, fold " +
      "again == batch at frozen centroids each time") {
    val emb = Tables.embeddings(spark, sf)
    val part1 = emb.where(col("vec_id") % 5 === 0) // first increment
    val part2 = emb.where(col("vec_id") % 5 === 1) // second increment
    val base = emb.where(col("vec_id") % 5 >= 2)   // frozen corpus
    val dir = graft.util.Scratch.dir("graft_ivfidx_append_")
    Similarity.writeIvfIndex(base, dir, nCells = 8, seed = 42L)
    val cm = Similarity.readIvfCentroids(spark, dir)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
    // increment 1 folds against base, then joins the index
    Similarity.appendIvfDelta(part1, dir)
    // increment 2 must see base ∪ part1 through the grown index
    val inc2 = Similarity.incrementalKnnJoin(
      part2, dir, k = 3, nProbe = 3, maxCellSize = 16)
    // incremental candidates = grown index (base ∪ part1) ∪ part2 = ALL
    val batch2 = Similarity.knnJoinIvfWithCentroids(
        emb, cm, k = 3, nProbe = 3, maxCellSize = 16)
      .where(col("qid") % 5 === 1)
    inc2.collect().map(key).sorted shouldBe batch2.collect().map(key).sorted
    // the grown index itself matches a fresh batch write of the union
    // at the same centroids (same rows, same cells)
    Similarity.appendIvfDelta(part2, dir)
    val grown = spark.read.parquet(s"$dir/cells")
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    val freshDir = graft.util.Scratch.dir("graft_ivfidx_fresh_")
    // fresh index over the union, forced to the SAME centroids: write
    // base first (trains the identical quantizer sample), then append
    Similarity.writeIvfIndex(base, freshDir, nCells = 8, seed = 42L)
    Similarity.appendIvfDelta(part1.unionByName(part2), freshDir)
    val fresh = spark.read.parquet(s"$freshDir/cells")
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    grown.toSeq shouldBe fresh.toSeq
  }

  test("incrementalKnnJoin == batch rebuild at frozen centroids, " +
      "restricted to delta queries; index read prunes to probed cells") {
    val emb = Tables.embeddings(spark, sf)
    val delta = emb.where(col("vec_id") % 5 === 0)
    val old = emb.where(col("vec_id") % 5 =!= 0)
    val dir = graft.util.Scratch.dir("graft_ivfidx_spec_")
    // maxCellSize = 16 so the hot-cell sub-split BITES (cells hold ~60
    // vectors at sf0.001/nCells=8) — the equivalence must cover the
    // sub-cell hash path, not just the trivial nsub = 1 case
    Similarity.writeIvfIndex(old, dir, nCells = 8, seed = 42L)
    val cm = Similarity.readIvfCentroids(spark, dir)
    cm.length shouldBe 8
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
    val inc = Similarity.incrementalKnnJoin(
      delta, dir, k = 3, nProbe = 3, maxCellSize = 16)
    val batch = Similarity.knnJoinIvfWithCentroids(
        emb, cm, k = 3, nProbe = 3, maxCellSize = 16)
      .where(col("qid") % 5 === 0)
    inc.collect().map(key).sorted shouldBe batch.collect().map(key).sorted
    // cost ∝ delta: the literal IN-list on the partition column must
    // prune the index scan to the probed cells' files only
    val probed = delta
      .select(graft.functions.VectorExpressions.topCellsByCos(
        col("embedding"), cm, 3).as("tc"))
      .select(explode(col("tc")).as("c")).distinct()
      .collect().map(_.getInt(0)).toSet
    val allCells = spark.read.parquet(s"$dir/cells")
    val pruned = allCells
      .where(col("cell").isin(probed.toSeq.map(Int.box): _*))
    val cellsOnDisk = allCells.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    if (probed.size < cellsOnDisk.size)
      pruned.inputFiles.length should be < allCells.inputFiles.length
    pruned.inputFiles.foreach { f =>
      val m = "cell=(\\d+)".r.findFirstMatchIn(f)
      m.isDefined shouldBe true
      probed should contain(m.get.group(1).toInt)
    }
  }
}
