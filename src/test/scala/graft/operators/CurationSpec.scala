package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: pack totals bounded by budget + max doc, offsets consistent") {
    val budget = 256
    val docs = Tables.documents(spark, sf)
    val packed = Curation.packSequences(docs,
      tokenCol = org.apache.spark.sql.functions.size(TextAnalysis.tokens(col("text"))),
      shardCol = col("lang"), orderCol = col("doc_id"), budget = budget)
    val stats = packed.groupBy(col("lang"), col("pack_id"))
      .agg(sum(col("n_tokens")).as("tot"), max(col("n_tokens")).as("mx"),
        min(col("offset_in_pack")).as("off0"))
      .collect()
    stats.length should be > 1
    // quantized packing overflows a pack by less than one document
    stats.foreach { r =>
      r.getAs[Long]("tot") should be < (budget + r.getAs[Long]("mx") + 1)
    }
    // a document's offset is its pack-local start: always < budget
    packed.where(col("offset_in_pack") >= budget).count() shouldBe 0L
  }

  test("stratifiedSample: deterministic, unknown strata dropped, rate honored") {
    val docs = Tables.documents(spark, sf)
    val rates = Map("en" -> 1.0, "de" -> 0.0)
    val s1 = Curation.stratifiedSample(docs, col("doc_id"), col("lang"), rates, 7L)
    val s2 = Curation.stratifiedSample(docs, col("doc_id"), col("lang"), rates, 7L)
    s1.select("doc_id").collect().toSeq shouldBe s2.select("doc_id").collect().toSeq
    s1.where(col("lang") === "de").count() shouldBe 0L
    s1.where(col("lang") === "en").count() shouldBe
      docs.where(col("lang") === "en").count() // rate 1.0 keeps everything
    // unknown stratum -> rate 0
    s1.where(!col("lang").isin("en", "de")).count() shouldBe 0L
  }

  test("scrubPii removes emails, urls and phone numbers") {
    val rows = Seq(
      "mail me at a.b+c@foo-bar.example please",
      "see https://example.com/x?q=1 now",
      "call +1 555-0147 today",
      "clean text stays").toDF("t")
    val out = rows.select(Curation.scrubPii(col("t")).as("s")).as[String].collect()
    out(0) shouldBe "mail me at <EMAIL> please"
    out(1) shouldBe "see <URL> now"
    out(2) shouldBe "call <PHONE> today"
    out(3) shouldBe "clean text stays"
  }

  test("mixtureSample: rates from target shares, saturation at 1, determinism") {
    val docs = Tables.documents(spark, sf)
    val shares = Map("src0" -> 0.3, "src1" -> 0.25, "src2" -> 0.2,
      "src3" -> 0.15, "src4" -> 0.1, "src5" -> 0.6)
    val out = Curation.mixtureSample(docs, col("doc_id"), col("source"),
      shares, totalFraction = 0.1, seed = 11L)
    // only mapped domains survive
    out.select("source").distinct().as[String].collect().toSet
      .subsetOf(shares.keySet) shouldBe true
    // rate_d = min(1, share*frac*N/n_d); 20 equal sources => share*2
    val rates = out.select("source", "rate").distinct()
      .as[(String, Double)].collect().toMap
    rates("src0") shouldBe 0.6 +- 1e-12
    rates("src5") shouldBe 1.0 // saturated: share 0.6 * 2 = 1.2 -> least(1,_)
    // saturation means src5 keeps everything
    out.where(col("source") === "src5").count() shouldBe
      docs.where(col("source") === "src5").count()
    // deterministic across repartitioning
    val again = Curation.mixtureSample(docs.repartition(7), col("doc_id"),
      col("source"), shares, totalFraction = 0.1, seed = 11L)
    again.select("doc_id").as[Long].collect().sorted.toSeq shouldBe
      out.select("doc_id").as[Long].collect().sorted.toSeq
  }

  test("qualityClassifierScore: bounded score, keep = score>0, all docs present") {
    val docs = Tables.documents(spark, sf)
    val out = Curation.qualityClassifierScore(docs, "doc_id", "text")
    out.count() shouldBe docs.count() // left join keeps every doc
    out.where(col("score") > 1.0 || col("score") < -1.0).count() shouldBe 0L
    out.where(col("keep") =!= (col("score") > 0)).count() shouldBe 0L
    // same token multiset => same score regardless of row order
    val a = out.where(col("doc_id") === 0).select("score").as[Double].head()
    val b = Curation.qualityClassifierScore(docs.repartition(13), "doc_id", "text")
      .where(col("doc_id") === 0).select("score").as[Double].head()
    a shouldBe b
  }

  test("exactKSample: exact size, deterministic, partitioning-independent") {
    val docs = Tables.documents(spark, sf)
    val a = Curation.exactKSample(docs, col("doc_id"), 40, 3L)
    a.count() shouldBe 40L
    val b = Curation.exactKSample(docs.repartition(9), col("doc_id"), 40, 3L)
    a.select("doc_id").as[Long].collect().sorted.toSeq shouldBe
      b.select("doc_id").as[Long].collect().sorted.toSeq
    // plans as top-k, not a global sort
    a.queryExecution.executedPlan.toString should include ("TakeOrderedAndProject")
  }

  test("weightedSample: k rows, zero weights excluded, heavier docs favored") {
    val docs = Tables.documents(spark, sf)
    val k = 100
    val got = Curation.weightedSample(docs, col("doc_id"), col("n_chars"), k, 5L)
    got.count() shouldBe k.toLong
    // weight-proportional inclusion: sampled docs skew longer than corpus
    val sampleMean = got.agg(avg(col("n_chars"))).head().getDouble(0)
    val corpusMean = docs.agg(avg(col("n_chars"))).head().getDouble(0)
    sampleMean should be > corpusMean
  }

  test("assignSplits: fractions approximately honored, stable under append") {
    val docs = Tables.documents(spark, sf)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.05)
    val out = Curation.assignSplits(docs, col("doc_id"), splits, 13L)
    val n = docs.count().toDouble
    val byName = out.groupBy("split").count().as[(String, Long)].collect().toMap
    byName("train") / n shouldBe 0.8 +- 0.1
    byName.keySet.subsetOf(Set("train", "val", "test", "rest")) shouldBe true
    // membership is per-id: a subset of the corpus gets identical labels
    val sub = Curation.assignSplits(docs.where(col("doc_id") < 100),
      col("doc_id"), splits, 13L).select("doc_id", "split")
    val full = out.select("doc_id", "split").where(col("doc_id") < 100)
    sub.except(full).count() shouldBe 0L
  }

  test("mixtureSampleWeighted: token-mass rates, saturation at 1, determinism") {
    val docs = Tables.documents(spark, sf)
    val shares = Map("src0" -> 0.5, "src1" -> 0.4, "src2" -> 2.0)
    val out = Curation.mixtureSampleWeighted(docs, col("doc_id"),
      col("source"), col("n_chars"), shares, totalFraction = 0.2, seed = 7L)
    // rate_d = min(1, share_d * f * W / w_d), computed from token mass
    val w = docs.groupBy("source").agg(sum(col("n_chars")).as("w"))
      .as[(String, Long)].collect().toMap
    val total = w.values.sum.toDouble
    val gotRates = out.select("source", "rate").distinct()
      .as[(String, Double)].collect().toMap
    gotRates.foreach { case (src, rate) =>
      val expect = math.min(1.0,
        shares.getOrElse(src, 0.0) * 0.2 * total / w(src))
      rate shouldBe expect +- 1e-12
    }
    // share 2.0 with f=0.2 can exceed 1 -> saturates, never upsamples
    all(gotRates.values) should be <= 1.0
    // absent domains dropped; kept rows satisfy the hash predicate
    out.where(!col("source").isin(shares.keys.toSeq.map(lit(_)): _*))
      .count() shouldBe 0L
    out.where(col("u") >= col("rate")).count() shouldBe 0L
    // deterministic across partitionings
    val again = Curation.mixtureSampleWeighted(docs.repartition(7),
      col("doc_id"), col("source"), col("n_chars"), shares, 0.2, 7L)
      .select("doc_id").as[Long].collect().sorted
    again shouldBe out.select("doc_id").as[Long].collect().sorted
  }

  test("clusterSafeSplits: no group straddles splits; keyed on representative") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.05)
    val out = Curation.clusterSafeSplits(docs, col("doc_id"), col("fp"),
      splits, 13L)
    // leakage invariant: every fingerprint group maps to exactly one split
    val straddlers = out.groupBy("fp")
      .agg(countDistinct(col("split")).as("nsplits"))
      .where(col("nsplits") > 1).count()
    straddlers shouldBe 0L
    // the group's split is the representative's assignSplits label
    val reps = Curation.assignSplits(
        out.select(col("cluster_id")).distinct(),
        col("cluster_id"), splits, 13L)
      .select(col("cluster_id"), col("split").as("rep_split"))
    out.join(reps, Seq("cluster_id"))
      .where(col("split") =!= col("rep_split")).count() shouldBe 0L
    // synthetic duplicate pair lands together regardless of ids
    import spark.implicits._
    val dup = Seq((1L, "same"), (999999L, "same"), (5L, "other"))
      .toDF("doc_id", "fp")
    val dupOut = Curation.clusterSafeSplits(dup, col("doc_id"), col("fp"),
        splits, 13L)
      .select("fp", "split").distinct().count()
    dupOut shouldBe 2L // one split per fp
  }

  test("connectedComponents labels chain + isolated node correctly") {
    // graph: 1-2, 2-3, 3-4 (one component), 10-11, and isolated 20
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("node")
    val got = Curation.connectedComponents(edges, nodes)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    got shouldBe Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L)
  }

  test("connectedComponentsStar matches min-label CC on chain + isolated node") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("node")
    val got = Curation.connectedComponentsStar(edges, nodes)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    got shouldBe Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L)
  }

  test("connectedComponentsStar converges on a 64-node path where min-label can't") {
    // diameter 63: min-label propagation moves labels one hop per round,
    // so 10 rounds leave far nodes mislabeled; star alternation collapses
    // the whole path within ~log n rounds
    val n = 64L
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    val nodes = (0L until n).toDF("node")
    val star = Curation.connectedComponentsStar(edges, nodes, maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    star.values.toSet shouldBe Set(0L)
    val plain = Curation.connectedComponents(edges, nodes, maxIter = 10)
      .collect().map(r => r.getLong(1)).toSet
    plain should not be Set(0L)
  }

  test("sample_group_exact_k: <= k rows per group, stable under reordering") {
    val df = SparkEntry.queries("sample_group_exact_k")(spark, sf)
    // the scale claim IS the plan: map-side per-group limit, not a full
    // per-group window sort
    df.queryExecution.executedPlan.toString should include ("WindowGroupLimit")
    val out = df.collect()
    out.length should be > 0
    val perGroup = out.groupBy(_.getAs[String]("lang"))
    perGroup.values.foreach(_.length should be <= 10)
    perGroup.values.foreach { rows =>
      val rns = rows.map(_.getAs[Long]("rn")).sorted.toSeq
      rns shouldBe (1L to rows.length.toLong)
    }
    spark.catalog.clearCache()
  }

  test("dedup_best_in_cluster: exactly one kept per cluster, and it has max quality") {
    val out = SparkEntry.queries("dedup_best_in_cluster")(spark, sf).collect()
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.values.foreach { rows =>
      val kept = rows.filter(_.getAs[Boolean]("kept"))
      kept.length shouldBe 1
      val maxQ = rows.map(_.getAs[Double]("quality")).max
      kept.head.getAs[Double]("quality") shouldBe maxQ
      // min-id tie-break among max-quality members
      val tied = rows.filter(_.getAs[Double]("quality") == maxQ)
      kept.head.getAs[Long]("vec_id") shouldBe tied.map(_.getAs[Long]("vec_id")).min
      // every member points at the kept representative
      rows.foreach(_.getAs[Long]("keep_id") shouldBe kept.head.getAs[Long]("vec_id"))
    }
    spark.catalog.clearCache()
  }

  test("connectedComponentsStar: empty edge set labels every node as itself") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    val nodes = Seq(7L, 8L).toDF("node")
    Curation.connectedComponentsStar(edges, nodes)
      .orderBy("node").as[(Long, Long)].collect().toSeq shouldBe
      Seq(7L -> 7L, 8L -> 8L)
  }

  test("Profile.profile: one-scan multi-distinct, exact metrics, uniqueness flag") {
    val docs = Tables.documents(spark, sf)
      .withColumn("lang_non_en", nullif(col("lang"), lit("en")))
    val prof = Profile.profile(docs, Seq("doc_id", "lang", "lang_non_en"))
    val byCol = prof.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))).toMap
    val n = docs.count()
    byCol("doc_id") shouldBe ((n, 0L, n, 1.0, true))
    val (nr, nulls, dist, comp, uniq) = byCol("lang_non_en")
    nr shouldBe n
    nulls shouldBe docs.where(col("lang") === "en").count()
    dist shouldBe 4L
    comp shouldBe (n - nulls).toDouble / n
    uniq shouldBe false
    // single scan: the multi-distinct plan goes through ONE Expand, not
    // one aggregate job per column
    prof.queryExecution.executedPlan.toString should include ("Expand")
  }

  test("Snapshot.diff classifies added/removed/changed/unchanged with null-safe compares") {
    import spark.implicits._
    val base = Seq(
      (1L, Some("a"), 10.0), (2L, Some("b"), 20.0), (3L, Some("c"), 30.0),
      (4L, None: Option[String], 40.0)).toDF("k", "s", "v")
    val next = Seq(
      (1L, Some("a"), 10.0),              // unchanged
      (2L, Some("B"), 20.0),              // s changed
      (4L, Some("now"), 40.0),            // NULL -> value counts as change
      (5L, Some("new"), 50.0))            // added; 3 removed
      .toDF("k", "s", "v")
    val d = graft.operators.Snapshot.diff(base, next, "k", Seq("s", "v"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getSeq[String](2).toList)).toMap
    d(1L) shouldBe ("unchanged", Nil)
    d(2L) shouldBe ("changed", List("s"))
    d(3L) shouldBe ("removed", Nil)
    d(4L) shouldBe ("changed", List("s"))
    d(5L) shouldBe ("added", Nil)
  }

  test("incrementalConnectedComponents: merges, unseen nodes, untouched clusters") {
    // existing labeling: {1,2}→1, {5,6}→5, {9}→9
    val labels = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L), (9L, 9L))
      .toDF("node", "cluster_id")
    // delta: bridge the two clusters via an UNSEEN node 7 (2-7, 7-6),
    // plus a brand-new isolated pair (20, 21). Cluster {9} untouched.
    val delta = Seq((2L, 7L), (7L, 6L), (20L, 21L)).toDF("a", "b")
    val got = Curation.incrementalConnectedComponents(labels, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(
      1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L, // merged via 7
      9L -> 9L,                                          // untouched
      20L -> 20L, 21L -> 20L)                            // new component
  }

  test("incrementalConnectedComponents == batch CC for any edge split") {
    // random-ish graph over 40 nodes; every 80/20 split must land on the
    // same labeling as batch CC over the full edge set
    val edges = (0 until 60).map { i =>
      (((i * 7) % 40).toLong, ((i * 13 + 3) % 40).toLong)
    }.filter(p => p._1 != p._2).toDF("a", "b")
    val nodes = (0L until 40L).toDF("node")
    val full = Curation.connectedComponentsStar(edges, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (m <- 0 until 3) {
      val old = edges.where(pmod(xxhash64(col("a"), col("b")), lit(3)) =!= m)
      val delta = edges.where(pmod(xxhash64(col("a"), col("b")), lit(3)) === m)
      val base = Curation.connectedComponentsStar(old, nodes)
      val inc = Curation.incrementalConnectedComponents(base, delta)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      inc shouldBe full
    }
  }

  test("weightedQuantiles: exact type-1 picks on hand-checkable weights") {
    // values 10,20,30,40 with weights 1,4,3,2 (total 10); cumulative
    // 1,5,8,10 -> q=.1->10, .2->20 (cw 5>=2), .5->20, .8->30, 1.0->40
    val df = Seq((10L, 1L), (20L, 4L), (30L, 3L), (40L, 2L))
      .toDF("v", "w")
    val got = Profile.weightedQuantiles(df, "v", "w",
      Seq(0.1, 0.2, 0.5, 0.8, 1.0))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    got shouldBe Map(
      0.1 -> ((10L, 1L, 10L)), 0.2 -> ((20L, 5L, 10L)),
      0.5 -> ((20L, 5L, 10L)), 0.8 -> ((30L, 8L, 10L)),
      1.0 -> ((40L, 10L, 10L)))
  }

  test("weightedQuantilesByGroup: per-group picks equal per-group global runs") {
    val df = Seq(
      ("x", 10L, 1L), ("x", 20L, 4L), ("x", 30L, 3L), ("x", 40L, 2L),
      ("y", 5L, 9L), ("y", 50L, 1L))
      .toDF("g", "v", "w")
    val qs = Seq(0.5, 0.9, 1.0)
    val grouped = Profile.weightedQuantilesByGroup(df, "g", "v", "w", qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for (g <- Seq("x", "y")) {
      val alone = Profile.weightedQuantiles(
        df.where(col("g") === g), "v", "w", qs)
        .collect().map(r => r.getDouble(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      qs.foreach(q => grouped((g, q)) shouldBe alone(q))
    }
    grouped(("y", 0.5)) shouldBe ((5L, 9L, 10L)) // 9 of 10 weight at v=5
  }

  test("weightedQuantiles: negative weight fails loudly, not silently") {
    val df = Seq((10L, 1L), (20L, -1L)).toDF("v", "w")
    val e = intercept[Exception] {
      Profile.weightedQuantiles(df, "v", "w", Seq(0.5)).collect()
    }
    e.getMessage should include("negative weight")
  }

  test("weightedQuantiles: weight-1 equals classic lower quantile; monotone in q") {
    val docs = Tables.documents(spark, sf)
      .select(col("n_chars"), lit(1L).as("one"))
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    val got = Profile.weightedQuantiles(docs, "n_chars", "one", qs)
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    got.map(_._1) shouldBe qs // one row per q, ordered
    got.map(_._2) shouldBe got.map(_._2).sorted // monotone values
    // classic check against a full sort on the driver (small fixture)
    val vals = docs.select(col("n_chars")).collect().map(_.getLong(0)).sorted
    qs.zip(got.map(_._2)).foreach { case (q, v) =>
      val idx = math.ceil(q * vals.length).toInt - 1
      v shouldBe vals(idx)
    }
  }

  test("sourceOverlapMatrix: known pair counts, full matrix, short docs drop") {
    // src A: shingles {a b c, b c d}; src B: {b c d, c d e}; src C
    // shares nothing; src D only short (<3-token) docs -> no shingles
    val docs = Seq(
      ("A", "a b c d"),          // {a b c, b c d}
      ("B", "b c d e"),          // {b c d, c d e}
      ("C", "x y z w"),          // {x y z, y z w}
      ("D", "a b")               // too short, no shingles
    ).toDF("source", "text")
    val m = Curation.sourceOverlapMatrix(docs, "source", "text", k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(7))).toMap
    // D has no shingle rows: matrix covers the 3 shingled sources = 3 pairs
    m.keySet shouldBe Set(("A", "B"), ("A", "C"), ("B", "C"))
    m(("A", "B")) shouldBe ((1L, 2L, 2L, 0.5, 1.0 / 3.0)) // share "b c d"
    m(("A", "C")) shouldBe ((0L, 2L, 2L, 0.0, 0.0))       // zero pair emitted
    m(("B", "C")) shouldBe ((0L, 2L, 2L, 0.0, 0.0))
  }

  test("sourceOverlapMatrix on the corpus: bounds, symmetry of totals") {
    val docs = Tables.documents(spark, sf)
    val rows = Curation.sourceOverlapMatrix(docs, "source", "text").collect()
    val nSrc = docs.select(col("source")).distinct().count()
    rows.length shouldBe (nSrc * (nSrc - 1) / 2)
    rows.foreach { r =>
      val (shared, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      shared should be <= math.min(na, nb)
      r.getDouble(5) should (be >= 0.0 and be <= 1.0) // containment_a
      r.getDouble(6) should (be >= 0.0 and be <= 1.0) // containment_b
      r.getDouble(7) should (be >= 0.0 and be <= 1.0) // jaccard
    }
    // n_a for a given source is the same in every row it appears in
    val asA = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(3)).toSet)
    asA.values.foreach(_.size shouldBe 1)
  }
}
