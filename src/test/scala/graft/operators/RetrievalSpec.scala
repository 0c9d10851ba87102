package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Behavioral contracts of the round-3 retrieval / linkage / profiling
  * additions (text_bm25_topk, text_bigram_lm, text_inverted_index,
  * join_fuzzy_blocked, sort_pareto_skyline, embed_hard_negatives,
  * events_attribution, stats_zscore_outliers). The DuckDB oracle proves
  * cross-engine value equality; these prove the SEMANTICS are the
  * intended ones on sf0.001.
  */
class RetrievalSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("bm25: scores positive, ranked descending, capped at 50 rows") {
    val rows = q("text_bm25_topk").collect()
    rows.length should be <= 50
    rows.length should be > 0
    val scores = rows.map(_.getAs[Double]("bm25"))
    scores.foreach(_ should be > 0.0)
    scores.sliding(2).foreach { case Array(a, b) => a should be >= b; case _ => }
    rows.map(_.getAs[Long]("n_terms_hit")).foreach(_ should be <= 3L)
  }

  test("bm25: every ranked doc contains at least one query term") {
    val ids = q("text_bm25_topk").select("doc_id").collect().map(_.getLong(0)).toSet
    val containing = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("text").rlike("\\b(join|hash|scan)\\b"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    ids.subsetOf(containing) shouldBe true
  }

  test("bigram lm: logprobs negative, defined only for docs with bigrams") {
    val rows = q("text_bigram_lm").collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getAs[Long]("n_bigrams") should be > 0L
      r.getAs[Double]("avg_bigram_logprob") should be < 0.0
    }
  }

  test("inverted index: df consistent with posting list") {
    val rows = q("text_inverted_index").collect()
    rows.length should be > 0
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      // comma-joined string since round 4 (the driver's hash compare
      // cannot order list cells)
      val postings = r.getAs[String]("postings").split(',').map(_.toLong).toSeq
      postings.length.toLong shouldBe math.min(df, 100L)
      postings shouldBe postings.sorted // deterministic order
      postings.distinct.length shouldBe postings.length
    }
  }

  test("fuzzy blocked join: pairs share the blocking noun and pass the gate") {
    val rows = q("join_fuzzy_blocked").collect()
    rows.length should be > 0
    rows.foreach { r =>
      val a = r.getAs[String]("a_name"); val b = r.getAs[String]("b_name")
      a.split(" ")(1) shouldBe b.split(" ")(1)
      r.getAs[Int]("edit_dist") should be <= 3
      r.getAs[Long]("n_pairs") should be > 0L
    }
  }

  test("skyline: no returned part is dominated; every dropped part is") {
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val sky = q("sort_pareto_skyline").collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Double]("p_retailprice"),
        r.getAs[Int]("p_size"))).toSet
    def dominates(q: (Long, Double, Int), p: (Long, Double, Int)): Boolean =
      q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3)
    val skySet = sky.map(t => (t._2, t._3))
    parts.foreach { p =>
      val dominated = parts.exists(o => dominates(o, p))
      if (sky.exists(_._1 == p._1)) assert(!dominated, s"skyline part $p dominated")
      else assert(dominated, s"dropped part $p not dominated")
    }
    skySet.size should be > 0
  }

  test("attribution: channels are non-purchase types; purchases conserved") {
    val rows = q("events_attribution").collect()
    val channels = rows.map(_.getAs[String]("channel")).toSet
    channels.foreach(c =>
      assert(Set("click", "signup", "error", "view", "none").contains(c)))
    val attributed = rows.map(_.getAs[Long]("n_purchases")).sum
    val purchases = spark.read.parquet(s"$sf/events.parquet")
      .where(col("event_type") === "purchase").count()
    attributed shouldBe purchases
  }

  test("zscore outliers: counts bounded, sd positive, flags match manual calc") {
    val rows = q("stats_zscore_outliers").collect()
    rows.length shouldBe 5 // five event types
    rows.foreach { r =>
      r.getAs[Double]("sd") should be > 0.0
      r.getAs[Long]("n_outliers") should be < r.getAs[Long]("n")
      // Chebyshev: at most 1/9 of rows can sit beyond 3 sd
      r.getAs[Long]("n_outliers").toDouble should be <= r.getAs[Long]("n") / 9.0 + 1
    }
  }

  test("frequent pairs: canonical ordering, positive support, ranked") {
    val rows = q("agg_frequent_pairs").collect()
    rows.length should be > 0
    rows.length should be <= 20
    rows.foreach { r =>
      r.getAs[Long]("pa") should be < r.getAs[Long]("pb")
      r.getAs[Long]("support") should be > 0L
    }
    val sup = rows.map(_.getAs[Long]("support"))
    sup.sliding(2).foreach { case Array(a, b) => a should be >= b; case _ => }
  }

  test("transition matrix: probabilities normalize per source state") {
    val rows = q("events_transition_matrix").collect()
    rows.length should be > 0
    rows.groupBy(_.getAs[String]("from_type")).values.foreach { g =>
      g.map(_.getAs[Double]("p")).sum shouldBe 1.0 +- 1e-9
      g.foreach(_.getAs[Double]("p") should be > 0.0)
    }
  }

  test("hard negatives: labels differ from the query vector's label") {
    val labelOf = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = q("embed_hard_negatives").collect()
    rows.length should be > 0
    rows.foreach { r =>
      val qid = r.getAs[Long]("qid")
      labelOf(r.getAs[Long]("neg_id")) should not be labelOf(qid)
      r.getAs[Int]("rank") should be <= 3
    }
    // per query: ranks contiguous from 1
    rows.groupBy(_.getAs[Long]("qid")).values.foreach { g =>
      g.map(_.getAs[Int]("rank")).sorted shouldBe (1 to g.length).toArray
    }
  }
}
