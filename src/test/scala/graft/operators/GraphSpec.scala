package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDf(pairs: (Long, Long)*) =
    pairs.toDF("src", "dst")

  private def undirected(pairs: (Long, Long)*) =
    edgesDf(pairs: _*).union(edgesDf(pairs.map(_.swap): _*))

  test("pageRank on a symmetric 2-node graph gives equal ranks summing to 1") {
    val r = Graph.pageRank(undirected((1L, 2L)), iters = 10)
      .orderBy("node").as[(Long, Double)].collect()
    r.map(_._1) shouldBe Array(1L, 2L)
    r(0)._2 shouldBe r(1)._2
    r.map(_._2).sum shouldBe 1.0 +- 1e-9
  }

  test("pageRank ranks a star center above the leaves") {
    val star = undirected((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val r = Graph.pageRank(star, iters = 10)
      .orderBy("node").as[(Long, Double)].collect().toMap
    val leaves = Seq(1L, 2L, 3L, 4L).map(r)
    all(leaves) shouldBe leaves.head +- 1e-12
    r(0L) should be > leaves.head * 2
    r.values.sum shouldBe 1.0 +- 1e-9
  }

  test("pageRank is deterministic across runs and partitionings") {
    val e = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val a = Graph.pageRank(e, iters = 5).orderBy("node")
      .as[(Long, Double)].collect()
    val b = Graph.pageRank(e.repartition(7), iters = 5).orderBy("node")
      .as[(Long, Double)].collect()
    // bit-identical, not just close: contributions are integerized
    a shouldBe b
  }

  test("mass leaks only through dangling nodes") {
    // 1 -> 2 -> 3, node 3 dangling: total rank < 1 but > base mass
    val chain = edgesDf((1L, 2L), (2L, 3L))
    val total = Graph.pageRank(chain, iters = 10)
      .agg(sum("rank")).as[Double].head()
    total should be < 1.0
    total should be > 0.15
  }

  test("minLabelPropagation labels k-hop reachable minima") {
    // path 1-2-3-4-5 plus isolated pair 10-11
    val e = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
    val after1 = Graph.minLabelPropagation(e, iters = 1)
      .as[(Long, Long)].collect().toMap
    after1(3L) shouldBe 2L // one hop: min(2,3,4)
    after1(11L) shouldBe 10L
    val after4 = Graph.minLabelPropagation(e, iters = 4)
      .as[(Long, Long)].collect().toMap
    Seq(1L, 2L, 3L, 4L, 5L).map(after4) shouldBe Seq(1L, 1L, 1L, 1L, 1L)
    after4(10L) shouldBe 10L
    after4(11L) shouldBe 10L
  }

  test("bfsHops: multi-source unit-weight distances, unreached absent") {
    // path 1-2-3-4-5, pair 10-11, isolated-from-seeds node 20-21
    val e = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L),
      (20L, 21L))
    val seeds = Seq(1L, 10L).toDF("node")
    val got = Graph.bfsHops(e, seeds, maxHops = 3)
      .as[(Long, Int)].collect().toMap
    got shouldBe Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 10L -> 0, 11L -> 1)
    // cap: node 5 is 4 hops out, absent at maxHops = 3; present at 4
    val got4 = Graph.bfsHops(e, seeds, maxHops = 4)
      .as[(Long, Int)].collect().toMap
    got4(5L) shouldBe 4
    got4.keySet should not contain 20L
  }

  test("bfsHops: first-reach wins over longer alternative paths") {
    // diamond 1->2->4, 1->3->4 plus a long way round 1->5->6->4
    val e = edgesDf((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (5L, 6L), (6L, 4L))
    val got = Graph.bfsHops(e, Seq(1L).toDF("node"), maxHops = 5)
      .as[(Long, Int)].collect().toMap
    got(4L) shouldBe 2 // not 3 via 5-6
    got(6L) shouldBe 2
  }

  test("bfsHops is partitioning-invariant") {
    val e = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 5L))
    val seeds = Seq(1L).toDF("node")
    val a = Graph.bfsHops(e.repartition(1), seeds, maxHops = 4)
      .orderBy("node").collect().map(_.toSeq).toSeq
    val b = Graph.bfsHops(e.repartition(7), seeds, maxHops = 4)
      .orderBy("node").collect().map(_.toSeq).toSeq
    a shouldBe b
  }
}
