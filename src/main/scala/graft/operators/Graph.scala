package graft.operators

import graft.util.Det
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Stage.StageOps

/** Graph analytics over edge tables — the iterative-driver-loop shape the
  * reference uses for EM (`Main.scala:72-89`: driver loop, one distributed
  * pass per step) applied to link analysis.
  *
  * Determinism contract: per-iteration neighbor contributions are
  * integerized ([[Det.toFixed]]) before summation, so each iteration's
  * rank vector is bit-identical regardless of partitioning — and
  * reproducible in any engine that rounds half away from zero. That makes
  * a fixed-iteration PageRank DuckDB-oracle-hashable (chained CTEs),
  * unlike a raw float formulation whose sum order drifts.
  *
  * Scale (100 TB design point): per iteration the plan is
  * edges ⋈ ranks (shuffle keyed on src), groupBy dst (shuffle), and
  * nodes ⟕ contributions (shuffle on node). The edge table — the big
  * side — is checkpointed once and its partitioning on `src` is reused
  * every iteration; only the nodes-sized rank table (orders of magnitude
  * smaller) moves per step. `localCheckpoint` truncates lineage so the
  * optimizer re-plans each iteration from a flat scan instead of a
  * 5-deep nested join tree. Celebrity in-degree skew is AQE's skew-join
  * territory; the integerized contributions keep the hot-key sum exact.
  */
object Graph {

  /** Fixed-iteration PageRank over directed `edges(src, dst)`.
    *
    * rank_{i+1}(v) = jump/N + damping * Σ_{u→v} fix(rank_i(u)/outdeg(u))
    *
    * where `fix` rounds the contribution to `contribScale` decimals and
    * the sum runs exactly in BIGINT units. Nodes are the edge-induced
    * vertex set; dangling nodes (no out-edges) simply contribute nothing
    * (their mass leaks, the standard simplification). Returns
    * `(node, rank)` at full double precision — present through
    * [[Det.fixed]] when feeding an oracle hash.
    */
  def pageRank(
      edges: DataFrame,
      iters: Int,
      damping: Double = 0.85,
      jump: Double = 0.15,
      contribScale: Int = 12): DataFrame = {
    val unit = math.pow(10.0, contribScale.toDouble) // exactly 10^k for k<=15
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // big side: stage once, reuse the src partitioning across iterations
    val outE = edges.join(deg, Seq("src")).stageCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct().stageCheckpoint()
    val n = nodes.count()
    val base = lit(jump) / lit(n.toDouble)
    var ranks = nodes
      .select(col("node"), (lit(1.0) / lit(n.toDouble)).as("rank"))
      .stageCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = outE
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          Det.toFixed(col("rank") / col("outdeg"), contribScale).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("acc"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (base + lit(damping) *
            (coalesce(col("acc"), lit(0L)).cast("double") / lit(unit)))
            .as("rank"))
        .stageCheckpoint()
    }
    ranks
  }

  /** Fixed-iteration synchronous min-label propagation over directed
    * `edges(src, dst)` (pass both directions for undirected semantics):
    * each step every node takes the minimum label among itself and its
    * in-neighbors, so after `iters` steps label(v) = min node id within
    * `iters` hops — a bounded connected-components labeling. Pure integer
    * min/join ops, so it is exactly oracle-reproducible with no
    * fixed-point tricks. The unbounded fixpoint (loop until no change)
    * is [[Curation.connectedComponents]].
    */
  def minLabelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct().stageCheckpoint()
    val e = edges.stageCheckpoint()
    var labels = nodes.select(col("node"), col("node").as("lab"))
    for (_ <- 1 to iters) {
      val nbr = e.join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst")).agg(min(col("lab")).as("nbr_lab"))
        .withColumnRenamed("dst", "node")
      labels = labels.join(nbr, Seq("node"), "left")
        .select(col("node"),
          least(col("lab"), coalesce(col("nbr_lab"), col("lab"))).as("lab"))
        .stageCheckpoint()
    }
    labels
  }
}
