package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Graph
import graft.util.Det
import org.apache.spark.sql.functions._

/** Graph analytics over the part–supplier bipartite graph induced by
  * lineitem (edges = distinct (l_partkey, l_suppkey) pairs, both
  * directions; part nodes = 2·key, supplier nodes = 2·key+1 so the two
  * key spaces can't collide).
  *
  * Both queries are fixed-iteration driver loops — the reference's own
  * execution shape (`Main.scala:72-89`) — and both are DuckDB-oracle
  * hash-exact: PageRank because contributions are integerized before
  * summation (Det fixed-point, order-free), label propagation because it
  * is pure integer min/join. The oracle unrolls the iterations as
  * chained CTEs.
  */
object GraphQueries {

  /** The shared graph CTE prefix (pairs → symmetric edges → nodes). */
  private def graphCtes(pairFilter: String): String =
    raw"""pairs AS (
         |  SELECT DISTINCT CAST(l_partkey * 2 AS BIGINT) AS a,
         |                  CAST(l_suppkey * 2 + 1 AS BIGINT) AS b
         |  FROM lineitem$pairFilter
         |),
         |edges AS (SELECT a AS src, b AS dst FROM pairs
         |          UNION ALL SELECT b AS src, a AS dst FROM pairs),
         |nodes AS (SELECT DISTINCT src AS node FROM edges)""".stripMargin

  private def pagerankSql(iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      raw"""r$i AS (
           |  SELECT nd.node,
           |    CAST(0.15 AS DOUBLE) / (SELECT cnt FROM n)
           |      + CAST(0.85 AS DOUBLE) *
           |        (CAST(COALESCE(s.acc, 0) AS DOUBLE) / CAST(1000000000000 AS DOUBLE)) AS pr
           |  FROM nodes nd LEFT JOIN (
           |    SELECT e.dst AS node,
           |      SUM(${Det.toFixedSql(s"r.pr / d.outdeg", 12)}) AS acc
           |    FROM edges e
           |    JOIN r${i - 1} r ON e.src = r.node
           |    JOIN deg d ON d.src = e.src
           |    GROUP BY e.dst) s ON s.node = nd.node
           |)""".stripMargin
    }.mkString(",\n")
    raw"""WITH ${graphCtes("")},
         |n AS (SELECT COUNT(*) AS cnt FROM nodes),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
         |r0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT cnt FROM n) AS pr FROM nodes),
         |$iterCtes
         |SELECT node,
         |  CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
         |  ${Det.fixedSql(s"r$iters.pr", 9)} AS pagerank
         |FROM r$iters ORDER BY node""".stripMargin
  }

  private def labelPropSql(iters: Int, pairFilter: String): String = {
    val iterCtes = (1 to iters).map { i =>
      raw"""l$i AS (
           |  SELECT l.node, LEAST(l.lab, COALESCE(m.nbr_lab, l.lab)) AS lab
           |  FROM l${i - 1} l LEFT JOIN (
           |    SELECT e.dst AS node, MIN(p.lab) AS nbr_lab
           |    FROM edges e JOIN l${i - 1} p ON e.src = p.node
           |    GROUP BY e.dst) m ON m.node = l.node
           |)""".stripMargin
    }.mkString(",\n")
    raw"""WITH ${graphCtes(pairFilter)},
         |l0 AS (SELECT node, node AS lab FROM nodes),
         |$iterCtes
         |SELECT lf.node,
         |  CASE WHEN lf.node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
         |  lf.lab AS label
         |FROM l$iters lf ORDER BY lf.node""".stripMargin
  }

  /** Distinct part–supplier pairs as symmetric node-encoded edges. */
  private def bipartiteEdges(li: org.apache.spark.sql.DataFrame) = {
    val pairs = li
      .select((col("l_partkey") * 2).cast("long").as("a"),
        (col("l_suppkey") * 2 + 1).cast("long").as("b"))
      .distinct()
    pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- PageRank, 5 fixed iterations, oracle-exact fixed-point ----
    QueryDef("graph_pagerank",
      (s, d) => Graph.pageRank(bipartiteEdges(Tables.lineitem(s, d)), iters = 5)
        .select(col("node"),
          when(col("node") % 2 === 0, lit("part")).otherwise(lit("supplier"))
            .as("kind"),
          Det.fixed(col("rank"), 9).as("pagerank"))
        .orderBy(col("node")),
      oracle = Some(pagerankSql(5)),
      bench = false),

    // ---- bounded min-label propagation (3 hops) on the sparse
    //      high-quantity subgraph → many components, pure integer ops ----
    QueryDef("graph_min_label_prop",
      (s, d) => Graph.minLabelPropagation(
        bipartiteEdges(Tables.lineitem(s, d).where(col("l_quantity") >= 45)),
        iters = 3)
        .select(col("node"),
          when(col("node") % 2 === 0, lit("part")).otherwise(lit("supplier"))
            .as("kind"),
          col("lab").as("label"))
        .orderBy(col("node")),
      oracle = Some(labelPropSql(3, " WHERE l_quantity >= 45")),
      bench = false)
  )
}
