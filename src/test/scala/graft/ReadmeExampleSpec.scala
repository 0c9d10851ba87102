package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}

/** The README "Using graft as a library" example, kept compiling and
  * green — if an entry-point signature changes, this spec breaks before
  * the docs rot. The code block below mirrors the README verbatim. */
class ReadmeExampleSpec extends SparkSpec {

  test("README example: near-dup pairs -> star CC -> best-in-cluster survivors") {
    val docs = Tables.documents(spark, sf)

    // near-dup candidates -> clusters -> keep best doc per cluster
    val pairs = Dedup.nearDuplicatePairs(docs, "doc_id", "text",
      threshold = 0.5, shingleK = 3, numHashes = 16, bands = 4)
    val edges = pairs.select(col("a"), col("b"))
    val nodes = docs.select(col("doc_id").as("node"))
    val clusters = Curation.connectedComponentsStar(edges, nodes)
    val scored = clusters.join(
      // functions.length qualified only because scalatest's `length`
      // matcher shadows it inside a spec; plain `length` in user code
      docs.select(col("doc_id").as("node"),
        org.apache.spark.sql.functions.length(col("text")).as("q")), "node")
    val keep = Curation.bestInCluster(scored, "q").where(col("kept"))
    val curated = docs.join(
      keep.select(col("node").as("doc_id")), "doc_id")

    val total = docs.count()
    val kept = curated.count()
    kept should be > 0L
    kept should be <= total
    // every cluster contributes exactly one survivor
    kept shouldBe clusters.select(col("cluster_id")).distinct().count()
  }
}
