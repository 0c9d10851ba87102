package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** The cross-modal dedup ensemble contract (VERDICT r10 #8): union of
  * text (MinHash-LSH Jaccard) and image (banded pHash Hamming) edges
  * over paired (doc, media) rows, one star-CC — the ensemble clustering
  * must COARSEN each single-signal clustering (every single-signal
  * cluster maps into exactly one ensemble cluster), and both signals
  * must be non-trivial on the fixtures.
  */
class CrossModalDedupSpec extends SparkSpec {

  // sf0.01: the smoke fixture (sf0.001) has no Jaccard>=0.5 near-dups
  private def docs = Tables.documents(spark, sf01)

  private def jacEdges: DataFrame =
    Dedup.nearDuplicatePairsMd5(docs, "doc_id", "text",
      threshold = 0.5, shingleK = 3, numHashes = 16, bands = 4)
      .select(col("a"), col("b"))

  private def imgEdges: DataFrame =
    Multimodal.phashPairs(
        Multimodal.perceptualHashBands(
          docs.select(col("doc_id"), col("text").cast("binary").as("payload")),
          "payload"),
        hammingMax = 12)
      .select(col("a"), col("b"))

  private def labels(edges: DataFrame): Map[Long, Long] =
    Curation.connectedComponentsStar(
        edges, docs.select(col("doc_id").as("node")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("ensemble star-CC coarsens BOTH single-signal clusterings") {
    val jac = jacEdges.persist()
    val img = imgEdges.persist()
    jac.count() should be > 0L
    img.count() should be > 0L
    val both = labels(jac.unionByName(img).distinct())
    Seq("jaccard" -> labels(jac), "phash" -> labels(img)).foreach {
      case (name, single) =>
        // coarsening: all members of a single-signal cluster share ONE
        // ensemble cluster
        single.groupBy(_._2).foreach { case (cl, members) =>
          val ens = members.keys.map(both).toSet
          withClue(s"$name cluster $cl split across ensemble clusters: ") {
            ens.size shouldBe 1
          }
        }
        withClue(s"vs $name: ") {
          both.values.toSet.size should be <= single.values.toSet.size
        }
    }
    jac.unpersist(); img.unpersist()
  }
}
