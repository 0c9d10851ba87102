package graft.util

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Curation

class StageSpec extends SparkSpec {
  import spark.implicits._

  private def ccLabels(): Seq[(Long, Long)] = {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L),
      (21L, 22L), (4L, 5L)).toDF("a", "b")
    val nodes = (1L to 5L).union(Seq(10L, 11L, 20L, 21L, 22L)).toDF("node")
    Curation.connectedComponentsStar(edges, nodes)
      .select(col("node"), col("cluster_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
  }

  test("Stage: reliable-checkpoint mode returns identical results to localCheckpoint") {
    spark.conf.unset(Stage.ConfKey)
    val viaLocal = ccLabels()
    val dir = Files.createTempDirectory("graft-stage-ckpt").toString
    try {
      spark.conf.set(Stage.ConfKey, dir)
      val viaReliable = ccLabels()
      viaReliable shouldBe viaLocal
      viaLocal.map(_._2).distinct.size shouldBe 3 // sanity: 3 components
      // the reliable path actually wrote checkpoint data
      val wrote = new java.io.File(new java.net.URI(
        spark.sparkContext.getCheckpointDir.get)).listFiles()
      wrote should not be empty
    } finally spark.conf.unset(Stage.ConfKey)
  }
}
