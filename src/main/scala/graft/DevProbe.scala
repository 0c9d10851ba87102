package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY dev-only phase profiler for round-12 optimization work.
  * Not part of the driver contract; deleted before round close. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val which = args.headOption.getOrElse("cross_modal")
    val reps = if (args.length > 1) args(1).toInt else 2

    for (r <- 1 to reps) {
      println(s"[probe] === rep $r ===")
      which match {
        case "cross_modal" =>
          import graft.operators.{Curation, Dedup}
          import graft.multimodal.Multimodal
          val docs = Tables.documents(spark, sfDir)
          var jac: DataFrame = null
          var img: DataFrame = null
          var edges: DataFrame = null
          var cc: DataFrame = null
          t("jac pairs") {
            jac = Dedup.nearDuplicatePairsMd5(docs, "doc_id", "text",
              threshold = 0.5, shingleK = 3, numHashes = 16, bands = 4)
              .select(col("a"), col("b"))
            noop(jac)
          }
          t("img phash pairs") {
            img = Multimodal.phashPairs(
              Multimodal.perceptualHashBands(
                docs.select(col("doc_id"),
                  col("text").cast("binary").as("payload")), "payload"),
              hammingMax = 12).select(col("a"), col("b"))
            noop(img)
          }
          t("edges distinct") {
            edges = jac.unionByName(img).distinct()
            noop(edges)
          }
          t("star-CC") {
            val nodes = docs.select(col("doc_id").as("node"))
            cc = Curation.connectedComponentsStar(edges, nodes)
            noop(cc)
          }
          t("label+best+window") {
            val labeled = cc.join(
              docs.select(col("doc_id").as("node"), col("n_chars")), Seq("node"))
            noop(Curation.bestInCluster(labeled, "n_chars")
              .withColumn("cluster_size",
                count(lit(1)).over(org.apache.spark.sql.expressions.Window
                  .partitionBy(col("cluster_id")))))
          }
          spark.catalog.clearCache()

        case "pagerank" =>
          import graft.operators.Graph
          val li = Tables.lineitem(spark, sfDir)
          val pairs = li
            .select((col("l_partkey") * 2).cast("long").as("a"),
              (col("l_suppkey") * 2 + 1).cast("long").as("b"))
            .distinct()
          val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
            .union(pairs.select(col("b").as("src"), col("a").as("dst")))
          t("pagerank 5 iters") {
            noop(Graph.pageRank(edges, iters = 5))
          }
          spark.catalog.clearCache()

        case "rebuild" =>
          import graft.operators.Similarity
          val emb = Tables.embeddings(spark, sfDir)
          val old = emb.where(col("vec_id") % 5 =!= 0)
          val hot = broadcast(emb.where(col("vec_id") === 1)
            .select(col("embedding").as("hot_vec")))
          val delta = emb.where(col("vec_id") % 5 === 0).crossJoin(hot)
            .select(col("vec_id"), col("hot_vec").as("embedding"))
          val dir = graft.util.Scratch.dir("graft_probe_rebuild_")
          t("writeIvfIndex") {
            Similarity.writeIvfIndex(old, dir, nCells = 16, seed = 42L)
          }
          t("appendIvfDelta") {
            Similarity.appendIvfDelta(delta, dir)
          }
          t("ivfIndexHealth") {
            val v = Similarity.ivfIndexHealth(delta, dir,
              maxCellSize = 64, skewThreshold = 3.0).head()
            require(v.getAs[Boolean]("rebuild_due_balance"))
          }
          t("rebuildIvfIndex") {
            Similarity.rebuildIvfIndex(spark, dir, seed = 42L)
          }
          t("incrementalKnnJoin sample") {
            val sample = old.select(col("vec_id"), col("embedding"))
              .unionByName(delta).where(col("vec_id") % 7 === 0)
            noop(Similarity.incrementalKnnJoin(
              sample, dir, k = 3, nProbe = 4, maxCellSize = 64)
              .orderBy(col("qid"), col("rank")))
          }
          spark.catalog.clearCache()

        case "stream_ingest" =>
          import graft.operators.Similarity
          import graft.streaming.AnnIngest
          import graft.streaming.StreamHarness
          val emb = Tables.embeddings(spark, sfDir)
          val old = emb.where(col("vec_id") % 5 =!= 0)
          val root = graft.util.Scratch.dir("graft_probe_annstream_")
          val idxDir = s"$root/index"
          val edgesDir = s"$root/edges"
          val in = s"$root/in"
          t("writeIvfIndex") {
            Similarity.writeIvfIndex(old, idxDir, nCells = 16, seed = 42L)
          }
          val chunk = (m: Int) => emb.where(col("vec_id") % 10 === m)
            .select(col("vec_id"), col("embedding"))
          t("chunk writes") {
            chunk(0).coalesce(1).write.mode("overwrite").parquet(in)
            StreamHarness.stampChunk(in, 0)
            chunk(5).coalesce(1).write.mode("append").parquet(in)
            StreamHarness.stampChunk(in, 1)
          }
          t("stream run") {
            val stream = spark.readStream.schema(chunk(0).schema)
              .option("maxFilesPerTrigger", "1").parquet(in)
            val q = AnnIngest.writer(
                stream, idxDir, edgesDir, k = 3, nProbe = 4, maxCellSize = 64)
              .option("checkpointLocation", s"$root/ckpt")
              .start()
            q.awaitTermination()
          }
          t("read edges") {
            noop(spark.read.parquet(edgesDir)
              .select(col("_batch_id").cast("long").as("batch_id"),
                col("qid"), col("rank"), col("neighbor_id"), col("cos"))
              .orderBy(col("qid"), col("rank")))
          }
          spark.catalog.clearCache()

        case "mutual_knn" =>
          noop(SparkEntry.queries("embed_mutual_knn_clusters")(spark, sfDir))
          spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
