package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one query N times in a single JVM (steady-state vs
  * first-run cost). Usage:
  * `sbt "runMain graft.QueryTimer <sfDir> <query> [reps]"`. */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Static conf: default codegen cache is 100 entries — a 90+-query
      // suite evicts the iterative EM loop's stable entry mid-run, so its
      // 10 iterations recompile (observed as random 10-18 s em_gmm
      // transients). 1000 entries fits the whole catalog.
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[timer] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
