package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fourth-decade campaign runner for the STAGED containment dedup
  * (VERDICT r10 #3): the single-pass dedup_containment cleared its
  * width-32 OOM at derived width but hit the box's ~68 GB shuffle-
  * scratch wall (ENOSPC mid-spill) — an aggregate-scratch limit, not a
  * plan defect. The staged operator bounds peak scratch at ~1/passes by
  * running the candidate join in sequential band-passes; this main runs
  * ONE PASS (or the merge) PER JVM so each pass's shuffle scratch is
  * reclaimed at process exit — the same isolation the fourth-decade
  * protocol uses per query.
  *
  * Usage: ContainmentStaged <sfDir> <outRoot> <passes> <band|merge>
  *  - band b: writes the band's verified pairs to <outRoot>/pass_<b>
  *    and prints one JSON line with the pass wall time and row count;
  *  - merge: distinct-union of all passes to <outRoot>/merged (the
  *    row set is spec-proven ≡ single-pass containmentPairsPrefix).
  */
object ContainmentStaged {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: ContainmentStaged <sfDir> <outRoot> <passes> <band|merge>")
    val Array(sfDir, outRoot, passesS, step) = args
    val passes = passesS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Parts.derive(sfDir, cpus.toInt).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = step match {
      case "merge" =>
        val merged = spark.read
          .parquet((0 until passes).map(b => s"$outRoot/pass_$b"): _*)
          .distinct()
        merged.write.mode("overwrite").parquet(s"$outRoot/merged")
        spark.read.parquet(s"$outRoot/merged").count()
      case b =>
        val pairs = graft.operators.Dedup.containmentPairsPrefixBand(
          Tables.documents(spark, sfDir), "doc_id", "text",
          k = 3, threshold = 0.5, maxShingleDf = 100,
          band = b.toInt, passes = passes)
        pairs.write.mode("overwrite").parquet(s"$outRoot/pass_$b")
        spark.read.parquet(s"$outRoot/pass_$b").count()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"step":"$step","passes":$passes,"rows":$n,"sec":$sec%.1f}""")
    spark.stop()
  }
}
