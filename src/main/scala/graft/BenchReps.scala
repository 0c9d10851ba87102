package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Steady-state evidence for the bench numbers: run the transient-prone
  * headline queries N reps each in ONE JVM and write per-rep timings +
  * medians as JSON (committed per round as REPS_r{N}.json). BENCH r2→r3
  * moved +29% on identical code; this artifact makes the host-noise
  * explanation checkable instead of narrative — a steady-state median
  * inside the recorded envelope says the plan didn't regress, whatever
  * single-shot number the round's bench drew.
  *
  * Usage: `sbt "runMain graft.BenchReps [outFile] [reps] [query...]"`
  * (defaults: stdout+REPS.json, 5 reps, the 17-query `defaultQueries`
  * set below — top-15 by bench cost plus the r4 watch pair; a full
  * default run is a ~2-minute sf0.1 session). */
object BenchReps {
  /** Top-15 of the benched set by r4 single-shot cost plus the r4 watch
    * items (gamma_fixed, decontam_overlap) — the steady-state medians are
    * the regression gate (BASELINE.md), so every expensive query needs
    * one. */
  val defaultQueries: Seq[String] = Seq(
    "em_gmm", "agg_approx_percentile", "dedup_clusters",
    "dedup_minhash_lsh", "curation_pipeline", "dedup_embedding_lsh",
    "dedup_span_coverage", "join_salted_skew", "decontam_overlap",
    "agg_approx_distinct", "dedup_simhash", "ann_ivf_topk",
    "text_quality_score", "q7_volume_shipping", "events_asof_join",
    "gamma_fixed", "text_jaccard_pairs")

  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse("REPS.json")
    val reps = if (args.length > 1) args(1).toInt else 5
    require(reps >= 1, s"reps must be >= 1, got $reps")
    val queries = if (args.length > 2) args.drop(2).toSeq else defaultQueries
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.adaptive.enabled", "true")
      // see Bench.scala: scale-run pre-coalesce shuffle width
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Parts.derive(sfDir, cpus.toInt).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", v)
    val entries = queries.map { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        sec
      }
      val sorted = times.sorted
      // the median absorbs both rep-1 codegen/JIT cost and single-rep
      // host transients; the full rep list is kept so cold-vs-warm is
      // visible in the artifact (true median: middle-two mean when even)
      val median =
        if (reps % 2 == 1) sorted(reps / 2)
        else (sorted(reps / 2 - 1) + sorted(reps / 2)) / 2.0
      System.err.println(
        s"[reps] $name: ${times.map(fmt).mkString(", ")} (median ${fmt(median)})")
      val repsJson = times.map(fmt).mkString("[", ",", "]")
      s""""$name":{"reps":$repsJson,"median":${fmt(median)}}"""
    }
    val sfName = sfDir.split('/').last
    val json =
      s"""{"sf":"$sfName","cpus":$cpus,"reps_per_query":$reps,"queries":{${entries.mkString(",")}}}"""
    println(json)
    Files.writeString(Paths.get(outFile), json + "\n")
    spark.stop()
  }
}
