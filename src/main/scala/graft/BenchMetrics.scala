package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

/** Data-movement evidence for the scale runs: run each named query once
  * and record its PHYSICAL work — input bytes/records read from parquet,
  * shuffle bytes/records written and read, and spill — via a
  * SparkListener over task metrics.
  *
  * Motivation (round 7): wall-clock medians on this host class wobble
  * with neighbor load (observed 1.5 s vs 23 s reps of the same query,
  * same data, minutes apart), so "time grows ~linearly across decades"
  * carries host-noise error bars. Task-level data-movement totals are a
  * property of the PLAN and the data, not the host: if shuffle records
  * grow 10× for 10× input, no quadratic pair-explosion or broadcast
  * blow-up is hiding anywhere — whatever the wall clock drew that day.
  * SCALE100X.json pairs both views per operator.
  *
  * Usage: `sbt "runMain graft.BenchMetrics <outFile> [query...]"`
  * (reads SPARK_GRAFT_SF_DIR like Bench/BenchReps; defaults to the
  * BenchReps heavy-query set). One measured run per query after one
  * untimed warm run of the FIRST query only (codegen warm-up does not
  * change data movement, so unlike wall-clock reps a single run is the
  * steady state).
  */
object BenchMetrics {
  private final class Acc extends SparkListener {
    val inputBytes = new LongAdder
    val inputRecords = new LongAdder
    val shuffleWriteBytes = new LongAdder
    val shuffleWriteRecords = new LongAdder
    val shuffleReadBytes = new LongAdder
    val shuffleReadRecords = new LongAdder
    val diskSpill = new LongAdder
    val memSpill = new LongAdder
    val peakTaskMem = new AtomicLong(0L)
    val tasks = new LongAdder

    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        inputBytes.add(m.inputMetrics.bytesRead)
        inputRecords.add(m.inputMetrics.recordsRead)
        shuffleWriteBytes.add(m.shuffleWriteMetrics.bytesWritten)
        shuffleWriteRecords.add(m.shuffleWriteMetrics.recordsWritten)
        shuffleReadBytes.add(m.shuffleReadMetrics.totalBytesRead)
        shuffleReadRecords.add(m.shuffleReadMetrics.recordsRead)
        diskSpill.add(m.diskBytesSpilled)
        memSpill.add(m.memoryBytesSpilled)
        peakTaskMem.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
        tasks.increment()
      }
    }

    def snapshot(): Map[String, Long] = Map(
      "input_bytes" -> inputBytes.sum, "input_records" -> inputRecords.sum,
      "shuffle_write_bytes" -> shuffleWriteBytes.sum,
      "shuffle_write_records" -> shuffleWriteRecords.sum,
      "shuffle_read_bytes" -> shuffleReadBytes.sum,
      "shuffle_read_records" -> shuffleReadRecords.sum,
      "disk_spill_bytes" -> diskSpill.sum, "mem_spill_bytes" -> memSpill.sum,
      "peak_task_mem_bytes" -> peakTaskMem.get, "tasks" -> tasks.sum)
  }

  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse("METRICS.json")
    val queries =
      if (args.length > 1) args.drop(1).toSeq else BenchReps.defaultQueries
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

    val entries = queries.map { name =>
      val acc = new Acc
      spark.sparkContext.addSparkListener(acc)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // The listener bus is async: poll until the task-count stops
      // moving (all events for the finished jobs drained) before
      // snapshotting. Bounded wait — 10 s is far beyond observed
      // drain times (<50 ms) but keeps a wedged bus from hanging us.
      var last = -1L; var stable = 0; var waited = 0
      while (stable < 3 && waited < 10000) {
        val cur = acc.tasks.sum
        if (cur == last) stable += 1 else { stable = 0; last = cur }
        Thread.sleep(100); waited += 100
      }
      spark.sparkContext.removeSparkListener(acc)
      spark.catalog.clearCache()
      val snap = acc.snapshot()
      System.err.println(f"[metrics] $name: ${snap("shuffle_write_records")}%,d shuffle recs, " +
        f"${snap("input_records")}%,d input recs, ${snap("tasks")}%,d tasks, $sec%.2f s")
      // Locale.ROOT: the f-interpolator uses the default locale, which
      // under e.g. de_DE emits "1,23" — invalid JSON (same trap
      // Bench/BenchReps already guard)
      val wallS = String.format(java.util.Locale.ROOT, "%.2f", sec: java.lang.Double)
      val fields = (snap.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" } :+
        s""""wall_s":$wallS""").mkString(",")
      s""""$name":{$fields}"""
    }
    val sfName = sfDir.split('/').last
    val json =
      s"""{"sf":"$sfName","cpus":$cpus,"queries":{${entries.mkString(",")}}}"""
    println(json)
    Files.writeString(Paths.get(outFile), json + "\n")
    spark.stop()
  }
}
