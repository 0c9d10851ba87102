package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parquet table sink — the write path the reference lacks entirely (its
  * only sink is `println`, Main.scala:46-52). Layout knobs are the ones
  * that matter at 100 TB:
  *
  *  - `partitionBy` columns become directory partitions → partition
  *    pruning on read (predicates on them never touch excluded files);
  *  - `sortWithinPartitions` orders rows inside each file → tighter
  *    parquet min/max row-group stats → row-group skipping on range
  *    predicates;
  *  - `filesPerPartition` repartitions before the write so output file
  *    count is controlled (the small-files problem is an operational
  *    killer on object stores).
  */
object ParquetSink {

  def write(
      df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      sortBy: Seq[String] = Nil,
      filesPerPartition: Int = 1): Unit = {
    val repartitioned =
      if (partitionBy.isEmpty) df.repartition(filesPerPartition)
      else if (filesPerPartition <= 1)
        df.repartition(partitionBy.map(col): _*)
      else {
        // hash-repartitioning on the partition columns ALONE puts every
        // directory partition in ONE task — filesPerPartition would be a
        // silent no-op and a skewed partition value a single-task OOM.
        // A salt column spreads each directory partition over up to
        // filesPerPartition writers. The partition count is EXPLICIT
        // (REPARTITION_BY_NUM): AQE would otherwise coalesce a small
        // shuffle back into one task and re-void the knob.
        // The salt must be a DETERMINISTIC function of row content: a
        // positional salt (monotonically_increasing_id) recomputes
        // differently on stage/task retry, so the retried map task feeds
        // rows to different shuffle partitions than the original attempt
        // and the write silently loses/duplicates rows (the SPARK-23207
        // round-robin class). Content-hash salting reproduces identical
        // shuffle output on every attempt.
        val n = df.sparkSession.conf.get(
          "spark.sql.shuffle.partitions", "200").toInt
        df.withColumn("_fpp_salt",
            pmod(xxhash64(df.columns.map(col): _*), lit(filesPerPartition.toLong)))
          .repartition(n, (partitionBy :+ "_fpp_salt").map(col): _*)
          .drop("_fpp_salt")
      }
    val sorted =
      if (sortBy.isEmpty) repartitioned
      else repartitioned.sortWithinPartitions(
        (partitionBy ++ sortBy).map(col): _*)
    val writer = sorted.write.mode("overwrite")
    (if (partitionBy.isEmpty) writer else writer.partitionBy(partitionBy: _*))
      .parquet(path)
  }

  /** Bucketed (hash-clustered) table write — the co-located-join layout:
    * rows are hash-partitioned into `buckets` files per partition by
    * `bucketCols` and sorted within each bucket, recorded in the catalog
    * so a later equi-join of two tables bucketed the same way plans
    * WITHOUT a shuffle on either side (and without re-sorting when
    * `sortCols` cover the join key). This is the 100 TB answer to the
    * fact-fact join: pay the shuffle once at ingest, never again per
    * query. Requires saveAsTable (bucket metadata lives in the catalog,
    * not the files). */
  def writeBucketed(
      df: DataFrame, table: String,
      bucketCols: Seq[String], buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.isEmpty) w else w.sortBy(sortCols.head, sortCols.tail: _*))
      .saveAsTable(table)
  }
}
