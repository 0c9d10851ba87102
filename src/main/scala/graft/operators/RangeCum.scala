package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix aggregation: cumulative sum/max ordered by a key,
  * WITHOUT the `Window.orderBy(k)`-with-no-partition global window (which
  * moves the whole input into one task — the classic scale-killer Spark
  * itself warns about with "WindowExec: No Partition Defined").
  *
  * Plan shape (the canonical distributed prefix-sum):
  *   1. `repartitionByRange(n, k)` — non-overlapping, ordered key ranges;
  *   2. partition-local cumulative window (`partitionBy(pid)`), so every
  *      window task holds ~1/n of the rows;
  *   3. per-partition totals (≤ n rows — bounded by the partition count,
  *      never by the data) → exclusive prefix offsets via a triangular
  *      self-join on `pid` (32×32 nested-loop at n=32; deliberately NOT a
  *      window, so no unpartitioned WindowExec appears anywhere);
  *   4. broadcast-join the offsets back and combine.
  *
  * The parted frame is persist()ed for the query's duration:
  * `spark_partition_id()` is nondeterministic to Catalyst, so
  * ReuseExchange will NOT dedupe the three consumers (local window,
  * totals, offsets join) — without the cache each branch would re-run
  * the scan + range exchange AND re-sample its own range boundaries,
  * which must be identical across branches for the pid join to be
  * consistent. Callers (Verify/Bench harness) clearCache() per query,
  * the same lifecycle as Dedup's staged signature tables.
  *
  * Requirement: `orderCol` must be unique per row within its group
  * (callers pass distinct-value grids). With duplicate keys a ROWS-frame
  * cumulative is tie-order-dependent — exactly as it is with the global
  * window this replaces.
  */
object RangeCum {

  /** One cumulative column: `agg` ("sum" | "max") of input column `src`,
    * emitted as `as`. `inclusive=false` gives the strict-predecessor
    * frame (ROWS UNBOUNDED PRECEDING .. 1 PRECEDING): null on the global
    * first row, matching the global-window semantics. */
  final case class Cum(src: String, as: String, agg: String = "sum",
      inclusive: Boolean = true)

  /** Ungrouped prefix — the original entry point; equivalent to
    * [[withCumsGrouped]] with no group columns. */
  def withCums(df: DataFrame, orderCol: String, cums: Seq[Cum],
      partitions: Int = 0): DataFrame =
    withCumsGrouped(df, Nil, orderCol, cums, partitions)

  /** Per-group distributed prefix: the cumulative restarts at each
    * distinct `groupCols` value, like `Window.partitionBy(groupCols)
    * .orderBy(orderCol)` — but WITHOUT requiring each group to fit one
    * task. The range exchange keys on (groupCols, orderCol), so a hot
    * group spans several ordered partitions and its prefix is stitched
    * exactly like the ungrouped case; the per-(group, pid) totals table
    * is ≤ |groups|·n rows — still partition-count-bounded per group, so
    * the triangular offsets join stays a broadcast nested-loop. Use when
    * per-group ECDF/rank statistics must survive groups with billions of
    * rows (a plain grouped window is one task per group). Group keys are
    * matched null-safely (`<=>`), so a null group behaves like any other
    * value, matching window/groupBy null semantics. */
  def withCumsGrouped(df: DataFrame, groupCols: Seq[String],
      orderCol: String, cums: Seq[Cum], partitions: Int = 0): DataFrame = {
    require(cums.nonEmpty, "at least one cumulative column")
    val n = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val pid = "_rc_pid"

    def aggOf(c: Cum)(e: Column): Column = c.agg match {
      case "sum" => sum(e)
      case "max" => max(e)
      case other => throw new IllegalArgumentException(s"unknown agg: $other")
    }

    val parted = df
      .repartitionByRange(n, (groupCols :+ orderCol).map(col): _*)
      .withColumn(pid, spark_partition_id())
      .persist()

    val partSpec = (groupCols :+ pid).map(col)
    val wIncl = Window.partitionBy(partSpec: _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wExcl = Window.partitionBy(partSpec: _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = cums.foldLeft(parted) { (acc, c) =>
      acc.withColumn("_rc_loc_" + c.as,
        aggOf(c)(col(c.src)).over(if (c.inclusive) wIncl else wExcl))
    }

    val totals = parted.groupBy(partSpec: _*).agg(
      aggOf(cums.head)(col(cums.head.src)).as("_rc_tot_" + cums.head.as),
      cums.tail.map(c => aggOf(c)(col(c.src)).as("_rc_tot_" + c.as)): _*)
    // exclusive prefix of the totals within each group: offset(g, p) =
    // agg over the group's totals with pid < p (null for the group's
    // first partition). Left-join keeps empty-prefix rows.
    val t1 = totals.select(
      groupCols.map(g => col(g).as("_rc_g1_" + g)) :+ col(pid).as("_rc_p1"): _*)
    val t2 = totals.select(
      (groupCols.map(g => col(g).as("_rc_g2_" + g)) :+ col(pid).as("_rc_p2"))
        ++ cums.map(c => col("_rc_tot_" + c.as)): _*)
    val cond = groupCols
      .map(g => col("_rc_g1_" + g) <=> col("_rc_g2_" + g))
      .foldLeft(col("_rc_p2") < col("_rc_p1"))(_ && _)
    val offsets = t1.join(t2, cond, "left")
      .groupBy(groupCols.map(g => col("_rc_g1_" + g)) :+ col("_rc_p1"): _*)
      .agg(
        aggOf(cums.head)(col("_rc_tot_" + cums.head.as))
          .as("_rc_off_" + cums.head.as),
        cums.tail.map(c =>
          aggOf(c)(col("_rc_tot_" + c.as)).as("_rc_off_" + c.as)): _*)

    // join keys renamed with a _rc_j_ prefix so the null-safe join
    // condition is unambiguous; dropped after the join
    val joinKeys = groupCols.map("_rc_g1_" + _) :+ "_rc_p1"
    val origKeys = groupCols :+ pid
    val cond2 = origKeys.zip(joinKeys)
      .map { case (k, j) => col(k) <=> col(j) }.reduce(_ && _)
    val joined = local.join(broadcast(offsets), cond2)
    val combined = cums.foldLeft(joined) { (acc, c) =>
      val l = col("_rc_loc_" + c.as)
      val o = col("_rc_off_" + c.as)
      val v = c.agg match {
        case "sum" => coalesce(l + o, l, o)
        case _     => greatest(l, o)
      }
      acc.withColumn(c.as, v)
    }
    combined.drop((pid +: joinKeys) ++ cums.flatMap(c =>
      Seq("_rc_loc_" + c.as, "_rc_off_" + c.as)): _*)
  }
}
