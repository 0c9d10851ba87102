package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling (the Deequ-style audit pass every ingest
  * pipeline runs before trusting a table): per-column row count, null
  * count, exact distinct count, completeness ratio, and a uniqueness
  * flag — computed in ONE scan.
  *
  * Multiple `count(distinct c)` in a single aggregate plan through
  * Spark's Expand operator: one pass over the data with an
  * #columns-way row expansion feeding a partial+final aggregate, so
  * profiling k columns costs one scan + a k·distinct-values-sized
  * shuffle, not k scans. The single result row is reshaped to
  * one-row-per-column with `stack` (a generator over the aggregated
  * literals — no driver collect, no second job).
  *
  * All metrics are exact integers (and ratios of exact integers), so
  * profiles are bit-identical across engines and partitionings.
  */
object Profile {

  /** One profile row per listed column:
    * (column_name, n_rows, n_nulls, n_distinct, completeness, is_unique).
    * `completeness` = non-null fraction; `is_unique` = every non-null
    * value occurs exactly once (n_distinct == n_rows − n_nulls). */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs = columns.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct")))
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = columns
      .map(c => s"'$c', `${c}__nulls`, `${c}__distinct`").mkString(", ")
    one.select(col("n_rows"), expr(
        s"stack(${columns.length}, $stackArgs) AS (column_name, n_nulls, n_distinct)"))
      .select(
        col("column_name"),
        col("n_rows"),
        col("n_nulls"),
        col("n_distinct"),
        ((col("n_rows") - col("n_nulls")).cast("double")
          / col("n_rows").cast("double")).as("completeness"),
        (col("n_distinct") === col("n_rows") - col("n_nulls")).as("is_unique"))
  }
}
