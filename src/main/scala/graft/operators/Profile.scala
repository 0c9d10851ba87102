package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Stage.StageOps

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

  /** EXACT weighted quantiles: for each requested q, the smallest value
    * v such that `Σ weight over rows with value ≤ v  ≥  q · Σ weight` —
    * the lower weighted-quantile (type-1) definition, which is exact
    * integer arithmetic when weights are integers (no interpolation, no
    * sketch error). The curation use: "token-weighted p50/p90 of
    * document length" — what length bounds half / 90% of the TOKENS
    * (approx_percentile is row-weighted and sketched; this is neither).
    *
    * Scale shape: ONE groupBy to the distinct-value grid (|grid| rows,
    * ≪ corpus), a range-partitioned prefix sum over the grid
    * ([[RangeCum]] — no unpartitioned window), and a |qs|-row
    * broadcast-threshold aggregation. Weights must be non-negative;
    * zero-weight values cannot be selected unless they tie a boundary.
    *
    * Returns one row per q: (q, value, cum_weight, total_weight). */
  def weightedQuantiles(
      df: DataFrame, valueCol: String, weightCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must be in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    // grid (agg-derived, |grid| rows) feeds the prefix sum AND the
    // total — shared so the corpus groupBy runs once (Stage.share rule).
    // Negative weights would silently corrupt the cumulative's
    // monotonicity (and with it every threshold pick), so they fail
    // loudly at the one place the contract can be checked per-row.
    val wChecked = when(col(weightCol).cast("long") < 0L, raise_error(lit(
        s"weightedQuantiles: negative weight in '$weightCol' — weights " +
          "must be non-negative")))
      .otherwise(col(weightCol).cast("long"))
    val grid = df.groupBy(col(valueCol).as("value"))
      .agg(sum(wChecked).as("w"))
      .stageShare()
    val cum = RangeCum.withCums(grid, "value",
      Seq(RangeCum.Cum("w", "cw")))
    val total = grid.agg(sum(col("w")).as("tw"))
    val qDf = qs.sorted.toDF("q")
    // threshold rule in exact integer space: cw * 1 >= q * tw — compare
    // as doubles of exact longs (both sides < 2^53 for realistic
    // corpora; at larger totals scale weights down upstream)
    cum.crossJoin(broadcast(total)).crossJoin(broadcast(qDf))
      .where(col("cw").cast("double") >= col("q") * col("tw").cast("double"))
      .groupBy(col("q"))
      .agg(min(col("value")).as("value"))
      .join(cum.select(col("value"), col("cw").as("cum_weight")), Seq("value"))
      .crossJoin(broadcast(total.select(col("tw").as("total_weight"))))
      .select(col("q"), col("value"), col("cum_weight"), col("total_weight"))
      .orderBy(col("q"))
  }

  /** Per-GROUP exact weighted quantiles — [[weightedQuantiles]] with a
    * grouping column (e.g. token-weighted length percentiles per
    * language). Same type-1 lower-quantile rule per group.
    *
    * Scale shape: the grid is (group, value)-keyed, the cumulative is a
    * group-PARTITIONED window over the grid (each partition is one
    * group's distinct values — never a global single-task window), and
    * the threshold pick is a |groups|·|qs| aggregation. */
  def weightedQuantilesByGroup(
      df: DataFrame, groupCol: String, valueCol: String, weightCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must be in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val wChecked = when(col(weightCol).cast("long") < 0L, raise_error(lit(
        s"weightedQuantilesByGroup: negative weight in '$weightCol' — " +
          "weights must be non-negative")))
      .otherwise(col(weightCol).cast("long"))
    // grid feeds the windowed cumulative AND the per-group totals
    val grid = df.groupBy(col(groupCol).as("grp"), col(valueCol).as("value"))
      .agg(sum(wChecked).as("w"))
      .stageShare()
    val cum = grid.withColumn("cw",
      sum(col("w")).over(Window.partitionBy(col("grp")).orderBy(col("value"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = grid.groupBy(col("grp")).agg(sum(col("w")).as("tw"))
    val qDf = qs.sorted.toDF("q")
    cum.join(broadcast(totals), Seq("grp"))
      .crossJoin(broadcast(qDf))
      .where(col("cw").cast("double") >= col("q") * col("tw").cast("double"))
      .groupBy(col("grp"), col("q"))
      .agg(min(col("value")).as("value"))
      .join(cum.select(col("grp"), col("value"), col("cw").as("cum_weight")),
        Seq("grp", "value"))
      .join(broadcast(totals.select(col("grp"), col("tw").as("total_weight"))),
        Seq("grp"))
      .select(col("grp").as(groupCol), col("q"), col("value"),
        col("cum_weight"), col("total_weight"))
      .orderBy(col(groupCol), col("q"))
  }
}
