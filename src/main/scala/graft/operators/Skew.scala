package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at scale. AQE's skew-join splitting
  * handles many cases at runtime; these operators are the explicit,
  * planner-independent forms for pipelines where the skew is known
  * (a handful of hot grouping keys over billions of rows — exactly the
  * shape of corpus-level aggregations at 100 TB).
  *
  * Both transforms are RESULT-IDENTICAL to their unsalted equivalents
  * (asserted in SkewSpec and by the DuckDB oracle): salt never leaks into
  * the output, it only re-shapes the shuffle.
  */
object Skew {

  /** Equi-join where `probe`'s key distribution is skewed: each probe row
    * gets a deterministic salt in [0, buckets) derived from `saltFrom`
    * (any column(s) roughly unique per row, e.g. the probe's primary key),
    * and `build` is replicated once per salt value. The shuffle then
    * distributes each hot key over `buckets` reducers instead of one.
    * Build-side cost: |build| * buckets rows — use for moderate build
    * sides that are too big to broadcast but far smaller than the probe.
    */
  def saltedEquiJoin(
      probe: DataFrame, build: DataFrame, key: String,
      saltFrom: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = probe.withColumn("_salt", pmod(xxhash64(saltFrom), lit(buckets.toLong)))
    val replicated = build.withColumn(
      "_salt", explode(array((0 until buckets).map(b => lit(b.toLong)): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (salted partial -> final) grouped aggregation for
    * low-cardinality/hot grouping keys: phase 1 aggregates on
    * (key, salt) so every reducer handles a bounded slice of each hot
    * key; phase 2 merges the `buckets` partials per key. Aggregates must
    * be algebraic (expressible as merge of partials) — counts and sums
    * here. Spark's partial aggregation already bounds map-side state;
    * explicit salting additionally bounds REDUCER state, which matters
    * when a single key's partials exceed one reducer's memory.
    */
  def twoPhaseCountSum(
      df: DataFrame, key: String, sumCol: String,
      saltFrom: Column, buckets: Int, sumScale: Int = 2): DataFrame = {
    val f = math.pow(10.0, sumScale.toDouble)
    val partial = df
      .withColumn("_salt", pmod(xxhash64(saltFrom), lit(buckets.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(
        count(lit(1)).as("_n"),
        sum(round(col(sumCol) * lit(f), 0).cast("long")).as("_s"))
    partial
      .groupBy(col(key))
      .agg(
        sum(col("_n")).as("n_rows"),
        (sum(col("_s")).cast("double") / lit(f)).as(s"sum_$sumCol"))
  }
}
