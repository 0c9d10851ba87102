package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, JoinHint,
  LocalRelation, LogicalPlan, Window}

/** Smoke: every registered query runs on sf0.001, returns a schema and
  * doesn't throw; oracle entries reference only registered names.
  * Each query's OPTIMIZED plan is also gated on the two scale-killer
  * shapes: unpartitioned windows (single-task global sort at any size)
  * and unguarded cartesian joins. A condition-less join passes only if a
  * side is provably ≤ 1 row (scalar-subquery crossJoin via maxRows), a
  * side is an Aggregate / LocalRelation (domain-bounded grid or literal
  * table — centroids, distinct dims), or the author asserted smallness
  * with a join hint; an accidental scan × scan cartesian has none of
  * those. Runtime-warning greps certified the window invariant before;
  * the spec makes both permanent and per-query. */
class QueriesSpec extends SparkSpec {

  private def oneRowish(p: LogicalPlan): Boolean = p.maxRows.exists(_ <= 1L)

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    names.distinct.size shouldBe names.size
  }

  test("oracleSql keys are a subset of queries keys") {
    SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet) shouldBe true
  }

  test("entry returns rows on sf0.001") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  SparkEntry.registry.foreach { q =>
    test(s"query ${q.name} runs on sf0.001 and returns rows") {
      val df = q.fn(spark, sf)
      df.schema.fields.length should be > 0
      val opt = df.queryExecution.optimizedPlan
      val globalWindows = opt.collect {
        case w: Window if w.partitionSpec.isEmpty => w }
      withClue(s"${q.name}: unpartitioned window (single-task at scale): ") {
        globalWindows shouldBe empty
      }
      def boundedSide(p: LogicalPlan): Boolean =
        oneRowish(p) || p.isInstanceOf[Aggregate] || p.isInstanceOf[LocalRelation]
      val cartesians = opt.collect {
        case j @ Join(l, r, _, None, hint)
            if hint == JoinHint.NONE && !boundedSide(l) && !boundedSide(r) => j }
      withClue(s"${q.name}: unguarded condition-less join: ") {
        cartesians shouldBe empty
      }
      df.count() should be > 0L
      spark.catalog.clearCache() // per-query staging caches must not accumulate
    }
  }
}
