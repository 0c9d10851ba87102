package graft

/** Smoke: every registered query runs on sf0.001, returns a schema and
  * doesn't throw; oracle entries reference only registered names. */
class QueriesSpec extends SparkSpec {

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
      df.count() should be > 0L
      spark.catalog.clearCache() // per-query staging caches must not accumulate
    }
  }
}
