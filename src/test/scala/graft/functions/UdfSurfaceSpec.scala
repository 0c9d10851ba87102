package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The UDF surface exists and interoperates — and the native expression
  * is the preferred form. A Scala UDF deserializes every row's array to
  * `Seq[Float]` and runs outside codegen; the native `CosineSim` runs on
  * Tungsten ArrayData inside whole-stage codegen (SURVEY §2.3 "UDF/UDAF/
  * UDTF surface"; the UDAF artifact is GmmSuffStatsAggregator). This
  * spec pins that both give identical numbers, so choosing the fast
  * form is free. */
class UdfSurfaceSpec extends SparkSpec {

  test("Scala UDF cosine == native CosineSim expression") {
    val cosUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0.0 else dot / denom
    }
    val e = Tables.embeddings(spark, sf).where(col("vec_id") < 50)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("va"))
      .join(e.select((col("vec_id") + 1).as("a_id"), col("embedding").as("vb")), "a_id")
    val rows = pairs.select(
      cosUdf(col("va"), col("vb")).as("via_udf"),
      VectorExpressions.cosineSim(col("va"), col("vb")).as("via_native"))
      .collect()
    rows.length should be > 0
    rows.foreach { r => r.getDouble(0) shouldBe r.getDouble(1) }
  }
}
