package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import java.nio.file.Files

/** Contract for the deterministic fixture upscaler (SCALE10X/100X
  * evidence). Pins the two properties the scale artifacts depend on:
  *
  *  1. mult ≤ 10 output is the original round-7 scheme (single dup
  *     group, no token salt, period-11 embedding jitter) — so the
  *     recorded SCALE10X hashes stay reproducible; and
  *  2. mult > 10 forms BOUNDED near-dup groups of [[ScaleGen.DupGroup]]
  *     with cross-group divergence — the property that keeps dedup
  *     candidate-pair mass linear in mult (a third-decade slice whose
  *     duplicate clusters grew with mult would make every near-dup
  *     operator quadratic in mult by construction, which is a property
  *     of the generator, not the operator).
  */
class ScaleGenSpec extends SparkSpec {

  private lazy val outDir = {
    val d = Files.createTempDirectory("scalegen-spec").toFile
    d.deleteOnExit()
    ScaleGen.write(spark, sf, d.getAbsolutePath, 23)
    d.getAbsolutePath
  }

  test("referential integrity holds within every copy (23x)") {
    val li = spark.read.parquet(s"$outDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$outDir/orders.parquet")
    val dangling = li.join(ord, li("l_orderkey") === ord("o_orderkey"),
      "left_anti").count()
    dangling shouldBe 0L
    li.count() shouldBe 23L * Tables.lineitem(spark, sf).count()
  }

  test("documents: no empty or degenerate texts at mult > 10") {
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    docs.filter(F.length(F.trim(col("text"))) === 0).count() shouldBe 0L
    // bounded drop (variant ≤ 9): every copy keeps at least
    // (base tokens − 9) tokens, so no single-token collapse
    val minToks = docs
      .select(F.size(split(F.trim(col("text")), "\\s+")).as("n"))
      .agg(min(col("n"))).head().getInt(0)
    val baseMin = Tables.documents(spark, sf)
      .select(F.size(split(F.trim(col("text")), "\\s+")).as("n"))
      .agg(min(col("n"))).head().getInt(0)
    minToks should be >= (baseMin - 9)
  }

  test("documents: within-group copies are near-dups, cross-group are not") {
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    val stride = Tables.documents(spark, sf)
      .agg(max(col("doc_id"))).head().getLong(0) + 1L
    // doc 0's copies: copy c has doc_id = c * stride
    val texts = docs.filter(col("doc_id") % stride === 0)
      .withColumn("copy", (col("doc_id") / stride).cast("int"))
      .select(col("copy"), split(F.trim(col("text")), "\\s+").as("toks"))
      .collect().map(r => r.getInt(0) ->
        r.getSeq[String](1).sliding(3).map(_.mkString(" ")).toSet).toMap
    def jaccard(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty && b.isEmpty) 1.0
      else a.intersect(b).size.toDouble / a.union(b).size

    // 3-token shingles — the unit MinHash/LSH actually buckets on.
    // Same group (copies 11 and 13 are both group 1): token-drop
    // variants of the same salted text → high shingle overlap
    jaccard(texts(11), texts(13)) should be > 0.6
    // different groups: the period-7 position salt leaves no unsalted
    // run of length ≥ 3, so cross-group docs share (almost) no
    // 3-shingle — LSH must not bucket these together
    jaccard(texts(3), texts(13)) should be < 0.05
    jaccard(texts(13), texts(22)) should be < 0.05
  }

  test("mult ≤ 10 scheme is preserved: group 0 copies carry no salt") {
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    val stride = Tables.documents(spark, sf)
      .agg(max(col("doc_id"))).head().getLong(0) + 1L
    // copies 0..9 (= the whole mult=10 slice) never contain '~'
    docs.filter(col("doc_id") < 10L * stride)
      .filter(col("text").contains("~")).count() shouldBe 0L
    // copy v of group 0 is exactly the first-v-token drop of copy 0
    val texts = docs.filter(col("doc_id") % stride === 0)
      .withColumn("copy", (col("doc_id") / stride).cast("int"))
      .filter(col("copy") < 10)
      .select(col("copy"), split(F.trim(col("text")), "\\s+").as("toks"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    texts(4) shouldBe texts(0).drop(4)
  }

  test("embeddings: distant copies do not collide bit-exactly") {
    val emb = spark.read.parquet(s"$outDir/embeddings.parquet")
    val stride = Tables.embeddings(spark, sf)
      .agg(max(col("vec_id"))).head().getLong(0) + 1L
    val vecs = emb.filter(col("vec_id") % stride === 0)
      .withColumn("copy", (col("vec_id") / stride).cast("int"))
      .select(col("copy"), col("embedding"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    // the base jitter has period 11: copy 11 vs copy 22 collide in the
    // first term; the ≥10-gated second term must separate them
    vecs(11) should not equal vecs(22)
    // and all copies stay near the original (±5e-3 + ±3.2e-3 per dim)
    val base = vecs(0)
    for (c <- Seq(1, 11, 22)) {
      vecs(c).zip(base).foreach { case (a, b) =>
        math.abs(a - b) should be < 0.01f
      }
    }
  }
}
