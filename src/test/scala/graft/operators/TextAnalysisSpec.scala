package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Real-behavior checks for the text kernels on genuine snippets (the
  * fixture corpus is synthetic noise over one shared vocabulary, so its
  * `lang` labels can't validate language ID — these can). */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langPredict identifies genuine snippets of each profiled language") {
    val snippets = Seq(
      ("en", "the cat sat on the mat and it was happy that the sun is out"),
      ("de", "der hund und die katze sind nicht mit dem mann in das haus von ihnen"),
      ("fr", "le chien et la chatte sont dans la maison pour que les enfants qui dorment"),
      ("es", "el perro y el gato que viven en la casa con una persona es feliz por eso"),
      ("zh", "我 是 人 他 有 这 个 不 了 在 我们 他们"))
    val got = snippets.toDF("expected", "text")
      .select(col("expected"), TextAnalysis.langPredict(col("text")).as("got"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    got.foreach { case (expected, predicted) => predicted shouldBe expected }
  }

  test("quality score ranks clean prose above punctuation soup") {
    val r = Seq(
      ("clean", "A well formed sentence with ordinary words and reasonable length for scoring."),
      ("soup", "@#$% !!! ??? ~~ ++ == || @@ ## $$ %% ^^ && ** (( ))"))
      .toDF("kind", "text")
      .select(col("kind"),
        TextAnalysis.qualityFeatures(col("text")).getField("quality_score").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    r("clean") should be > r("soup")
    r("clean") should (be >= 0.0 and be <= 1.0)
    r("soup") should (be >= 0.0 and be <= 1.0)
  }

  test("qualityCounts kernel == the regex/split chain it replaced," +
      " on fixture text and adversarial inputs") {
    // the legacy formulation, kept verbatim as the parity reference
    val F = org.apache.spark.sql.functions
    def legacy(text: org.apache.spark.sql.Column) = struct(
      F.length(text).cast("long").as("n_chars"),
      F.size(F.split(F.trim(text), "\\s+")).cast("long").as("n_tokens"),
      F.length(F.regexp_replace(text, "\\s", "")).cast("long").as("lo"),
      F.length(F.regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("long").as("pu"))
    def kernel(text: org.apache.spark.sql.Column) = {
      val qc = graft.functions.VectorExpressions.qualityCounts(text)
      struct(
        qc.getField("n_chars").as("n_chars"),
        qc.getField("n_tokens").as("n_tokens"),
        (qc.getField("n_chars") - qc.getField("n_ws")).as("lo"),
        (qc.getField("n_chars") - qc.getField("n_alnum") -
          qc.getField("n_ws")).as("pu"))
    }
    val adversarial = Seq(
      "", " ", "   ", "\t", "\ta b\t", " \t leading tab", "x",
      "a  b\n\nc", "tab\tsep\ttoks", "\n", "ab\fc\rd",
      "ünïcödé wörds häre", "中文 没有 空格", "mixed 中文 and ascii",
      "punct!!! @#$ %^& *()", "123 456a a1b2", "trailing spaces   ",
      "\r\n\r\n", "a" * 5000 + " " + "b" * 5000)
      .toDF("text")
    val fixture = Tables.documents(spark, sf).select(col("text"))
    Seq(adversarial, fixture).foreach { df =>
      val diff = df.select(legacy(col("text")).as("l"), kernel(col("text")).as("k"))
        .where(col("l") =!= col("k"))
      diff.count() shouldBe 0L
    }
    // null passes through (struct-null, matching the legacy chain's nulls)
    val nullRow = Seq[Option[String]](None).toDF("text")
      .select(graft.functions.VectorExpressions.qualityCounts(col("text")).as("k"))
      .collect().head
    nullRow.isNullAt(0) shouldBe true
  }

  test("fixture text is free of vertical tab (0x0B) — the one byte where " +
      "Java \\s (kernel parity reference) and RE2 \\s (DuckDB oracles) diverge") {
    // qualityCounts treats 0x09..0x0D as whitespace (Java's \s); DuckDB's
    // RE2 \s excludes 0x0B. Oracle hash parity for every \s-based row
    // (curation_quota_sample etc.) therefore rests on fixture text never
    // containing a vertical tab. Pin that invariant so a fixture regen
    // that violates it fails HERE with a named cause, not as an opaque
    // oracle hash mismatch.
    val vt = Tables.documents(spark, sf)
      .where(col("text").contains("\u000B"))
      .count()
    vt shouldBe 0L
  }

  test("fingerprint collapses case/whitespace variants, separates real edits") {
    val r = Seq(
      (1L, "Hello   World"),
      (2L, "hello world"),
      (3L, "hello\tworld "),
      (4L, "hello words"))
      .toDF("id", "t")
      .select(col("id"), TextAnalysis.fingerprint(col("t")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    r(1L) shouldBe r(2L)
    r(2L) shouldBe r(3L)
    r(4L) should not be r(1L)
  }

  test("bpeTrainMerges: greedy self-overlap, frequency weighting, determinism") {
    import spark.implicits._
    // "aaaa" x3 dominates round 1: pair (a,a) counts 3 per word occurrence
    // (overlapping), 9 total; greedy merge gives aa|aa, so round 2's top
    // pair is (aa,aa) with count 3 — proving every-other-candidate parity
    val docs = Seq("aaaa aaaa aaaa bc", "de").toDF("text")
    val got = TextAnalysis.bpeTrainMerges(docs, col("text"), merges = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    got.head shouldBe ((1, "a", "a", 9L))
    got(1) shouldBe ((2, "aa", "aa", 3L))

    // deterministic across partitionings on the real corpus
    val corpus = Tables.documents(spark, sf)
    val m1 = TextAnalysis.bpeTrainMerges(corpus, col("text"), merges = 3)
      .collect().toSeq
    val m2 = TextAnalysis.bpeTrainMerges(corpus.repartition(11), col("text"), merges = 3)
      .collect().toSeq
    m1 shouldBe m2
  }

  test("bpeEncodeStats: piece counts bounded by chars and words, merges compress") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(50)
    val F = org.apache.spark.sql.functions // ScalaTest shadows size/length
    val chars = docs.select(col("doc_id"),
      F.size(TextAnalysis.tokens(col("text"))).cast("long").as("n_words"),
      F.length(regexp_replace(F.trim(col("text")), "\\s+", "")).cast("long").as("n_chars"))
    val enc0 = TextAnalysis.bpeEncodeStats(docs, "doc_id", col("text"), merges = 0)
    // zero merges: every char is a piece
    enc0.join(chars, "doc_id").where(col("n_pieces") =!= col("n_chars"))
      .count() shouldBe 0L
    val enc4 = TextAnalysis.bpeEncodeStats(docs, "doc_id", col("text"), merges = 4)
    // merges only shrink piece counts, never below one piece per word
    enc4.join(enc0.select(col("doc_id"), col("n_pieces").as("p0")), "doc_id")
      .where(col("n_pieces") > col("p0")).count() shouldBe 0L
    enc4.where(col("n_pieces") < col("n_words")).count() shouldBe 0L
    enc4.agg(sum("n_pieces")).head().getLong(0) should be <
      enc0.agg(sum("n_pieces")).head().getLong(0)
  }

  test("bpeTokenize: pieces reconstruct the text, counts agree with encode stats") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(50)
    val F = org.apache.spark.sql.functions
    val tok = TextAnalysis.bpeTokenize(docs, "doc_id", col("text"), merges = 4)
    // lossless: pieces with separators removed == original non-whitespace chars
    tok.join(docs, "doc_id")
      .where(regexp_replace(col("pieces_text"), "\\s+", "") =!=
        regexp_replace(F.trim(col("text")), "\\s+", ""))
      .count() shouldBe 0L
    // n_pieces is exactly the number of emitted pieces, and matches
    // the count-only encode twin
    tok.where(F.size(split(col("pieces_text"), " ")) =!= col("n_pieces"))
      .count() shouldBe 0L
    val enc = TextAnalysis.bpeEncodeStats(docs, "doc_id", col("text"), merges = 4)
      .select(col("doc_id"), col("n_pieces").as("enc_pieces"))
    tok.join(enc, "doc_id").where(col("n_pieces") =!= col("enc_pieces"))
      .count() shouldBe 0L
    // deterministic across partitionings
    val t2 = TextAnalysis.bpeTokenize(docs.repartition(11), "doc_id", col("text"), merges = 4)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    tok.orderBy("doc_id").as[(Long, String, Long)].collect().toSeq shouldBe t2
  }

  test("jaccard is symmetric and within [0,1] on shingle sets") {
    val a = TextAnalysis.wordShingles(lit("the quick brown fox jumps over the dog"), 3)
    val b = TextAnalysis.wordShingles(lit("the quick red fox jumps over the dog"), 3)
    val r = spark.range(1)
      .select(
        TextAnalysis.jaccard(a, b).as("ab"),
        TextAnalysis.jaccard(b, a).as("ba"))
      .head()
    r.getDouble(0) shouldBe r.getDouble(1)
    r.getDouble(0) should (be > 0.0 and be < 1.0) // near dup, not identical
  }
}
