package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives for large-scale corpus curation: tokenization,
  * normalization, fingerprinting, quality scoring, language ID heuristics.
  * All pure Column expressions (codegen'd built-ins) — no UDFs, so they
  * vectorize inside whole-stage codegen and push through Catalyst intact.
  */
object TextAnalysis {

  /** Whitespace tokens of the trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Lowercased, whitespace-collapsed canonical form (normalization dedup key). */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** 128-bit content fingerprint of the normalized text (hex md5). */
  def fingerprint(text: Column): Column = md5(normalize(text).cast("binary"))

  /** Distinct word k-shingles ("w1 w2 w3") — the unit set for Jaccard /
    * MinHash near-dup detection. Empty array when the doc is shorter
    * than k tokens. Native codegen expression — the HOF formulation
    * (`transform` + `slice` + `concat_ws`) is interpreted and costs
    * ~1 ms/doc. */
  def wordShingles(text: Column, k: Int): Column =
    graft.functions.VectorExpressions.wordShingles(text, k)

  /** Jaccard similarity of two (not necessarily distinct) string arrays,
    * over their DISTINCT elements. */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    val union = size(array_union(da, db)).cast("double")
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** Heuristic quality features + score (length, word shape, punctuation).
    * Returns a struct; callers select the fields they need. */
  def qualityFeatures(text: Column): Column = {
    val nChars = length(text).cast("double")
    val toks = tokens(text)
    val nTokens = size(toks).cast("double")
    val lettersOnly = length(regexp_replace(text, "\\s", "")).cast("double")
    val avgWordLen = when(nTokens > 0, lettersOnly / nTokens).otherwise(lit(0.0))
    val punct = length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double")
    val punctRatio = when(nChars > 0, punct / nChars).otherwise(lit(0.0))
    val score =
      lit(1.0) / (lit(1.0) + exp(-(lit(0.01) * nTokens + lit(1.0) * avgWordLen
        - lit(20.0) * punctRatio - lit(3.0))))
    struct(
      nChars.cast("long").as("n_chars"),
      nTokens.cast("long").as("n_tokens"),
      avgWordLen.as("avg_word_len"),
      punctRatio.as("punct_ratio"),
      score.as("quality_score"))
  }

  /** Tiny public stopword profiles for the n-gram/stopword langid
    * heuristic. Scores = fraction of the doc's DISTINCT tokens hitting
    * each profile; prediction = argmax (ties broken by language code,
    * deterministic). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "was", "for", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den", "von", "sich"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour", "qui", "des"),
    "es" -> Seq("el", "los", "de", "que", "y", "en", "un", "es", "por", "con", "una", "para"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这", "个", "们"))

  /** Per-language stopword-hit scores as a struct of doubles. */
  def langScores(text: Column): Column = {
    val toks = array_distinct(tokens(lower(text)))
    val fields = stopwords.toSeq.sortBy(_._1).map { case (langCode, words) =>
      (size(array_intersect(toks, array(words.map(lit): _*))).cast("double") /
        greatest(size(toks).cast("double"), lit(1.0))).as(s"score_$langCode")
    }
    struct(fields: _*)
  }

  /** Predicted language code = argmax score (deterministic tie-break on
    * the language code via struct ordering). */
  def langPredict(text: Column): Column = {
    val toks = array_distinct(tokens(lower(text)))
    val scored = stopwords.toSeq.sortBy(_._1).map { case (langCode, words) =>
      struct(
        size(array_intersect(toks, array(words.map(lit): _*))).as("hits"),
        lit(langCode).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }
}
