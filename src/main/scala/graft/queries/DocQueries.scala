package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Dedup, TextAnalysis}
import graft.util.Det
import org.apache.spark.sql.functions._

/** Text-corpus curation queries over `documents` (SURVEY.md §7.6 +
  * the training-data-pipeline mandate): token/quality stats, language ID,
  * fingerprinting, exact + MinHash-LSH + SimHash dedup, n-gram Jaccard.
  */
object DocQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- tokenization stats ----
    QueryDef("text_token_stats",
      (s, d) => {
        val toks = TextAnalysis.tokens(col("text"))
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            size(toks).cast("long").as("n_tokens"),
            length(col("text")).cast("long").as("n_chars_actual"),
            size(array_distinct(toks)).cast("long").as("n_unique_tokens"))
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        raw"""SELECT doc_id,
             |  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             |  length(text) AS n_chars_actual,
             |  len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_unique_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- quality scoring ----
    QueryDef("text_quality_score",
      (s, d) => {
        val f = TextAnalysis.qualityFeatures(col("text"))
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            f.getField("n_tokens").as("n_tokens"),
            Det.fixed(f.getField("avg_word_len"), 6).as("avg_word_len"),
            Det.fixed(f.getField("punct_ratio"), 6).as("punct_ratio"),
            Det.fixed(f.getField("quality_score"), 6).as("quality_score"))
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        raw"""WITH feats AS (
             |  SELECT doc_id,
             |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
             |      / len(string_split_regex(trim(text), '\s+')) AS avg_word_len,
             |    CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
             |      / length(text) AS punct_ratio
             |  FROM documents
             |)
             |SELECT doc_id, n_tokens,
             |  (ROUND((avg_word_len) * 1000000, 0) / 1000000) AS avg_word_len,
             |  (ROUND((punct_ratio) * 1000000, 0) / 1000000) AS punct_ratio,
             |  (ROUND((1.0 / (1.0 + exp(-(0.01 * n_tokens + 1.0 * avg_word_len
             |    - 20.0 * punct_ratio - 3.0)))) * 1000000, 0) / 1000000) AS quality_score
             |FROM feats ORDER BY doc_id""".stripMargin)),

    // ---- language ID heuristic (stopword profiles). The fixture's `lang`
    // labels are synthetic noise over one shared vocabulary, so accuracy
    // vs that column is meaningless; real-behavior checks live in
    // TextAnalysisSpec on genuine multilingual snippets. Oracle mirrors
    // the argmax via DuckDB list_sort(structs)[-1] — struct comparison is
    // (hits, lang)-lexicographic in both engines, so ties break the same
    // way. Profile lists are generated from TextAnalysis.stopwords so the
    // two sides cannot drift. ----
    QueryDef("text_langid",
      (s, d) => Tables.documents(s, d)
        .select(
          col("doc_id"),
          col("lang").as("labeled_lang"),
          TextAnalysis.langPredict(col("text")).as("predicted_lang"))
        .orderBy(col("doc_id")),
      oracle = Some {
        val entries = TextAnalysis.stopwords.toSeq.sortBy(_._1).map { case (langCode, words) =>
          val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
          s"{'hits': len(list_intersect(t, $lst)), 'lang': '$langCode'}"
        }.mkString(",\n             |    ")
        raw"""WITH toks AS (
             |  SELECT doc_id, lang,
             |    list_distinct(string_split_regex(trim(lower(text)), '\s+')) AS t
             |  FROM documents
             |)
             |SELECT doc_id, lang AS labeled_lang,
             |  list_sort([
             |    $entries])[-1].lang AS predicted_lang
             |FROM toks ORDER BY doc_id""".stripMargin
      }),

    // ---- BPE-ish sub-word tokenization (brief: "token counting —
    // whitespace + a BPE-ish regex"): alphanumeric runs + individual
    // punctuation marks, the pre-merge piece inventory of a BPE
    // tokenizer. Alternation is leftmost-first in both Java regex and
    // RE2, so piece boundaries agree. ----
    QueryDef("tokens_bpe",
      (s, d) => {
        val pieceRe = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            regexp_count(col("text"), lit(pieceRe)).as("n_pieces"),
            size(array_distinct(regexp_extract_all(col("text"), lit(pieceRe), lit(0))))
              .as("n_uniq_pieces"))
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        raw"""SELECT doc_id,
             |  len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS n_pieces,
             |  len(list_distinct(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')))
             |    AS n_uniq_pieces
             |FROM documents ORDER BY doc_id""".stripMargin),
      bench = false),

    // ---- the first BPE TRAINING step: corpus-wide adjacent-piece pair
    // frequencies, top-20. BPE training is "repeatedly merge the most
    // frequent adjacent pair"; this is one full iteration of the count —
    // a map-side pair explode + one count shuffle, embarrassingly
    // parallel at 100 TB. Deterministic ordering: (count desc, pair). ----
    QueryDef("tokens_bpe_pairs",
      (s, d) => {
        val pieceRe = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"
        val pieces = regexp_extract_all(col("text"), lit(pieceRe), lit(0))
        Tables.documents(s, d)
          .select(explode(zip_with(
            slice(pieces, lit(1), greatest(size(pieces) - 1, lit(0))),
            slice(pieces, lit(2), greatest(size(pieces) - 1, lit(0))),
            (a, b) => concat_ws(" ", a, b))).as("pair"))
          .groupBy(col("pair"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("pair"))
          .limit(20)
      },
      oracle = Some(
        raw"""WITH pieces AS (
             |  SELECT regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]') AS p
             |  FROM documents
             |), pairs AS (
             |  SELECT unnest(list_transform(range(1, len(p)),
             |    i -> p[i] || ' ' || p[i+1])) AS pair
             |  FROM pieces
             |)
             |SELECT pair, count(*) AS n FROM pairs
             |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin),
      bench = false),

    // ---- content fingerprint ----
    QueryDef("text_fingerprint",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id")),
      oracle = Some(
        raw"""SELECT doc_id,
             |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- exact dedup (hash-groupBy on fingerprint) ----
    QueryDef("dedup_exact",
      (s, d) => Dedup.exactClusters(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("fingerprint"), col("keeper_id"),
          col("cluster_size"), col("is_duplicate"))
        .orderBy(col("doc_id")),
      oracle = Some(
        raw"""WITH fp AS (
             |  SELECT doc_id,
             |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
             |  FROM documents
             |)
             |SELECT doc_id, fingerprint,
             |  min(doc_id) OVER (PARTITION BY fingerprint) AS keeper_id,
             |  count(*) OVER (PARTITION BY fingerprint) AS cluster_size,
             |  doc_id > min(doc_id) OVER (PARTITION BY fingerprint) AS is_duplicate
             |FROM fp ORDER BY doc_id""".stripMargin)),

    // ---- MinHash + LSH near-dup: per-doc best verified candidate.
    // Iterative multi-stage hashing pipeline — not SQL-expressible;
    // DedupSpec verifies with planted near-duplicates. ----
    QueryDef("dedup_minhash_lsh",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = Dedup.nearDuplicatePairs(docs, "doc_id", "text",
          threshold = 0.5, shingleK = 3, numHashes = 16, bands = 4)
        // symmetrize and keep each doc's best match
        val sym = pairs.select(col("a").as("doc_id"), col("b").as("other"), col("jaccard"))
          .union(pairs.select(col("b").as("doc_id"), col("a").as("other"), col("jaccard")))
        val best = sym.groupBy(col("doc_id"))
          .agg(max(struct(col("jaccard"), col("other"))).as("bestm"))
          .select(col("doc_id"),
            Det.fixed(col("bestm.jaccard"), 6).as("best_jaccard"),
            col("bestm.other").as("best_match_id"))
        docs.select(col("doc_id")).join(best, Seq("doc_id"), "left")
          .withColumn("is_near_duplicate", col("best_jaccard").isNotNull)
          .orderBy(col("doc_id"))
      },
      oracle = None),

    // ---- SimHash near-dup (custom codegen expression + bit_count) ----
    QueryDef("dedup_simhash",
      (s, d) => Dedup.simhashNeighbors(Tables.documents(s, d), "doc_id", "text",
        maxHamming = 10)
        .select(col("id").as("doc_id"), col("simhash"),
          col("nn_id"), col("nn_hamming"))
        .orderBy(col("doc_id")),
      oracle = None),

    // ---- unigram Jaccard between consecutive docs (oracle-checkable
    // window into the same similarity kernel the LSH verifier uses) ----
    QueryDef("text_jaccard_pairs",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val a = docs.select(col("doc_id").as("a_id"),
          TextAnalysis.tokens(col("text")).as("a_toks"))
        val b = docs.select(col("doc_id").as("b_id"),
          TextAnalysis.tokens(col("text")).as("b_toks"))
        a.join(b, col("b_id") === col("a_id") + 1)
          .select(col("a_id"), col("b_id"),
            Det.fixed(TextAnalysis.jaccard(col("a_toks"), col("b_toks")), 6).as("jaccard"))
          .orderBy(col("a_id"))
      },
      oracle = Some(
        raw"""WITH toks AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
             |  FROM documents
             |)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  (ROUND((
             |    CAST(len(list_intersect(a.t, b.t)) AS DOUBLE) /
             |    CAST(len(list_distinct(list_concat(a.t, b.t))) AS DOUBLE)) * 1000000, 0) / 1000000) AS jaccard
             |FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
             |ORDER BY a_id""".stripMargin)),

    // ---- exact substring-span duplication (the "remove repeated spans"
    // op): per doc, fraction of tokens covered by word 5-grams occurring
    // in >= 2 documents — interval-union coverage, all exact integers,
    // hence fully oracle-hashable unlike hash-family near-dup ops. ----
    QueryDef("dedup_span_coverage",
      (s, d) => Dedup.spanDuplication(Tables.documents(s, d), "doc_id", "text", k = 5)
        .orderBy(col("doc_id")),
      oracle = Some(
        raw"""WITH toks AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
             |), pos_spans AS (
             |  SELECT doc_id, sp.pos AS pos, sp.span AS span
             |  FROM (
             |    SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
             |      i -> {'pos': i, 'span': array_to_string(t[i:i+4], ' ')})) AS sp
             |    FROM toks
             |  )
             |), dup AS (
             |  SELECT span FROM pos_spans GROUP BY span
             |  HAVING count(DISTINCT doc_id) >= 2
             |), contrib AS (
             |  SELECT p.doc_id,
             |    greatest(0, p.pos + 5 - greatest(coalesce(
             |      max(p.pos + 5) OVER (PARTITION BY p.doc_id ORDER BY p.pos
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0),
             |      p.pos)) AS c
             |  FROM pos_spans p JOIN dup USING (span)
             |), agg AS (
             |  SELECT doc_id, count(*) AS n_dup_spans,
             |    CAST(sum(c) AS BIGINT) AS covered_tokens
             |  FROM contrib GROUP BY 1
             |)
             |SELECT d.doc_id AS doc_id,
             |  CAST(len(string_split_regex(trim(d.text), '\s+')) AS BIGINT) AS n_tokens,
             |  coalesce(agg.n_dup_spans, 0) AS n_dup_spans,
             |  coalesce(agg.covered_tokens, 0) AS covered_tokens,
             |  CAST(coalesce(agg.covered_tokens, 0) AS DOUBLE)
             |    / CAST(len(string_split_regex(trim(d.text), '\s+')) AS DOUBLE) AS dup_ratio
             |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- END-TO-END curation pipeline (the training-data story in one
    // query): language-ID -> quality gate -> exact content dedup (keep
    // lowest doc_id per fingerprint) -> per-source corpus stats. One
    // scan, one window over the fingerprint hash-partition, one group-by:
    // at 100 TB this is scan + 2 shuffles (fp, source), no iteration.
    // Every stage reuses an individually-oracled operator, and the
    // composite is oracled as one SQL pipeline too. ----
    QueryDef("curation_pipeline",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val f = TextAnalysis.qualityFeatures(col("text"))
        val staged = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            TextAnalysis.langPredict(col("text")).as("pred_lang"),
            Det.fixed(f.getField("quality_score"), 6).as("q"),
            f.getField("n_tokens").as("n_tokens"),
            TextAnalysis.fingerprint(col("text")).as("fp"))
        staged
          .withColumn("keeper_id",
            min(col("doc_id")).over(Window.partitionBy(col("fp"))))
          .where(col("doc_id") === col("keeper_id") &&
            col("pred_lang") === "en" && col("q") >= 0.5)
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("total_tokens"),
            Det.fixedSum(col("q"), 6).as("sum_quality"))
          .orderBy(col("source"))
      },
      oracle = Some {
        val entries = TextAnalysis.stopwords.toSeq.sortBy(_._1).map { case (langCode, words) =>
          val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
          s"{'hits': len(list_intersect(t, $lst)), 'lang': '$langCode'}"
        }.mkString(",\n             |      ")
        raw"""WITH feats AS (
             |  SELECT doc_id, source,
             |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
             |      / len(string_split_regex(trim(text), '\s+')) AS avg_word_len,
             |    CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
             |      / length(text) AS punct_ratio,
             |    list_distinct(string_split_regex(trim(lower(text)), '\s+')) AS t,
             |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
             |  FROM documents
             |), scored AS (
             |  SELECT doc_id, source, fp, n_tokens,
             |    (ROUND((1.0 / (1.0 + exp(-(0.01 * n_tokens + 1.0 * avg_word_len
             |      - 20.0 * punct_ratio - 3.0)))) * 1000000, 0) / 1000000) AS q,
             |    list_sort([
             |      $entries])[-1].lang AS pred_lang,
             |    min(doc_id) OVER (PARTITION BY fp) AS keeper_id
             |  FROM feats
             |)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |  ${Det.fixedSumSql("q", 6)} AS sum_quality
             |FROM scored
             |WHERE doc_id = keeper_id AND pred_lang = 'en' AND q >= 0.5
             |GROUP BY source ORDER BY source""".stripMargin
      })
  )
}
