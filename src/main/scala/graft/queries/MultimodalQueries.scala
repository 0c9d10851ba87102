package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline query: binary payloads + partition-batch
  * decode (see graft.multimodal.Multimodal — decode stub, real plumbing).
  * The decoded metadata is deterministic, so the full pipeline is
  * oracle-checked except `brightness` (a per-byte reduction DuckDB SQL
  * can't express cheaply; covered by MultimodalSpec).
  */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("multimodal_decode",
      (s, d) => Multimodal.pipeline(s, Tables.documents(s, d))
        .select(col("doc_id"), col("n_bytes"), col("content_hash"),
          col("width"), col("height"), col("n_frames"))
        .orderBy(col("doc_id")),
      oracle = Some(
        """SELECT doc_id,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          |  md5(text) AS content_hash,
          |  CAST(octet_length(encode(text)) % 640 AS INT) AS width,
          |  CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS height,
          |  CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- resize planning: aspect-preserving fit into 320x240, no
    // upscaling; metadata arithmetic mirrored exactly in the oracle ----
    QueryDef("multimodal_resize",
      (s, d) => Multimodal.resizePlan(
        Multimodal.pipeline(s, Tables.documents(s, d)), maxW = 320, maxH = 240)
        .select(col("doc_id"), col("width"), col("height"),
          col("resize_scale"), col("out_w"), col("out_h"))
        .orderBy(col("doc_id")),
      oracle = Some(
        """WITH decoded AS (
          |  SELECT doc_id,
          |    CAST(octet_length(encode(text)) % 640 AS INT) AS width,
          |    CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS height
          |  FROM documents
          |), scaled AS (
          |  SELECT doc_id, width, height,
          |    (ROUND((CASE WHEN width > 0 AND height > 0
          |      THEN least(320.0 / width, 240.0 / height, 1.0)
          |      ELSE 1.0 END) * 1000000, 0) / 1000000) AS resize_scale
          |  FROM decoded
          |)
          |SELECT doc_id, width, height, resize_scale,
          |  CAST(floor(width * resize_scale) AS INT) AS out_w,
          |  CAST(floor(height * resize_scale) AS INT) AS out_h
          |FROM scaled ORDER BY doc_id""".stripMargin),
      bench = false),

    // ---- frame sampling: decode -> generate frame indices (sequence +
    // explode, the generator/UDTF shape) -> keep every 5th frame ----
    QueryDef("multimodal_frame_sample",
      (s, d) => Multimodal.sampledFrameFeatures(
        Multimodal.pipeline(s, Tables.documents(s, d)), step = 5)
        .orderBy(col("doc_id"), col("frame_idx")),
      oracle = Some(
        """WITH decoded AS (
          |  SELECT doc_id,
          |    CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames
          |  FROM documents
          |), frames AS (
          |  SELECT doc_id, n_frames, unnest(range(0, n_frames)) AS frame_idx
          |  FROM decoded
          |)
          |SELECT doc_id, n_frames, CAST(frame_idx AS INT) AS frame_idx,
          |  doc_id || ':' || frame_idx AS frame_tag
          |FROM frames WHERE frame_idx % 5 = 0
          |ORDER BY doc_id, frame_idx""".stripMargin)),

    // ---- perceptual-hash near-dup over media payloads: banded aHash
    //      (codegen'd AHashBands expression, 4×16-bit bands) → bucket
    //      self-join on exact band values (pigeonhole-EXACT for Hamming
    //      ≤ 3, never all-pairs; hot buckets capped, cap mirrored in the
    //      oracle's window count) → full-Hamming verify → smaller-id
    //      drop rule. Oracle recomputes the byte-sampled hash from
    //      hex(encode(text)) — byte j of the payload is hex digit pair
    //      2j+1. On real images the same pipeline runs over
    //      ImageIoCodec.lumaGrid64 bytes (MultimodalCodecSpec). ----
    QueryDef("multimodal_phash_dedup",
      (s, d) => Multimodal.phashNearDups(
        Multimodal.perceptualHashBands(
          Tables.documents(s, d)
            .select(col("doc_id"), col("text").cast("binary").as("payload")),
          "payload"))
        .orderBy(col("doc_id")),
      oracle = Some(
        """WITH bytes AS (
          |  SELECT d.doc_id, t.j, v,
          |    SUM(v) OVER (PARTITION BY d.doc_id) AS s
          |  FROM documents d, range(64) t(j),
          |    LATERAL (SELECT CAST('0x' || substr(hex(encode(d.text)),
          |      CAST(2 * ((t.j * octet_length(encode(d.text))) // 64) + 1 AS BIGINT),
          |      2) AS INT) AS v)
          |  WHERE octet_length(encode(d.text)) > 0
          |), h AS (
          |  SELECT doc_id,
          |    CAST(SUM(CASE WHEN 64*v > s AND j // 16 = 0 THEN (1 << (j % 16)) ELSE 0 END) AS INT) AS b0,
          |    CAST(SUM(CASE WHEN 64*v > s AND j // 16 = 1 THEN (1 << (j % 16)) ELSE 0 END) AS INT) AS b1,
          |    CAST(SUM(CASE WHEN 64*v > s AND j // 16 = 2 THEN (1 << (j % 16)) ELSE 0 END) AS INT) AS b2,
          |    CAST(SUM(CASE WHEN 64*v > s AND j // 16 = 3 THEN (1 << (j % 16)) ELSE 0 END) AS INT) AS b3
          |  FROM bytes GROUP BY doc_id
          |  UNION ALL
          |  SELECT doc_id, 0, 0, 0, 0 FROM documents
          |  WHERE octet_length(encode(text)) = 0
          |), bands AS (
          |  SELECT doc_id, b0, b1, b2, b3, t.band_idx,
          |    CASE t.band_idx WHEN 0 THEN b0 WHEN 1 THEN b1
          |                    WHEN 2 THEN b2 ELSE b3 END AS v
          |  FROM h, range(4) t(band_idx)
          |), capped AS (
          |  SELECT * FROM (
          |    SELECT *, count(*) OVER (PARTITION BY band_idx, v) AS bn
          |    FROM bands) WHERE bn <= 100
          |), cand AS (
          |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
          |    l.b0 AS a0, l.b1 AS a1, l.b2 AS a2, l.b3 AS a3,
          |    r.b0 AS c0, r.b1 AS c1, r.b2 AS c2, r.b3 AS c3
          |  FROM capped l JOIN capped r
          |    ON l.band_idx = r.band_idx AND l.v = r.v AND l.doc_id < r.doc_id
          |), dups AS (
          |  SELECT b, min(a) AS dup_of FROM cand
          |  WHERE bit_count(xor(a0, c0)) + bit_count(xor(a1, c1))
          |      + bit_count(xor(a2, c2)) + bit_count(xor(a3, c3)) <= 3
          |  GROUP BY b
          |)
          |SELECT h.doc_id, b0, b1, b2, b3, d.dup_of, d.dup_of IS NULL AS kept
          |FROM h LEFT JOIN dups d ON d.b = h.doc_id
          |ORDER BY h.doc_id""".stripMargin)),

    // ---- AUDIO modality (round 9): payload bytes as 16-bit LE signed
    //      mono PCM (graft.multimodal.Audio.RawPcm16 — the oracle-
    //      hashable twin; the REAL javax.sound.sampled WAV codec runs
    //      the same kernels in AudioCodecSpec). Per-frame energy Σs²
    //      over 64-sample frames as EXACT BIGINTs — one mapPartitions
    //      pass, no shuffle, frames doc-local. The oracle recomputes
    //      every sample from hex digit pairs (byte j = hex chars
    //      2j+1..2j+2; sample k = LE pair 4k+1 / 4k+3, sign-fixed). ----
    QueryDef("audio_frame_energy",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[graft.multimodal.Multimodal.MediaRecord]
        graft.multimodal.Audio.frameEnergies(media).toDF()
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      oracle = Some(
        """WITH b AS (
          |  SELECT doc_id, hex(encode(text)) AS hx,
          |    octet_length(encode(text)) // 2 AS n_samples
          |  FROM documents
          |), raw AS (
          |  SELECT doc_id, k,
          |    CAST(('0x' || substr(hx, CAST(4*k+1 AS BIGINT), 2)) AS INT)
          |      + 256 * CAST(('0x' || substr(hx, CAST(4*k+3 AS BIGINT), 2)) AS INT) AS u
          |  FROM (SELECT doc_id, hx, unnest(range(0, n_samples)) AS k FROM b)
          |), v AS (
          |  SELECT doc_id, k,
          |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
          |  FROM raw
          |)
          |SELECT doc_id, CAST(k // 64 AS INT) AS frame_idx,
          |  CAST(COUNT(*) AS INT) AS n_samples,
          |  CAST(SUM(CAST(s AS BIGINT) * s) AS BIGINT) AS energy_fx
          |FROM v GROUP BY doc_id, k // 64
          |ORDER BY doc_id, frame_idx""".stripMargin),
      bench = false),

    // ---- REAL WAV container path (round 10, VERDICT r9 #7): the same
    //      frame-energy kernel, but every payload is a genuine WAV
    //      container — synthesized per row by the codec's OWN writer
    //      (javax.sound AudioSystem.write wrapping the text-derived PCM
    //      bytes) and decoded back through the REAL container decoder
    //      (AudioSystem.getAudioInputStream → WavCodec.samples), header
    //      parse, frame-count bomb guard and all. PCM-in-WAV is
    //      lossless, so the row hashes against the SAME raw-PCM SQL
    //      oracle as audio_frame_energy — the hash match IS the
    //      write→decode roundtrip proof at corpus scale (the spec pins
    //      it per-payload). Same one-mapPartitions-pass shape: wrap and
    //      decode fuse into the codec boundary, no shuffle. ----
    QueryDef("audio_wav_energy",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[graft.multimodal.Multimodal.MediaRecord]
        val wav = media.map(r => graft.multimodal.Multimodal.MediaRecord(
          r.doc_id, graft.multimodal.Audio.WavCodec.wrapPcm16(r.payload)))
        graft.multimodal.Audio.frameEnergies(
            wav, extract = graft.multimodal.Audio.WavCodec.samples).toDF()
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      oracle = Some(
        """WITH b AS (
          |  SELECT doc_id, hex(encode(text)) AS hx,
          |    octet_length(encode(text)) // 2 AS n_samples
          |  FROM documents
          |), raw AS (
          |  SELECT doc_id, k,
          |    CAST(('0x' || substr(hx, CAST(4*k+1 AS BIGINT), 2)) AS INT)
          |      + 256 * CAST(('0x' || substr(hx, CAST(4*k+3 AS BIGINT), 2)) AS INT) AS u
          |  FROM (SELECT doc_id, hx, unnest(range(0, n_samples)) AS k FROM b)
          |), v AS (
          |  SELECT doc_id, k,
          |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
          |  FROM raw
          |)
          |SELECT doc_id, CAST(k // 64 AS INT) AS frame_idx,
          |  CAST(COUNT(*) AS INT) AS n_samples,
          |  CAST(SUM(CAST(s AS BIGINT) * s) AS BIGINT) AS energy_fx
          |FROM v GROUP BY doc_id, k // 64
          |ORDER BY doc_id, frame_idx""".stripMargin),
      // bench-rotated IN round 10 (real-container codec path)
      bench = true),

    // ---- REAL PNG container path (round 12, VERDICT r11 #3):
    //      audio_wav_energy's recipe applied to the image side — the
    //      driver fixtures ship no media table, so each row synthesizes
    //      a GENUINE 8×8 grayscale PNG from its text bytes (pixel j =
    //      byte j mod n) through the JDK's own encoder, decodes it back
    //      through the REAL codec (ImageIO reader → header guards →
    //      Rec.601 luminance grid), and perceptual-hashes the decoded
    //      grid. PNG is lossless and the 8×8 grid makes lumaGrid64's
    //      sampling the identity, so the bands hash against a SQL
    //      oracle computed from the raw text bytes — the hash match IS
    //      the write→decode roundtrip proof at corpus scale (per-
    //      payload twin pinned in MultimodalCodecSpec). Encode+decode
    //      fuse into ONE mapPartitions codec boundary, no shuffle;
    //      the band packing is the codegen aHashBands expression. ----
    QueryDef("image_png_phash",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[Multimodal.MediaRecord]
        val luma = media.mapPartitions(it => it.map { r =>
          val png = Multimodal.ImageIoCodec.grayPng8x8(r.payload)
          Multimodal.MediaRecord(r.doc_id,
            Multimodal.ImageIoCodec.lumaGrid64(
              Multimodal.MediaRecord(r.doc_id, png)))
        })
        Multimodal.perceptualHashBands(luma.toDF(), "payload")
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        """WITH b AS (
          |  SELECT doc_id, hex(encode(text)) AS hx,
          |    octet_length(encode(text)) AS n
          |  FROM documents
          |), px AS (
          |  SELECT doc_id, j,
          |    CAST(('0x' || substr(hx, CAST(2*(j % n)+1 AS BIGINT), 2)) AS INT) AS g
          |  FROM (SELECT doc_id, hx, n, unnest(range(64)) AS j FROM b WHERE n > 0)
          |), lum AS (
          |  SELECT doc_id, j,
          |    CAST(floor(0.299::DOUBLE * g + 0.587::DOUBLE * g
          |      + 0.114::DOUBLE * g) AS BIGINT) AS v
          |  FROM px
          |), tot AS (
          |  SELECT doc_id, SUM(v) AS s FROM lum GROUP BY doc_id
          |), h AS (
          |  SELECT l.doc_id,
          |    CAST(SUM(CASE WHEN 64*v > s AND j // 16 = 0 THEN (1 << (j % 16)) ELSE 0 END) AS INT) AS b0,
          |    CAST(SUM(CASE WHEN 64*v > s AND j // 16 = 1 THEN (1 << (j % 16)) ELSE 0 END) AS INT) AS b1,
          |    CAST(SUM(CASE WHEN 64*v > s AND j // 16 = 2 THEN (1 << (j % 16)) ELSE 0 END) AS INT) AS b2,
          |    CAST(SUM(CASE WHEN 64*v > s AND j // 16 = 3 THEN (1 << (j % 16)) ELSE 0 END) AS INT) AS b3
          |  FROM lum l JOIN tot t ON l.doc_id = t.doc_id
          |  GROUP BY l.doc_id
          |  UNION ALL
          |  SELECT doc_id, 0, 0, 0, 0 FROM b WHERE n = 0
          |)
          |SELECT doc_id, b0, b1, b2, b3 FROM h ORDER BY doc_id""".stripMargin),
      bench = false),

    // ---- silence segmentation (the VAD front-end shape): adaptive
    //      threshold — a frame is silent iff its per-sample energy is
    //      under 1/4 of the doc's mean, evaluated as a BIGINT cross-
    //      multiplication (no division, no floats) — then
    //      gaps-and-islands over silent frames, windows PARTITIONED BY
    //      doc (never global). One row per doc with frame/silence
    //      counts, contiguous-segment count and the longest run. ----
    QueryDef("audio_silence_segments",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[graft.multimodal.Multimodal.MediaRecord]
        graft.multimodal.Audio.silenceSegments(
          graft.multimodal.Audio.frameEnergies(media).toDF())
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        """WITH b AS (
          |  SELECT doc_id, hex(encode(text)) AS hx,
          |    octet_length(encode(text)) // 2 AS n_samples
          |  FROM documents
          |), raw AS (
          |  SELECT doc_id, k,
          |    CAST(('0x' || substr(hx, CAST(4*k+1 AS BIGINT), 2)) AS INT)
          |      + 256 * CAST(('0x' || substr(hx, CAST(4*k+3 AS BIGINT), 2)) AS INT) AS u
          |  FROM (SELECT doc_id, hx, unnest(range(0, n_samples)) AS k FROM b)
          |), v AS (
          |  SELECT doc_id, k,
          |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
          |  FROM raw
          |), fr AS (
          |  SELECT doc_id, k // 64 AS frame_idx,
          |    COUNT(*) AS n_s, SUM(CAST(s AS BIGINT) * s) AS e
          |  FROM v GROUP BY 1, 2
          |), tot AS (
          |  SELECT doc_id, COUNT(*) AS n_frames, SUM(n_s) AS n_total,
          |    SUM(e) AS tot_e
          |  FROM fr GROUP BY 1
          |), sil AS (
          |  SELECT f.doc_id, f.frame_idx,
          |    f.frame_idx - row_number()
          |      OVER (PARTITION BY f.doc_id ORDER BY f.frame_idx) AS island
          |  FROM fr f JOIN tot t ON t.doc_id = f.doc_id
          |  WHERE f.e * t.n_total * 4 < t.tot_e * f.n_s
          |), runs AS (
          |  SELECT doc_id, island, COUNT(*) AS run_len
          |  FROM sil GROUP BY 1, 2
          |), seg AS (
          |  SELECT doc_id, COUNT(*) AS n_seg, MAX(run_len) AS longest
          |  FROM runs GROUP BY 1
          |)
          |SELECT t.doc_id,
          |  CAST(t.n_frames AS BIGINT) AS n_frames,
          |  CAST(COALESCE(ns.n_silent, 0) AS BIGINT) AS n_silent,
          |  CAST(COALESCE(seg.n_seg, 0) AS BIGINT) AS n_silence_segments,
          |  CAST(COALESCE(seg.longest, 0) AS BIGINT) AS longest_silence_frames
          |FROM tot t
          |LEFT JOIN (SELECT doc_id, COUNT(*) AS n_silent FROM sil GROUP BY 1) ns
          |  ON ns.doc_id = t.doc_id
          |LEFT JOIN seg ON seg.doc_id = t.doc_id
          |ORDER BY t.doc_id""".stripMargin),
      bench = false),

    // ---- CROSS-MODAL dedup ensemble (VERDICT r10 #8): the multimodal
    //      sibling of dedup_multi_signal — TEXT near-dup edges
    //      (md5-MinHash-LSH candidates verified at Jaccard ≥ 0.5) ∪
    //      IMAGE near-dup edges (banded average-hash, Hamming ≤ 12 —
    //      the near-dup band for byte-payload avg-hash, a coarser
    //      signal than real image grids; beyond radius 3 the 4-band
    //      multi-index blocking is best-effort recall, and the oracle
    //      mirrors the identical blocking) over paired
    //      (doc, media payload) rows → ONE star-CC → keep-best
    //      (longest) survivor per cluster. Each signal catches pairs
    //      the other misses (byte-distribution vs shingle-set
    //      similarity), and the ensemble pays ONE connectivity pass —
    //      the cross-modal curation shape of a corpus where every
    //      document carries its media. Both candidate generators are
    //      band/bucket bounded; never all-pairs. ----
    QueryDef("dedup_cross_modal",
      (s, d) => {
        import graft.operators.{Curation, Dedup}
        val docs = Tables.documents(s, d)
        val jac = Dedup.nearDuplicatePairsMd5(docs, "doc_id", "text",
          threshold = 0.5, shingleK = 3, numHashes = 16, bands = 4,
          broadcastArr = true)
          .select(col("a"), col("b"))
        val img = Multimodal.phashPairs(
            Multimodal.perceptualHashBands(
              docs.select(col("doc_id"),
                col("text").cast("binary").as("payload")),
              "payload"),
            hammingMax = 12)
          .select(col("a"), col("b"))
        val edges = jac.unionByName(img).distinct()
        val nodes = docs.select(col("doc_id").as("node"))
        val cc = Curation.connectedComponentsStar(edges, nodes)
        val labeled = cc.join(
          docs.select(col("doc_id").as("node"), col("n_chars")), Seq("node"))
        Curation.bestInCluster(labeled, "n_chars")
          .withColumn("cluster_size",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("cluster_id"))))
          .select(col("node").as("doc_id"), col("cluster_id"),
            col("cluster_size"), col("n_chars"), col("keep_id"), col("kept"))
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        raw"""WITH RECURSIVE toks AS MATERIALIZED (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
             |), sh AS MATERIALIZED (
             |  SELECT doc_id, CASE WHEN len(t) >= 3 THEN
             |      list_distinct(list_transform(range(1, len(t) - 1),
             |        i -> array_to_string(t[i:i+2], ' ')))
             |    ELSE CAST([] AS VARCHAR[]) END AS sh
             |  FROM toks
             |), hs AS MATERIALIZED (
             |  SELECT doc_id, sh,
             |    list_transform(sh, x -> CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)) AS harr
             |  FROM sh
             |), sigs AS MATERIALIZED (
             |  SELECT doc_id,
             |    list_transform(range(0, 16), i -> list_min(list_transform(harr,
             |      h -> ((h >> 30) + i * (h & 1073741823)) % 1073741789))) AS sig
             |  FROM hs WHERE len(sh) > 0
             |), buckets AS MATERIALIZED (
             |  SELECT s.doc_id, b.band,
             |    array_to_string(s.sig[b.band*4+1 : b.band*4+4], ',') AS bucket
             |  FROM sigs s CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) b
             |), cand AS MATERIALIZED (
             |  SELECT l.doc_id AS a, r.doc_id AS b
             |  FROM buckets l JOIN buckets r USING (band, bucket)
             |  WHERE l.doc_id < r.doc_id
             |  GROUP BY 1, 2
             |), ver AS MATERIALIZED (
             |  SELECT c.a AS a, c.b AS b,
             |    CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
             |      / CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS DOUBLE) AS jaccard
             |  FROM cand c JOIN hs x ON x.doc_id = c.a JOIN hs y ON y.doc_id = c.b
             |), jac_edges AS MATERIALIZED (
             |  SELECT a, b FROM ver WHERE jaccard >= 0.5
             |), pbytes AS MATERIALIZED (
             |  SELECT d.doc_id, t.j, v,
             |    SUM(v) OVER (PARTITION BY d.doc_id) AS bsum
             |  FROM documents d, range(64) t(j),
             |    LATERAL (SELECT CAST('0x' || substr(hex(encode(d.text)),
             |      CAST(2 * ((t.j * octet_length(encode(d.text))) // 64) + 1 AS BIGINT),
             |      2) AS INT) AS v)
             |  WHERE octet_length(encode(d.text)) > 0
             |), ph AS MATERIALIZED (
             |  SELECT doc_id,
             |    CAST(SUM(CASE WHEN 64*v > bsum AND j // 16 = 0 THEN (1 << (j % 16)) ELSE 0 END) AS INT) AS b0,
             |    CAST(SUM(CASE WHEN 64*v > bsum AND j // 16 = 1 THEN (1 << (j % 16)) ELSE 0 END) AS INT) AS b1,
             |    CAST(SUM(CASE WHEN 64*v > bsum AND j // 16 = 2 THEN (1 << (j % 16)) ELSE 0 END) AS INT) AS b2,
             |    CAST(SUM(CASE WHEN 64*v > bsum AND j // 16 = 3 THEN (1 << (j % 16)) ELSE 0 END) AS INT) AS b3
             |  FROM pbytes GROUP BY doc_id
             |  UNION ALL
             |  SELECT doc_id, 0, 0, 0, 0 FROM documents
             |  WHERE octet_length(encode(text)) = 0
             |), pbands AS MATERIALIZED (
             |  SELECT doc_id, b0, b1, b2, b3, t.band_idx,
             |    CASE t.band_idx WHEN 0 THEN b0 WHEN 1 THEN b1
             |                    WHEN 2 THEN b2 ELSE b3 END AS v
             |  FROM ph, range(4) t(band_idx)
             |), pcapped AS MATERIALIZED (
             |  SELECT * FROM (
             |    SELECT *, count(*) OVER (PARTITION BY band_idx, v) AS bn
             |    FROM pbands) WHERE bn <= 100
             |), pcand AS MATERIALIZED (
             |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
             |    l.b0 AS a0, l.b1 AS a1, l.b2 AS a2, l.b3 AS a3,
             |    r.b0 AS c0, r.b1 AS c1, r.b2 AS c2, r.b3 AS c3
             |  FROM pcapped l JOIN pcapped r
             |    ON l.band_idx = r.band_idx AND l.v = r.v AND l.doc_id < r.doc_id
             |), img_edges AS MATERIALIZED (
             |  SELECT a, b FROM pcand
             |  WHERE bit_count(xor(a0, c0)) + bit_count(xor(a1, c1))
             |      + bit_count(xor(a2, c2)) + bit_count(xor(a3, c3)) <= 12
             |), all_edges AS MATERIALIZED (
             |  SELECT a, b FROM jac_edges UNION SELECT a, b FROM img_edges
             |), sym2 AS MATERIALIZED (
             |  SELECT a AS x, b AS y FROM all_edges
             |  UNION ALL SELECT b AS x, a AS y FROM all_edges
             |), reach AS (
             |  SELECT doc_id AS node, doc_id AS lab FROM documents
             |  UNION
             |  SELECT s.y AS node, r.lab FROM reach r JOIN sym2 s ON s.x = r.node
             |), lab AS MATERIALIZED (SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node),
             |j AS MATERIALIZED (
             |  SELECT lab.node, lab.cluster_id, d.n_chars
             |  FROM lab JOIN documents d ON d.doc_id = lab.node
             |), rk AS MATERIALIZED (
             |  SELECT *, row_number() OVER (PARTITION BY cluster_id
             |    ORDER BY n_chars DESC, node) AS rn FROM j
             |), reps AS MATERIALIZED (SELECT cluster_id, node AS keep_id FROM rk WHERE rn = 1)
             |SELECT j.node AS doc_id, j.cluster_id,
             |  count(*) OVER (PARTITION BY j.cluster_id) AS cluster_size,
             |  j.n_chars, reps.keep_id, j.node = reps.keep_id AS kept
             |FROM j JOIN reps ON j.cluster_id = reps.cluster_id
             |ORDER BY doc_id""".stripMargin),
      bench = false)
  )
}
