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
          |ORDER BY doc_id, frame_idx""".stripMargin))
  )
}
