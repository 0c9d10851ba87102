package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout primitives for multi-dimensional scan pruning.
  *
  * Z-ORDER (Morton) interleaving maps two dimension keys onto one
  * clustering key whose sort order preserves locality in BOTH dims: a
  * range-partitioned, sorted parquet write on the Morton key gives every
  * file a tight min/max envelope on each original column, so predicates
  * on EITHER dimension prune row groups — the standard layout trick when
  * two independent filter columns matter at 100 TB (one sort column can
  * only serve one of them).
  *
  * The bit spread is the classic 4-step magic-number expansion — pure
  * integer built-ins (shift/and/or), whole-stage-codegen'd, and the same
  * arithmetic runs in the DuckDB oracle. Each input must fit in 16 bits.
  */
object Layout {

  private val steps = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  /** Spread the low 16 bits of `x` to even bit positions (0,2,4,...). */
  private def spread(x: Column): Column =
    steps.foldLeft(x.cast("long")) { case (v, (sh, mask)) =>
      (v.bitwiseOR(shiftleft(v, sh))).bitwiseAND(lit(mask))
    }

  private def spreadSql(x: String): String =
    steps.foldLeft(s"CAST($x AS BIGINT)") { case (v, (sh, mask)) =>
      s"((($v) | (($v) << $sh)) & $mask)"
    }

  /** 32-bit Morton key of two 16-bit dimension keys. */
  def mortonKey(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** The DuckDB SQL text matching [[mortonKey]]. */
  def mortonKeySql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** HILBERT clustering key — better locality than Morton: consecutive
    * keys are always Manhattan-adjacent cells (Z-order jumps across the
    * plane at quadrant seams), so range scans touch fewer files for the
    * same window. Native-kernel expression (`VectorExpressions.HilbertKey`,
    * a 16-level integer loop in whole-stage codegen); the DuckDB twin is
    * a generated chain of per-level CTEs ([[hilbertCtesSql]]), each a
    * constant-size rotation step — linear SQL, no expression blowup. */
  def hilbertKey(x: Column, y: Column, order: Int = 16): Column =
    graft.functions.VectorExpressions.hilbertKey(
      x.cast("long"), y.cast("long"), order)

  /** Range-bucket a dimension key into [0, 2^order) — the REQUIRED
    * front end of the space-filling keys on unbounded domains: a raw key
    * past 2^order silently wraps in the bit walk and the
    * adjacency/locality guarantee is void. Integer inputs → the double
    * arithmetic is IEEE-identical in both engines. */
  def rangeBucket(c: Column, lo: Column, hi: Column, order: Int): Column =
    // clamp to [0, 2^order): lo/hi routinely come from a stale reference
    // profile, and an out-of-range key would otherwise produce a bucket
    // outside the bit walk's domain — exactly the wrap the doc warns of.
    // NULL inputs must stay NULL: least/greatest SKIP nulls (both
    // engines), so the clamp alone would silently send null-keyed rows
    // to bucket 0 instead of propagating. A degenerate profile
    // (hi < lo ⇒ divisor ≤ 0) folds into the same NULL branch: Spark's
    // div-by-zero null and DuckDB's floor(inf) BIGINT-cast error would
    // otherwise diverge between engines.
    // All arithmetic in DOUBLE space, clamp BEFORE the integer cast:
    // Long subtraction (c - lo, hi - lo + 1) wraps for profiles spanning
    // more than half the Long domain (Spark non-ANSI wraps silently,
    // DuckDB raises — a cross-engine divergence), and casting an
    // unclamped huge double to integer clamps in Spark but errors in
    // DuckDB. Doubles never overflow at Long magnitudes, and the
    // clamped value is always cast-safe in both engines.
    when(c.isNull || lo.isNull || hi.isNull || hi < lo, lit(null).cast("long"))
      .otherwise(least(greatest(
          floor((c.cast("double") - lo.cast("double"))
            * lit(math.pow(2.0, order.toDouble))
            / (hi.cast("double") - lo.cast("double") + 1)),
          lit(0.0)),
        lit(((1L << order) - 1).toDouble)).cast("long"))

  /** The DuckDB SQL text matching [[rangeBucket]]. */
  def rangeBucketSql(c: String, lo: String, hi: String, order: Int): String = {
    val n = (1L << order).toString
    s"CASE WHEN $c IS NULL OR $lo IS NULL OR $hi IS NULL OR $hi < $lo THEN NULL" +
      s" ELSE CAST(least(greatest(floor((CAST($c AS DOUBLE) - CAST($lo AS DOUBLE))" +
      s" * CAST($n AS DOUBLE)" +
      s" / (CAST($hi AS DOUBLE) - CAST($lo AS DOUBLE) + 1)), 0.0)," +
      s" CAST($n AS DOUBLE) - 1) AS BIGINT) END"
  }

  /** One Hilbert level: quadrant digit into the accumulator, then the
    * flip+swap rotation. Stage-suffixed column names (hx$i → hx${i+1})
    * sidestep DuckDB's lateral column aliases, which could capture a
    * same-SELECT reference to a re-used name. */
  private def hilbertStageSql(s: Long, i: Int): String = {
    val (hx, hy, hd) = (s"hx$i", s"hy$i", s"hd$i")
    val rx = s"(CASE WHEN ($hx & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN ($hy & $s) > 0 THEN 1 ELSE 0 END)"
    s"""$hd + CAST(${s * s} AS BIGINT) * xor(3 * $rx, $ry) AS hd${i + 1},
       |    CASE WHEN ($hy & $s) = 0
       |      THEN (CASE WHEN ($hx & $s) > 0 THEN $s - 1 - $hy ELSE $hy END)
       |      ELSE $hx END AS hx${i + 1},
       |    CASE WHEN ($hy & $s) = 0
       |      THEN (CASE WHEN ($hx & $s) > 0 THEN $s - 1 - $hx ELSE $hx END)
       |      ELSE $hy END AS hy${i + 1}""".stripMargin
  }

  /** The WITH-chain computing the Hilbert key of (x, y) over `from`:
    * stage CTEs h0..h{order}; the final stage exposes `hd{order}` as the
    * key. `keep` = passenger columns carried through the chain. Each
    * stage is constant-size SQL — linear total, no expression blowup. */
  def hilbertCtesSql(from: String, x: String, y: String, order: Int,
      keep: Seq[String]): String = {
    val cols = keep.mkString(", ")
    val init = s"""h0 AS (
                  |  SELECT $cols, CAST($x AS BIGINT) AS hx0,
                  |    CAST($y AS BIGINT) AS hy0, CAST(0 AS BIGINT) AS hd0
                  |  FROM $from
                  |)""".stripMargin
    val stages = (0 until order).map { i =>
      val s = 1L << (order - 1 - i)
      s"""h${i + 1} AS (
         |  SELECT $cols, ${hilbertStageSql(s, i)}
         |  FROM h$i
         |)""".stripMargin
    }
    (init +: stages).mkString(",\n")
  }
}
