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
}
