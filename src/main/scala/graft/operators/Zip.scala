package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional (zip-style) primitives — the literal `rdd.zip(other)` /
  * `zipWithIndex` surface of the reference (Main.scala:183,198 zips the
  * point set with its per-point responsibilities).
  *
  * The reference's RDD zip is only defined when both sides have identical
  * partitioning and per-partition counts — a property no shuffled
  * DataFrame preserves, which is why the engine's GMM pipeline derives γ
  * as a COLUMN instead of zipping (SURVEY §1). This operator provides the
  * general contract for users who really do want pair-the-i-th-rows: each
  * side gets an explicit 1-based position under a caller-chosen total
  * order, and the join runs on position.
  *
  * Scale shape: the naive formulation is `row_number() OVER (ORDER BY k)`
  * — a global window that drags the whole input into ONE task. Here the
  * index comes from [[RangeCum]]'s distributed prefix-count instead
  * (range-repartition → partition-local window → ≤ n-row offset table →
  * broadcast combine), so every stage is partition-parallel. The
  * position join itself is one shuffle of each side on a dense long key
  * — the honest cost of aligning two arbitrary distributed orders; when
  * the sides are already co-derived (the reference's X.zip(gamma) case),
  * derive the second as a column instead and pay zero.
  *
  * Ordering must be total and unique per row (ties would make the
  * pairing nondeterministic — same contract as RangeCum): pass enough
  * columns to break ties, e.g. (value, id).
  */
object Zip {

  /** Adds a unique, dense, 1-based `posCol` under the total order given
    * by `orderCols` (lexicographic struct order). */
  def zipWithIndex(df: DataFrame, orderCols: Seq[String],
      posCol: String = "pos"): DataFrame = {
    require(orderCols.nonEmpty, "at least one order column")
    val ord = "_zip_ord"
    val one = "_zip_one"
    val indexed = RangeCum.withCums(
      df.withColumn(ord, struct(orderCols.map(col): _*))
        .withColumn(one, lit(1L)),
      orderCol = ord,
      cums = Seq(RangeCum.Cum(one, posCol, "sum", inclusive = true)))
    indexed.drop(ord, one)
  }

  /** Inner positional join: the i-th row of `a` (under `aOrder`) paired
    * with the i-th row of `b` (under `bOrder`); stops at the shorter
    * side, exactly like Scala's `zip`. Column names of the two sides
    * must be disjoint (alias upstream). Output carries `posCol`. */
  def zipByOrder(a: DataFrame, aOrder: Seq[String],
      b: DataFrame, bOrder: Seq[String],
      posCol: String = "pos"): DataFrame = {
    val ai = zipWithIndex(a, aOrder, posCol)
    val bi = zipWithIndex(b, bOrder, posCol)
    ai.join(bi, Seq(posCol))
  }
}
