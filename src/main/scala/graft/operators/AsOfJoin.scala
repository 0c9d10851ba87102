package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Left as-of join: for every left row, attach the latest right row with
  * `right.tsCol <= left.tsCol` (inclusive) and equal join keys.
  *
  * Implemented with the scalable union + window pattern rather than a
  * range/theta join:
  *   1. tag both inputs and union them on a common schema,
  *   2. one shuffle, partitioned by the join keys and ordered by
  *      (ts, side) — right rows sort before left rows at equal ts,
  *   3. a running `max(struct(ts, tiebreak, payload...))` over the frame
  *      [unbounded preceding, current row] carries the most recent right
  *      payload forward (struct ordering is lexicographic, so the max is
  *      the latest right row, ties broken by `tiebreakCol`),
  *   4. keep the left rows and unpack the carried struct.
  *
  * Cost at scale: ONE shuffle of |L|+|R| rows on the key — no range
  * explosion (a naive `l.ts >= r.ts` theta join is |L|x|R| per key), no
  * broadcast requirement. Skewed keys are handled by AQE like any other
  * window shuffle.
  */
object AsOfJoin {

  /** @param left        rows to enrich (keeps ALL left rows — outer semantics)
    * @param right       lookup stream; columns listed in `payload` are carried
    * @param keys        equi-join key column names (present in both inputs)
    * @param leftTs      event-time column in `left`
    * @param rightTs     event-time column in `right`
    * @param payload     right columns to attach (null when no match yet)
    * @param tiebreakCol right column ordering ties at identical rightTs
    *                    (latest wins); must be in `payload`
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tiebreakCol: String,
      outPrefix: String = "asof_"): DataFrame = {
    require(payload.contains(tiebreakCol), "tiebreakCol must be part of payload")
    val leftCols = left.columns.toSeq

    val payloadStruct = struct(
      (col(rightTs).as("_t") +: col(tiebreakCol).as("_tb") +:
        payload.map(c => col(c))): _*)

    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("_ts") :+ lit(0).as("_side")
        :+ payloadStruct.as("_p")): _*)
    val l = left.select(
      (keys.map(col) :+ col(leftTs).as("_ts") :+ lit(1).as("_side")
        :+ lit(null).cast(r.schema("_p").dataType).as("_p")
        :+ struct(leftCols.map(col): _*).as("_l")): _*)
    val rWithL = r.withColumn("_l", lit(null).cast(l.schema("_l").dataType))

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"), col("_p._tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(rWithL)
      .withColumn("_match", max(col("_p")).over(w))
      .where(col("_side") === 1)

    val out = leftCols.map(c => col(s"_l.$c").as(c)) ++
      payload.map(c => col(s"_match.$c").as(s"$outPrefix$c"))
    carried.select(out: _*)
  }
}
