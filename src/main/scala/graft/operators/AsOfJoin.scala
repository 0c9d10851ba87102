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

  /** Event-time column as a comparable number: microseconds for
    * timestamps, the raw value for numerics — gaps and tolerances are in
    * these units. */
  private def tsNum(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c).cast("double")
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(c.cast("timestamp")).cast("double")
      case _ => c.cast("double")
    }

  /** FORWARD as-of join: for every left row, attach the EARLIEST right
    * row with `right.tsCol >= left.tsCol` (inclusive) and equal keys —
    * the "next event after" lookup (pandas `merge_asof
    * direction='forward'`). Same union + one-shuffle window pattern as
    * [[leftAsOf]], mirrored: left rows sort BEFORE right rows at equal
    * ts (so the frame starting at the current row still sees same-ts
    * matches) and a running `min(struct(ts, tiebreak, payload...))` over
    * [current row, unbounded following] carries the nearest FUTURE right
    * row backward. Ties at identical rightTs resolve to the SMALLEST
    * `tiebreakCol` (min-struct ordering — the mirror of backward's
    * latest-wins).
    * @param tolerance max allowed gap `right.ts - left.ts` (micros for
    *        timestamps, raw units for numerics); matches farther out are
    *        nulled, left rows always kept. */
  def leftAsOfForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tiebreakCol: String,
      tolerance: Option[Double] = None,
      outPrefix: String = "asof_"): DataFrame = {
    require(payload.contains(tiebreakCol), "tiebreakCol must be part of payload")
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(
      (col(rightTs).as("_t") +: col(tiebreakCol).as("_tb") +:
        payload.map(c => col(c))): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("_ts") :+ lit(1).as("_side")
        :+ payloadStruct.as("_p")): _*)
    val l = left.select(
      (keys.map(col) :+ col(leftTs).as("_ts") :+ lit(0).as("_side")
        :+ lit(null).cast(r.schema("_p").dataType).as("_p")
        :+ struct(leftCols.map(col): _*).as("_l")): _*)
    val rWithL = r.withColumn("_l", lit(null).cast(l.schema("_l").dataType))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"), col("_p._tb"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tsType = left.schema(leftTs).dataType
    val rawMatch = min(col("_p")).over(w)
    val carried = l.unionByName(rWithL)
      .withColumn("_match", tolerance match {
        case None => rawMatch
        case Some(tol) =>
          val m = rawMatch
          when(m.isNotNull &&
            tsNum(m.getField("_t"), right.schema(rightTs).dataType)
              - tsNum(col("_ts"), tsType) <= lit(tol), m)
      })
      .where(col("_side") === 0)
    val out = leftCols.map(c => col(s"_l.$c").as(c)) ++
      payload.map(c => col(s"_match.$c").as(s"$outPrefix$c"))
    carried.select(out: _*)
  }

  /** NEAREST as-of join: for every left row, attach the right row with
    * the smallest |right.ts - left.ts| over equal keys; exact ties
    * between a past and a future match at the same distance resolve
    * BACKWARD (the pandas `direction='nearest'` convention). ONE shuffle
    * and ONE sort: both direction carries are windows over the same
    * (keys, ts, side) ordering — backward `max` over [preceding,
    * current], forward `min` over [current, following]. Right rows sort
    * before left rows at equal ts, so the backward carry is inclusive
    * and the forward frame excludes same-ts rows — harmless, because an
    * equal-ts match has gap 0 and backward wins it by the tie rule.
    * @param tolerance max allowed |gap| (micros for timestamps, raw
    *        units for numerics). */
  def leftAsOfNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tiebreakCol: String,
      tolerance: Option[Double] = None,
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
    val ord = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"), col("_p._tb"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tsType = left.schema(leftTs).dataType
    val rtType = right.schema(rightTs).dataType
    val lNum = tsNum(col("_ts"), tsType)
    def gateTol(m: Column, gap: Column): Column = tolerance match {
      case None => m
      case Some(tol) => when(m.isNotNull && gap <= lit(tol), m)
    }
    val carried = l.unionByName(rWithL)
      .withColumn("_b", max(col("_p")).over(wb))
      .withColumn("_f", min(col("_p")).over(wf))
      .where(col("_side") === 1)
      .withColumn("_bg", lNum - tsNum(col("_b._t"), rtType))
      .withColumn("_fg", tsNum(col("_f._t"), rtType) - lNum)
      .withColumn("_bv", gateTol(col("_b"), col("_bg")))
      .withColumn("_fv", gateTol(col("_f"), col("_fg")))
      // backward wins exact-distance ties; a missing side yields the other
      .withColumn("_match",
        when(col("_fv").isNull, col("_bv"))
          .when(col("_bv").isNull, col("_fv"))
          .when(col("_bg") <= col("_fg"), col("_bv"))
          .otherwise(col("_fv")))
    val out = leftCols.map(c => col(s"_l.$c").as(c)) ++
      payload.map(c => col(s"_match.$c").as(s"$outPrefix$c"))
    carried.select(out: _*)
  }
}
