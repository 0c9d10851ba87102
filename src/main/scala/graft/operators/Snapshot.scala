package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot maintenance for plain-parquet pipelines: the declarative
  * MERGE/upsert without a transactional table format — compute the next
  * snapshot as a DataFrame and write it atomically (overwrite or a new
  * dated directory).
  */
object Snapshot {

  /** Key-based upsert: rows of `updates` replace base rows with matching
    * keys; unmatched update keys append. One anti-join + union — both
    * sides shuffle on the key once; over bucketed snapshot tables
    * (`sources/ParquetSink` bucketed layout) the anti-join is
    * shuffle-free, so the cost is one pass over base + updates.
    * Update rows must carry the full base schema (unionByName). */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    base
      .join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)

  /** Snapshot DIFF (pipeline audit: what changed between version t and
    * t+1): row-level status — added / removed / changed / unchanged —
    * plus the names of the changed columns. One full-outer join on the
    * key (both sides shuffle once; shuffle-free over bucketed snapshot
    * tables), null-safe per-column comparison so NULL→value and
    * value→NULL both count as changes. `compareCols` bounds the compared
    * set — at wide schemas pass only the audited columns so the join
    * payload stays narrow. */
  def diff(base: DataFrame, next: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    val a = base.select((key +: compareCols).map(col): _*).alias("a")
    val b = next.select((key +: compareCols).map(col): _*).alias("b")
    val changed = array_compact(array(compareCols.map(c =>
      when(not(col(s"a.$c") <=> col(s"b.$c")), lit(c))): _*))
    a.join(b, col(s"a.$key") === col(s"b.$key"), "full_outer")
      .select(
        coalesce(col(s"a.$key"), col(s"b.$key")).as(key),
        when(col(s"a.$key").isNull, lit("added"))
          .when(col(s"b.$key").isNull, lit("removed"))
          .when(size(changed) > 0, lit("changed"))
          .otherwise(lit("unchanged")).as("diff_status"),
        when(col(s"a.$key").isNotNull && col(s"b.$key").isNotNull, changed)
          .otherwise(array().cast("array<string>")).as("changed_cols"))
  }
}
