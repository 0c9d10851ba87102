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
}
