package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Contract of the events loader's `ts` normalization. The driver
  * regenerates /root/testdata between rounds and has already shipped
  * `events.ts` under two different parquet encodings (TIMESTAMP(NANOS),
  * which Spark 4 only reads as a raw long under the legacy conf, and
  * TIMESTAMP(MICROS) without UTC adjustment, which reads as
  * TIMESTAMP_NTZ). `Tables.events` must map BOTH to the same session-TZ
  * TimestampType column with identical wall-clock values — otherwise a
  * generator change silently breaks every events-derived query (this is
  * exactly what produced the round-5 recorded-bench failure).
  */
class TablesSpec extends SparkSpec {

  // 2024-01-05 12:34:56.789012 UTC, in micros since epoch.
  private val micros = 1704458096789012L

  private def writeAndLoad(writeTs: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): java.sql.Timestamp = {
    val dir = Files.createTempDirectory("graft_tables_spec").toFile
    val base = spark.range(1).select(
      col("id").as("event_id"), lit(7L).as("user_id"),
      lit("click").as("event_type"), lit(1.5).as("value"),
      lit("{}").as("props"))
    writeTs(base).write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/events.parquet")
    val out = Tables.events(spark, dir.getAbsolutePath)
    out.schema("ts").dataType shouldBe org.apache.spark.sql.types.TimestampType
    val v = out.select(col("ts")).head().getTimestamp(0)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(dir)
    v
  }

  test("long nanos, NTZ micros and LTZ micros encodings normalize identically") {
    val fromNanos = writeAndLoad(_.withColumn("ts", lit(micros * 1000L)))
    val fromNtz = writeAndLoad(
      _.withColumn("ts", timestamp_micros(lit(micros)).cast("timestamp_ntz")))
    val fromLtz = writeAndLoad(_.withColumn("ts", timestamp_micros(lit(micros))))
    fromNanos shouldBe fromNtz
    fromNtz shouldBe fromLtz
    fromLtz.getTime shouldBe micros / 1000L // wall-clock ms preserved
  }

  test("nanos floor-divide to micros like DuckDB truncation") {
    // 999 trailing nanos must truncate toward negative infinity, not round
    val v = writeAndLoad(_.withColumn("ts", lit(micros * 1000L + 999L)))
    v.getTime shouldBe micros / 1000L
  }
}
