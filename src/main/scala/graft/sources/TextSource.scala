package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Line-delimited text ingestion — the reference's only source
  * (Krosent/ema-bigdata `Main.scala:40-41`:
  * `sc.textFile(path).map(el => el.toDouble)`), re-expressed as a
  * DataFrame scan so Catalyst supplies split planning, column pruning
  * and (for the lenient path) null filtering.
  */
object TextSource {

  /** Strict parse, matching the reference exactly: any malformed line
    * fails the job (`String.toDouble` semantics via ANSI cast). */
  def doubles(spark: SparkSession, path: String): Dataset[java.lang.Double] = {
    import spark.implicits._
    spark.read.textFile(path)
      .select(expr("CAST(value AS DOUBLE)").as("x"))
      .as[java.lang.Double]
  }

  /** Lenient parse: malformed lines become NULL and are dropped —
    * the production-sane variant (try_cast). */
  def doublesLenient(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path)
      .select(col("value").try_cast("double").as("x"))
      .where(col("x").isNotNull)
}
