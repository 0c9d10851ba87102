package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: the Spark query, an optional DuckDB oracle
  * (omitted only for non-SQL-expressible ops, e.g. iterative EM), and
  * whether it belongs in the headline benchmark set.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    bench: Boolean = true)
