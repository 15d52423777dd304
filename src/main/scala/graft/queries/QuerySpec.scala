package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) a DuckDB oracle over the same parquet tables.
  * `sql == None` ⇒ the driver records a weaker rows-only check; those
  * operators carry their own ScalaTest oracle instead.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])
