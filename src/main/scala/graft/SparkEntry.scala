package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All operator packs register here: every implemented operator from
  * SURVEY.md §2 gets a `queries` entry, and (when ANSI-SQL-expressible) a
  * DuckDB oracle in `oracleSql`. Non-SQL operators (crawl rounds, extract
  * kernel, MinHash-LSH, …) are covered by ScalaTest oracles instead.
  */
object SparkEntry {

  private def allSpecs: Seq[QuerySpec] =
    Relational.specs ++ TextQueries.specs ++ DedupQueries.specs ++
      SimilarityQueries.specs ++ CrawlQueries.specs ++ ToolQueries.specs ++
      FetchQueries.specs ++ StreamQueries.specs ++ ReportQueries.specs ++
      ComplianceQueries.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.specs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(s => s.name -> s.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.collect { case QuerySpec(n, _, Some(sql)) => n -> sql }.toMap
}
