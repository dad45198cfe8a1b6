package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator family contributes a registry of named queries plus
  * (where SQL-expressible) an equivalent DuckDB oracle statement. Keys
  * must be unique across families; `Verify` dumps both maps for the
  * driver's differential check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    VendasMart.mart(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * north-star extension operators §2.9).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    VendasMart.queries ++ Relational.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      Analytics.queries ++ SetOpsJson.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    VendasMart.oracleSql ++ Relational.oracleSql ++ TextAnalysis.oracleSql ++
      Dedup.oracleSql ++ Similarity.oracleSql ++ Multimodal.oracleSql ++
      Analytics.oracleSql ++ SetOpsJson.oracleSql
}
