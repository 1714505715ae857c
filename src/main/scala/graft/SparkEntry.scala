package graft

import graft.queries.{MappingQueries, RelationalQueries, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registries live in graft.queries.*; every query takes
  * (spark, sfDir) and reads the harness parquet tables. Float outputs are
  * rounded to 6 decimals / exact-decimal sums and integer outputs cast to
  * long so the DuckDB oracle comparison is bit-stable across engines.
  */
object SparkEntry {

  /** Flagship: end-to-end lag-correlation mapping on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("m5_corr_mapping")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    MappingQueries.queries ++ RelationalQueries.queries ++ TextQueries.queries

  /** DuckDB-equivalent ANSI SQL per query (omitted → rows-only check). */
  def oracleSql: Map[String, String] =
    MappingQueries.oracleSql ++ RelationalQueries.oracleSql ++ TextQueries.oracleSql
}
