package graft

import graft.core.MappingConfig
import graft.operators.{DtwMapping, LagCorrelation, MappingEngine}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query takes (spark, sfDir) and reads the harness parquet tables.
  * Float outputs are rounded to 6 decimals and integer outputs cast to long
  * so the DuckDB oracle comparison is bit-stable across engines.
  */
object SparkEntry {

  private def cfg: MappingConfig = Tables.mappingConfig

  /** Flagship: end-to-end lag-correlation mapping on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("m5_corr_mapping")(spark, "/root/testdata/sf0.001")

  // ---- mapping-engine queries (events-derived daily series) ----

  private def series(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) =
    (Tables.engagementSeries(spark, sfDir), Tables.purchaseSeries(spark, sfDir))

  private def merged(spark: SparkSession, sfDir: String): DataFrame = {
    val (t1, t2) = series(spark, sfDir)
    graft.core.SeriesTable.merge(t1, t2)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1 projection + A3 group-by agg at the scan (SURVEY.md §2.2, §2.4)
    "m1_series_agg" -> ((s, dir) => {
      Tables.engagementSeries(s, dir).select(
        col("key"),
        date_format(col("period"), "yyyy-MM-dd").as("period"),
        round(col("value"), 6).as("value1"))
    }),
    // J1 inner equi-join on (key, period) — the merge step (§2.3 J1)
    "m2_merged" -> ((s, dir) => {
      merged(s, dir).select(
        col("key"),
        date_format(col("period"), "yyyy-MM-dd").as("period"),
        round(col("v1"), 6).as("v1"),
        round(col("v2"), 6).as("v2"))
    }),
    // A10a relational lag-corr table: explode lags + self-join + corr agg
    "m3_lag_corr" -> ((s, dir) => {
      LagCorrelation.lagCorrTable(merged(s, dir), cfg).select(
        col("key"),
        col("lag").cast("long").as("lag"),
        round(col("correlation"), 6).as("correlation"),
        col("n_overlap"))
    }),
    // window argmax: best lag per entity (§2.5)
    "m4_best_lag" -> ((s, dir) => {
      LagCorrelation.bestLag(LagCorrelation.lagCorrTable(merged(s, dir), cfg)).select(
        col("key"),
        col("optimal_lag").cast("long").as("optimal_lag"),
        col("correlation"),
        col("n_overlap"))
    }),
    // J2 lag-shifted equi-join + J3/J4 broadcast join-backs: full mapping
    "m5_corr_mapping" -> ((s, dir) => {
      val (t1, t2) = series(s, dir)
      val best = LagCorrelation.bestLag(LagCorrelation.lagCorrTable(merged(s, dir), cfg))
      LagCorrelation.mapping(t1, t2, best, cfg).select(
        col("key"),
        col("time1"),
        round(col("value1"), 6).as("value1"),
        col("time2"),
        round(col("value2"), 6).as("value2"),
        col("lag_offset").cast("long").as("lag_offset"),
        col("method"),
        col("correlation"))
    }),
    // A11 typed in-JVM DTW via mapGroups + explode (no SQL oracle: rows-only)
    "m6_dtw_mapping" -> ((s, dir) => {
      DtwMapping.mapping(merged(s, dir), cfg).select(
        col("key"), col("time1"), round(col("value1"), 6).as("value1"),
        col("time2"), round(col("value2"), 6).as("value2"),
        col("method"), col("dtw_cost"))
    }),
    // auto mode: corr/dtw split at 0.7 + unionByName (rows-only)
    "m7_auto_mapping" -> ((s, dir) => {
      val (t1, t2) = series(s, dir)
      MappingEngine.autoMapping(merged(s, dir), t1, t2, cfg).select(
        col("key"), col("time1"), round(col("value1"), 6).as("value1"),
        col("time2"), round(col("value2"), 6).as("value2"),
        col("lag_offset").cast("long").as("lag_offset"),
        col("method"), col("correlation"), col("dtw_cost"))
    }),

    // ---- relational operators on the TPC-H-ish tables ----

    // A1 multi-metric hash aggregate with exact decimal sums
    "q1_agg" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          count(lit(1)).as("count_order"))
    })
  )

  /** DuckDB-equivalent ANSI SQL per query (omitted → rows-only check). */
  def oracleSql: Map[String, String] = {
    // Shared CTE prefix: events → canonical daily series → merged → corr scan.
    val seriesCte =
      """WITH t1 AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, CAST(ts AS DATE) AS period, SUM(value) AS v1
        |  FROM events WHERE event_type IN ('click','view') GROUP BY 1, 2
        |), t2 AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, CAST(ts AS DATE) AS period, SUM(value) AS v2
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |), merged AS (
        |  SELECT t1.key, t1.period, t1.v1, t2.v2 FROM t1 JOIN t2 USING (key, period)
        |), corrs AS (
        |  SELECT m.key, CAST(l.lag AS BIGINT) AS lag, corr(m.v1, r.v2) AS correlation, COUNT(*) AS n_overlap
        |  FROM merged m
        |  CROSS JOIN (SELECT UNNEST(range(0, 7)) AS lag) l
        |  JOIN merged r ON r.key = m.key AND r.period = m.period + CAST(l.lag AS INTEGER)
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |), valid_corrs AS (
        |  SELECT * FROM corrs WHERE correlation IS NOT NULL AND NOT isnan(correlation)
        |), best AS (
        |  SELECT key, lag, round(correlation, 6) AS correlation, n_overlap,
        |         row_number() OVER (PARTITION BY key ORDER BY round(correlation, 6) DESC, lag ASC) AS rn
        |  FROM valid_corrs
        |), best1 AS (
        |  SELECT key, lag AS optimal_lag, correlation, n_overlap FROM best WHERE rn = 1
        |)""".stripMargin

    Map(
      "m1_series_agg" ->
        s"""$seriesCte SELECT key, CAST(period AS VARCHAR) AS period, round(v1, 6) AS value1 FROM t1""",
      "m2_merged" ->
        s"""$seriesCte SELECT key, CAST(period AS VARCHAR) AS period, round(v1, 6) AS v1, round(v2, 6) AS v2 FROM merged""",
      "m3_lag_corr" ->
        s"""$seriesCte SELECT key, lag, round(correlation, 6) AS correlation, n_overlap FROM valid_corrs""",
      "m4_best_lag" ->
        s"""$seriesCte SELECT key, optimal_lag, correlation, n_overlap FROM best1""",
      "m5_corr_mapping" ->
        s"""$seriesCte, valid AS (SELECT * FROM best1 WHERE correlation >= 0.3)
           |SELECT t1.key, CAST(t1.period AS VARCHAR) AS time1, round(t1.v1, 6) AS value1,
           |       CAST(t2.period AS VARCHAR) AS time2, round(t2.v2, 6) AS value2,
           |       v.optimal_lag AS lag_offset, 'correlation' AS method, v.correlation
           |FROM t1 JOIN valid v ON v.key = t1.key
           |JOIN t2 ON t2.key = t1.key AND t2.period = t1.period + CAST(v.optimal_lag AS INTEGER)""".stripMargin,
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
          |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          |       COUNT(*) AS count_order
          |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01'
          |GROUP BY l_returnflag, l_linestatus""".stripMargin
    )
  }
}
