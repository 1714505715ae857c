package graft.sources

import graft.core.{MappingConfig, PeriodUnit, SeriesTable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet source adapters for the harness tables (TESTDATA.md) and the
  * events→series derivation used by the mapping queries.
  *
  * The reference reads Delta tables (/root/reference/05_prod_dev.py:804-805);
  * the harness data is parquet — same columnar scan path, with predicate
  * pushdown and column pruning handled by the parquet DataSource.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    graft.core.GraftSession.tune(spark)
    // Normalize `ts` across harness writer versions: TIMESTAMP(NANOS)
    // arrives as a long (rebuild micros by integral division — doubles
    // would lose precision above 2^53 nanos); a tz-naive writer arrives
    // as TIMESTAMP_NTZ (cast to TIMESTAMP — value-preserving since every
    // engine session pins spark.sql.session.timeZone=UTC, and required
    // by the instant functions: unix_millis rejects NTZ).
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Both daily series in ONE pass over `events`: conditional sums per
    * (user, day) — one scan + one partial-aggregated shuffle instead of
    * two scans and a join. At 100 TB this halves the input I/O of the
    * mapping pipeline and removes a shuffle entirely; the `merged` table
    * falls out of the same aggregate (rows where both sums are non-null).
    *
    * Output: (key, period, v1, v2) with v1 = click+view value sum,
    * v2 = purchase value sum; null where that day has no such events. */
  def bothSeries(spark: SparkSession, sfDir: String): DataFrame =
    // The canonical series is the shared staging table of the whole
    // mapping query family — cached per (session, dir), the way a
    // production deployment would materialize it once and fan out.
    // Long-lived drivers iterating many datasets call clearCache between.
    StagingCache.getOrElseUpdate(spark, s"bothSeries:$sfDir") {
      load(spark, sfDir, "events")
        .filter(col("event_type").isin("click", "view", "purchase"))
        .select(
          col("user_id").cast("string").as("key"),
          to_date(col("ts")).as("period"),
          col("event_type"),
          col("value"))
        .groupBy(col("key"), col("period"))
        .agg(
          sum(when(col("event_type").isin("click", "view"), col("value"))).as("v1"),
          sum(when(col("event_type") === "purchase", col("value"))).as("v2"))
    }

  /** Format-generic source/sink: parquet (default), csv (header+schema
    * inference off — pass a schema for production), json, orc. The engine
    * is format-agnostic above this point; the canonical-series contract
    * is the only coupling. */
  def loadAs(
      spark: SparkSession,
      path: String,
      format: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    graft.core.GraftSession.tune(spark)
    spark.read.options(options).format(format).load(path)
  }

  def writeAs(
      df: DataFrame,
      path: String,
      format: String,
      mode: String = "overwrite",
      options: Map[String, String] = Map.empty): Unit =
    df.write.mode(mode).options(options).format(format).save(path)

  /** Unpersist and forget EVERY staging table for `spark` (all sessions
    * when None) — the canonical series, the best-lag table, and any other
    * StagingCache entry. */
  def clearCache(spark: Option[SparkSession] = None): Unit =
    StagingCache.clear(spark)

  /** The mapping engine's table1: daily engagement (click+view value) per
    * user. Projected from the shared one-pass aggregate. */
  def engagementSeries(spark: SparkSession, sfDir: String): DataFrame =
    bothSeries(spark, sfDir)
      .filter(col("v1").isNotNull)
      .select(col("key"), col("period"), col("v1").as("value"))

  /** The mapping engine's table2: daily purchase value per user. */
  def purchaseSeries(spark: SparkSession, sfDir: String): DataFrame =
    bothSeries(spark, sfDir)
      .filter(col("v2").isNotNull)
      .select(col("key"), col("period"), col("v2").as("value"))

  /** Merged series without a join: both sums present on the same day. */
  def mergedSeries(spark: SparkSession, sfDir: String): DataFrame =
    bothSeries(spark, sfDir)
      .filter(col("v1").isNotNull && col("v2").isNotNull)

  /** Daily period: the harness events span a single month (TESTDATA.md),
    * so lag analysis runs on days, exercising the engine's parameterized
    * period unit. */
  val mappingConfig: MappingConfig =
    MappingConfig(periodUnit = PeriodUnit.Day, maxLag = 6)
}
