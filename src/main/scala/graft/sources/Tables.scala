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
    // The harness `events` table stores TIMESTAMP(NANOS) which the parquet
    // reader rejects by default; read nanos as long, then rebuild a
    // microsecond timestamp (integral division — doubles would lose
    // precision above 2^53 nanos).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None    => df
    }
  }

  /** The mapping engine's table1: daily engagement (click+view value) per
    * user, from the `events` table. Aggregation before the engine — the
    * partial-aggregate (map-side combine) happens at the scan. */
  def engagementSeries(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(
        col("user_id").cast("string").as("key"),
        to_date(col("ts")).as("period"),
        col("value"))
      .groupBy(col("key"), col("period"))
      .agg(sum(col("value")).as("value"))

  /** The mapping engine's table2: daily purchase value per user. */
  def purchaseSeries(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").cast("string").as("key"),
        to_date(col("ts")).as("period"),
        col("value"))
      .groupBy(col("key"), col("period"))
      .agg(sum(col("value")).as("value"))

  /** Daily period: the harness events span a single month (TESTDATA.md),
    * so lag analysis runs on days, exercising the engine's parameterized
    * period unit. */
  val mappingConfig: MappingConfig =
    MappingConfig(periodUnit = PeriodUnit.Day, maxLag = 6)
}
