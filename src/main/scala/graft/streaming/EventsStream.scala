package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming ingestion of the events table: a watermarked
  * tumbling-window pre-aggregation producing the same canonical
  * (key, period, v1, v2) series the batch mapping core consumes.
  *
  * The reference has no streaming (SURVEY.md §2.9 — its "incremental" mode
  * is a batch date filter); this is the Spark-native upgrade path: the
  * stream maintains per-(user, day) partial sums with event-time
  * watermarking, and the mapping core runs on the continuously-updated
  * sink exactly as on a batch table.
  *
  * Scale notes: stateful aggregation keyed by (user, window) — state is
  * bounded by watermark expiry; partial aggregation happens before the
  * state store; sink is append-mode once windows finalize.
  */
object EventsStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet/json files. */
  def readEvents(spark: SparkSession, dir: String, format: String = "parquet"): DataFrame =
    spark.readStream.schema(eventSchema).format(format).load(dir)

  /** Watermarked daily tumbling-window series aggregation — streaming
    * equivalent of Tables.bothSeries. */
  def dailySeries(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .filter(col("event_type").isin("click", "view", "purchase"))
      .withWatermark("ts", watermark)
      .groupBy(
        col("user_id").cast("string").as("key"),
        window(col("ts"), "1 day").as("w"))
      .agg(
        sum(when(col("event_type").isin("click", "view"), col("value"))).as("v1"),
        sum(when(col("event_type") === "purchase", col("value"))).as("v2"))
      .select(col("key"), to_date(col("w.start")).as("period"), col("v1"), col("v2"))

  /** Append-mode writer to a parquet sink (finalized windows only). */
  def writer(series: DataFrame, path: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    series.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
}
