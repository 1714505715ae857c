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

  /** Streaming exact deduplication by event id: late/replayed copies
    * inside the watermark horizon are dropped with bounded state
    * (`dropDuplicatesWithinWatermark` expires ids once the watermark
    * passes them — unbounded-state `dropDuplicates` is the non-scalable
    * alternative). Feed this BEFORE the window aggregation when the
    * source is at-least-once. */
  def dedupedEvents(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

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

  /** Stream-driven incremental mapping: each micro-batch of finalized
    * daily windows lands in the series store, then the batch mapping core
    * re-maps ONLY the entities the batch touched (the streaming
    * equivalent of the reference's "incremental" date-range re-run,
    * 05_prod_dev.py:1054-1101, but keyed by affected entity instead of a
    * blanket date filter). `mapBatch` receives (accumulated series for
    * the touched keys, batch id) and owns the sink write. */
  def incrementalMapping(
      series: DataFrame,
      storePath: String,
      checkpoint: String)(mapBatch: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    series.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Append mode emits nothing until the watermark passes a window:
        // skip empty batches (writing one would leave a schema-less store).
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          // foreachBatch is at-least-once: land each batch in its own
          // partition with dynamic overwrite so a retry REPLACES the
          // partial write instead of appending duplicate (key, period)
          // rows (which would corrupt every later re-map).
          batch
            .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
            .write
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(storePath)
          val touched = batch.select("key").distinct()
          val accumulated = spark.read.parquet(storePath)
            .drop("batch_id")
            .join(org.apache.spark.sql.functions.broadcast(touched), Seq("key"), "left_semi")
          mapBatch(accumulated, batchId)
        }
      }
}
