package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
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

  /** Watermarked STREAM-STREAM interval join: every purchase matches the
    * same user's clicks from the preceding `lookback` — the streaming
    * counterpart of the batch [[graft.operators.AsofJoin]] /
    * [[graft.operators.IntervalJoin]] (all eligible clicks, not just the
    * nearest: streaming joins emit matches as they arrive, so "latest
    * only" would need a downstream aggregation). Both sides carry
    * watermarks and the join condition BOUNDS click time to
    * [p_ts − lookback, p_ts]; together those let Spark expire buffered
    * rows once the watermark passes them — bounded state, where an
    * unconstrained stream-stream join would buffer both streams forever.
    * Inner join: a purchase with no click in the window emits nothing
    * (the batch q24 keeps it with NULLs; streaming outer joins emit the
    * NULL row only after watermark expiry). */
  def attributedPurchases(
      events: DataFrame,
      watermark: String = "1 hour",
      lookback: String = "30 minutes"): DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("purchase_id"),
        col("user_id").as("p_user"),
        col("ts").as("p_ts"),
        col("value").as("purchase_value"))
      .withWatermark("p_ts", watermark)
    val clicks = events
      .filter(col("event_type") === "click")
      .select(
        col("event_id").as("click_id"),
        col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    purchases
      .join(clicks, expr(
        s"p_user = c_user AND c_ts >= p_ts - interval $lookback AND c_ts <= p_ts"))
      .select(
        col("purchase_id"),
        col("p_user").as("user_id"),
        col("p_ts"),
        col("purchase_value"),
        col("click_id"),
        col("c_ts"))
  }

  /** One event inside a session group (typed for the state function; keeps
    * the watermarked `ts` column itself — projecting it to millis before
    * the stateful op would drop the watermark the event-time timeout needs). */
  case class SessEvent(key: String, event_id: Long, ts: java.sql.Timestamp, value: Double)

  /** The per-key session state carried across micro-batches. `nEvents == 0`
    * marks a CLOSED tombstone: no session is open, but `sessionId` keeps
    * the numbering so the next session continues where batch q15 would
    * (restarting at 1 after a timeout would duplicate (key, session_id)
    * pairs). */
  case class OpenSession(
      sessionId: Long, startMs: Long, lastMs: Long, nEvents: Long, totalValue: Double)

  /** A finalized session — same shape and semantics as batch q15_sessions. */
  case class SessionOut(
      key: String, session_id: Long, n_events: Long, duration_ms: Long, total_value: Double)

  /** Streaming sessionization with custom state — the `flatMapGroupsWithState`
    * form of batch q15_sessions (30-min inactivity gap). Each key's open
    * session lives in the state store; a session is emitted either when a
    * later event opens the next one, or when the event-time watermark passes
    * `last event + gap` (timeout). After a timeout the state shrinks to a
    * session-counter tombstone (so later sessions continue the batch
    * numbering instead of reusing id 1) — state is one small record per
    * key ever seen, the same bound as any per-key aggregate, never
    * proportional to history.
    *
    * Semantics note (inherent to append-mode streaming): events are folded
    * in event-time order *within* each micro-batch; a session already closed
    * by the watermark cannot be reopened by late data — identical guarantees
    * to Spark's own `session_window`, but with the custom per-session state
    * (running totals, duration) the reference's batch query computes.
    */
  def sessionize(
      events: DataFrame,
      gapMs: Long = 1800000L,
      watermark: String = "1 day"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    def finalize(s: OpenSession, key: String): SessionOut =
      SessionOut(
        key, s.sessionId, s.nEvents, s.lastMs - s.startMs,
        BigDecimal(s.totalValue).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)

    val fn = (key: String, it: Iterator[SessEvent], state: GroupState[OpenSession]) =>
      if (state.hasTimedOut) {
        val out = state.getOption.filter(_.nEvents > 0).map(finalize(_, key)).iterator
        // Shrink to a tombstone instead of removing: the next session for
        // this key must continue the numbering, not restart at 1 (a restart
        // would emit a duplicate (key, session_id) and diverge from batch
        // q15). No timeout is re-armed, so the tombstone never fires again.
        state.getOption.foreach(s => state.update(OpenSession(s.sessionId, 0L, 0L, 0L, 0.0)))
        out
      } else {
        val sorted = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
        val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
        var open = state.getOption
        sorted.foreach { e =>
          val tsMs = e.ts.getTime
          open = open match {
            case Some(s) if s.nEvents > 0 && tsMs - s.lastMs <= gapMs =>
              // min/max fold: an on-time but out-of-order event from a later
              // micro-batch must not move lastMs backward (negative duration,
              // spurious gap split) or leave startMs after an earlier event.
              Some(s.copy(
                startMs = math.min(s.startMs, tsMs),
                lastMs = math.max(s.lastMs, tsMs),
                nEvents = s.nEvents + 1,
                totalValue = s.totalValue + e.value))
            case Some(s) if s.nEvents > 0 =>
              closed += finalize(s, key)
              Some(OpenSession(s.sessionId + 1, tsMs, tsMs, 1L, e.value))
            case Some(t) => // tombstone: resume numbering after a timeout
              Some(OpenSession(t.sessionId + 1, tsMs, tsMs, 1L, e.value))
            case None =>
              Some(OpenSession(1L, tsMs, tsMs, 1L, e.value))
          }
        }
        open.foreach { s =>
          state.update(s)
          // fire once the watermark passes the inactivity gap; clamp above
          // the current watermark (if the gap already elapsed, the session
          // closes on the next no-data batch — on time by construction,
          // since on-time events that could extend it can no longer arrive)
          state.setTimeoutTimestamp(
            math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs + 1))
        }
        closed.iterator
      }

    events
      .select(
        col("user_id").cast("string").as("key"),
        col("event_id"),
        col("ts"),
        col("value"))
      .withWatermark("ts", watermark)
      .as[SessEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

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
    * the touched keys, batch id) and owns the sink write.
    *
    * Durability audit: the store write below is `mode("overwrite")` but
    * it is NOT the [[StateStore]] torn-write hazard — dynamic partition
    * overwrite touches only THIS batch's own `batch_id` partition,
    * never the accumulated partitions of earlier batches, and a torn
    * write of the current partition is exactly what the checkpoint
    * replays (the retry re-delivers the same batch and replaces the
    * partial partition). Accumulated state is never deleted-then-
    * rewritten, so no versioning is needed here. */
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
