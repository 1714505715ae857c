package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Decompose

/** Continuous level-shift monitoring over streaming series points: each
  * micro-batch of (key, period, value) rows upserts into a compact
  * per-key history (the most recent 2·w periods — all the Welch
  * mean-shift screen ever needs), [[Decompose.meanShift]] runs over the
  * merged history, and detections whose period arrived IN THIS BATCH
  * land in the alert table under the batch's own partition. The
  * streaming form of m21: a metering pipeline sees a step change in a
  * series within one micro-batch of the day that completes the window.
  *
  * State is the bounded history table (2·w rows per key, pruned every
  * batch), not executor memory — restarts recover from the parquet
  * state, and the monitor's cost per batch is one window over the
  * touched keys' short histories. Batch rows win over history on
  * (key, period) replays, so retractions/corrections take effect.
  *
  * Durability: the history is the ONLY copy of periods older than the
  * last batch, so it persists through [[StateStore]] versioned commits —
  * a crash mid-write leaves the previous committed version current
  * (an in-place overwrite would lose the whole window permanently;
  * the checkpoint replays only the last batch). Replays are fully
  * idempotent in BOTH tables: the history upsert is keyed on
  * (key, period) with batch-wins, and alerts dynamic-overwrite their
  * own batch_id partition instead of appending, so a replayed batch
  * replaces rather than duplicates its detections. */
object StreamingShift {

  def start(
      series: DataFrame,
      historyPath: String,
      outPath: String,
      checkpoint: String,
      w: Int = 7,
      z: Double = 3.0,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = series.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, historyPath, outPath, w, z)
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  /** One micro-batch — package-private so StreamingShiftSpec can replay
    * a batch directly and assert both tables end as a single clean
    * run's. */
  private[graft] def processBatch(
      batch: DataFrame,
      batchId: Long,
      historyPath: String,
      outPath: String,
      w: Int,
      z: Double): Unit = {
    val spark = batch.sparkSession
    val batchRows = batch.select(col("key"), col("period"), col("value"))
    if (!batchRows.isEmpty) {
      val hist = StateStore.readLatest(spark, historyPath)
        .getOrElse(batchRows.limit(0))
      // upsert: batch wins on (key, period); localCheckpoint pins the
      // merged history so the state write and the shift screen below
      // share one materialization
      val merged = hist
        .join(batchRows.select(col("key"), col("period")), Seq("key", "period"), "left_anti")
        .unionByName(batchRows)
      val wk = Window.partitionBy(col("key")).orderBy(col("period").desc)
      val pruned = merged
        .withColumn("__rn", row_number().over(wk))
        .filter(col("__rn") <= 2 * w)
        .drop("__rn")
        .localCheckpoint(true)
      // alerts FIRST, then state — both orders are replay-safe (the
      // upsert is idempotent, so a re-fold reproduces the identical
      // pruned history), but writing output first matches the other
      // streaming operators' convention
      val alerts = Decompose.meanShift(pruned, w, z)
        .filter(col("is_shift"))
        .join(
          batchRows.select(col("key"), col("period")).distinct(),
          Seq("key", "period"),
          "left_semi")
        .withColumn("batch_id", lit(batchId))
        .localCheckpoint(true)
      // empty guard: a quiet batch must not leave a schema-less dir
      if (!alerts.isEmpty)
        alerts.write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
      StateStore.writeVersion(pruned, historyPath, batchId)
    }
  }

  /** The latest committed history window — empty before the first
    * commit. */
  def historySnapshot(spark: SparkSession, historyPath: String): DataFrame =
    StateStore.readLatest(spark, historyPath).getOrElse(
      spark.emptyDataFrame
        .select(
          lit(null).cast("string").as("key"),
          lit(null).cast("date").as("period"),
          lit(null).cast("double").as("value"))
        .limit(0))
}
