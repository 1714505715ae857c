package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.IncrementalAgg

/** Streaming maintenance of the [[IncrementalAgg]] state table: each
  * micro-batch folds into per-(slice, group) mergeable states, which
  * merge with the states already stored for the slices the batch
  * touches, and the result replaces EXACTLY those slices. The serving
  * rollup — [[rollup]] — never sees raw events and never re-reads
  * history.
  *
  * This is the state-TABLE form of a watermarked streaming aggregation
  * ([[EventsStream.dailySeries]] is the in-store form): state lives in
  * plain parquet readable by any engine, survives stream restarts by
  * construction, and supports out-of-order arrivals of ANY lateness —
  * a late event's slice is simply merged again, where a watermark would
  * have dropped it. The tradeoff is per-batch write amplification
  * proportional to touched slices, which is why states are
  * constant-size per (slice, group).
  *
  * Durability: unlike the BATCH incremental path
  * ([[IncrementalAgg.writeStates]], where a torn dynamic-partition
  * overwrite is recoverable by re-running the slice from the raw
  * events that still exist), the streaming fold merges the stored
  * state INTO ITSELF — a torn slice write would bake the loss in
  * permanently. So each slice is its own [[StateStore]] versioned root
  * (`state/slice=<s>/v<batch>/`): a batch commits a NEW version for
  * each touched slice, readers take the latest committed version per
  * slice, and a crash mid-write leaves the previous version current.
  * Write amplification stays proportional to touched slices.
  *
  * Exactly-once: foreachBatch replays a failed batch under the same id;
  * re-merging the same batch into already-updated slices would
  * double-count, so each slice's state carries the last applied
  * `batch_id` and replays of an already-applied batch are skipped
  * per-slice — a crash part-way through the touched set replays only
  * the unstamped slices.
  */
object StreamingRollup {

  /** Start maintaining `statePath` from `events`. `sliceCol` must be a
    * string expression over the event columns (e.g.
    * `to_date(col("ts")).cast("string")`). */
  def start(
      events: DataFrame,
      statePath: String,
      checkpoint: String,
      sliceCol: Column,
      groupCols: Seq[String],
      valueCol: Column,
      distinctCol: Column,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val spark = events.sparkSession
    val writer = events.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val batchStates = IncrementalAgg
          .partialStates(batch, sliceCol, groupCols.map(col), valueCol, distinctCol)
          .cache()
        try {
          val touched = batchStates.select(col("slice")).distinct()
            .collect().map(_.getString(0)).toSet
          if (touched.nonEmpty) {
            val existing = StateStore
              .readLatestSlices(spark, statePath, touched.contains)
              .getOrElse(batchStates.limit(0).withColumn("batch_id", lit(0L)).filter(lit(false)))
            // idempotent replay: slices already stamped with this batch id
            // were fully committed before the crash — leave them alone
            val replayed = existing.filter(col("batch_id") === batchId)
              .select(col("slice")).distinct().collect().map(_.getString(0)).toSet
            val todo = touched -- replayed
            if (todo.nonEmpty) {
              // localCheckpoint pins the merge so the per-slice commits
              // below slice ONE materialization instead of re-merging
              val merged = IncrementalAgg.mergeStatesRaw(
                existing.filter(col("slice").isin(todo.toSeq: _*)).drop("batch_id")
                  .unionByName(batchStates.filter(col("slice").isin(todo.toSeq: _*))),
                "slice" +: groupCols)
                .withColumn("batch_id", lit(batchId))
                .localCheckpoint(true)
              // one commit per touched slice (typically 1-3 per batch);
              // state per slice is O(groups) constant-size rows -> 1 file
              todo.toSeq.sorted.foreach { s =>
                StateStore.writeSliceVersion(
                  merged.filter(col("slice") === s).coalesce(1),
                  statePath, s, batchId)
              }
            }
          }
        } finally batchStates.unpersist(blocking = false)
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  /** Serving read over the stream-maintained state: the rollup over an
    * optional slice range. Range pruning happens on the DRIVER's slice
    * listing — out-of-range slices never enter the plan at all, the
    * versioned-layout analogue of [[IncrementalAgg.rollupFromStore]]'s
    * partition filter. */
  def rollup(
      spark: SparkSession,
      statePath: String,
      groupCols: Seq[String],
      sliceFrom: Option[String] = None,
      sliceTo: Option[String] = None): DataFrame = {
    val pred = (s: String) =>
      sliceFrom.forall(s >= _) && sliceTo.forall(s <= _)
    StateStore.readLatestSlices(spark, statePath, pred) match {
      case Some(states) => IncrementalAgg.mergeStates(states.drop("batch_id"), groupCols)
      case None =>
        spark.emptyDataFrame
          .select(groupCols.map(c => lit(null).cast("string").as(c)) ++ Seq(
            lit(0L).as("n_rows"), lit(0.0).as("total_value"),
            lit(null).cast("double").as("min_value"),
            lit(null).cast("double").as("max_value"),
            lit(0L).as("distinct_est")): _*)
          .limit(0)
    }
  }
}
