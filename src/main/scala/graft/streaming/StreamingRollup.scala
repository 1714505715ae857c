package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.IncrementalAgg

/** Streaming maintenance of the [[IncrementalAgg]] state table: each
  * micro-batch folds into per-(slice, group) mergeable states, which
  * merge with the states already stored for the slices the batch
  * touches, and the result replaces EXACTLY those slice partitions
  * (dynamic overwrite). The serving rollup —
  * [[IncrementalAgg.rollupFromStore]] — never sees raw events and
  * never re-reads history.
  *
  * This is the state-TABLE form of a watermarked streaming aggregation
  * ([[EventsStream.dailySeries]] is the in-store form): state lives in
  * plain parquet readable by any engine, survives stream restarts by
  * construction, and supports out-of-order arrivals of ANY lateness —
  * a late event's slice partition is simply merged again, where a
  * watermark would have dropped it. The tradeoff is per-batch write
  * amplification proportional to touched slices, which is why states
  * are constant-size per (slice, group).
  *
  * Exactly-once: foreachBatch replays a failed batch under the same id;
  * re-merging the same batch into already-updated slices would
  * double-count, so each slice partition carries the last applied
  * `batch_id` and replays of an already-applied batch are skipped
  * per-slice (the standard idempotent-sink recipe).
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
            val existing =
              if (StateStore.exists(spark, statePath))
                spark.read.parquet(statePath)
                  .filter(col("slice").isin(touched.toSeq: _*))
              else batchStates.limit(0).withColumn("batch_id", lit(0L)).filter(lit(false))
            // idempotent replay: slices already stamped with this batch id
            // were fully written before the crash — leave them alone
            val replayed = existing.filter(col("batch_id") === batchId)
              .select(col("slice")).distinct().collect().map(_.getString(0)).toSet
            val todo = touched -- replayed
            if (todo.nonEmpty) {
              val merged = IncrementalAgg.mergeStatesRaw(
                existing.filter(col("slice").isin(todo.toSeq: _*)).drop("batch_id")
                  .unionByName(batchStates.filter(col("slice").isin(todo.toSeq: _*))),
                "slice" +: groupCols)
              IncrementalAgg.writeStates(
                merged.withColumn("batch_id", lit(batchId)), statePath)
            }
          }
        } finally batchStates.unpersist(blocking = false)
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}
