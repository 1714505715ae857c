package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Decompose

/** Continuous level-shift monitoring over streaming series points: each
  * micro-batch of (key, period, value) rows upserts into a compact
  * per-key history (the most recent 2·w periods — all the Welch
  * mean-shift screen ever needs), [[Decompose.meanShift]] runs over the
  * merged history, and detections whose period arrived IN THIS BATCH
  * append to an alert table. The streaming form of m21: a metering
  * pipeline sees a step change in a series within one micro-batch of
  * the day that completes the window.
  *
  * State is the bounded history table (2·w rows per key, pruned every
  * batch), not executor memory — restarts recover from the parquet
  * state, and the monitor's cost per batch is one window over the
  * touched keys' short histories. Batch rows win over history on
  * (key, period) replays, so retractions/corrections take effect. */
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
        val spark = batch.sparkSession
        val batchRows = batch.select(col("key"), col("period"), col("value"))
        if (!batchRows.isEmpty) {
          val hist =
            try spark.read.parquet(historyPath)
            catch { case _: org.apache.spark.sql.AnalysisException => batchRows.limit(0) }
          // upsert: batch wins on (key, period); localCheckpoint severs
          // the lineage from historyPath so the overwrite below is legal
          val merged = hist
            .join(batchRows.select(col("key"), col("period")), Seq("key", "period"), "left_anti")
            .unionByName(batchRows)
          val wk = Window.partitionBy(col("key")).orderBy(col("period").desc)
          val pruned = merged
            .withColumn("__rn", row_number().over(wk))
            .filter(col("__rn") <= 2 * w)
            .drop("__rn")
            .localCheckpoint(true)
          pruned.write.mode("overwrite").parquet(historyPath)
          Decompose.meanShift(pruned, w, z)
            .filter(col("is_shift"))
            .join(
              batchRows.select(col("key"), col("period")).distinct(),
              Seq("key", "period"),
              "left_semi")
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(outPath)
        }
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}
