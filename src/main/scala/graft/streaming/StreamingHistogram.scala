package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.HistogramSketch

/** Continuous quantile monitoring: the [[HistogramSketch]] counters
  * maintained as a tiny parquet state over a stream — the always-on
  * form of the q46 batch sketch (p50/p95/p99 of a metric "so far"
  * without re-reading history). The batch sketch fixes its geometry
  * from an exact (min, max) pass; a stream cannot two-pass, so the
  * geometry (lo, hi, bins) is FIXED at start — the standard deployment
  * contract for streaming histograms (pick the range from the metric's
  * spec or a calibration batch; out-of-range values clamp into the edge
  * bins, which the interpolation then treats as range boundaries).
  *
  * Per micro-batch: one partial-aggregated groupBy reduces the batch to
  * ≤bins counter rows; the driver folds them into the stored counters
  * by ADDITION (histograms are a monoid, so the stream fold equals the
  * batch sketch of the concatenated history exactly — spec-gated bit
  * parity, like [[StreamingHll]]). Unlike HLL's MAX-merge, addition is
  * NOT naturally idempotent, so the `batch_id` stamp is load-bearing: a
  * replayed batch sees its own stamp and skips, exactly the
  * [[StreamingTopK]] recipe. Persistence through [[StateStore]]
  * versioned commits — a crash mid-write leaves the previous version
  * current. */
object StreamingHistogram {

  def start(
      events: DataFrame,
      valueCol: Column,
      statePath: String,
      checkpoint: String,
      lo: Double,
      hi: Double,
      bins: Int = 128,
      trigger: Option[Trigger] = None): StreamingQuery = {
    require(hi > lo && bins >= 1)
    val spark = events.sparkSession
    val writer = events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // nulls carry no value — dropped; out-of-spec values clamp into
        // the edge bins inside HistogramSketch.build (total by design)
        val vals = batch.select(valueCol.cast("double").as("x"))
          .filter(col("x").isNotNull)
        val counts = HistogramSketch.build(vals, col("x"), lo, hi, bins)
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        if (counts.nonEmpty) foldBatch(spark, statePath, counts, batchId)
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  private[graft] def foldBatch(
      spark: SparkSession,
      statePath: String,
      batchCounts: Map[Int, Long],
      batchId: Long): Unit = {
    import spark.implicits._
    StampedFold.fold[Int, Long](
      spark, statePath, batchCounts, batchId,
      readKV = r => r.getAs[Int]("bin") -> r.getAs[Long]("cnt"),
      writeDf = m => m.toSeq.toDF("bin", "cnt"),
      merge = _ + _)
  }

  /** Current counters: (bin, cnt, batch_id), ≤bins rows from the latest
    * committed state version. */
  def snapshot(spark: SparkSession, statePath: String): DataFrame =
    StateStore.readLatest(spark, statePath).getOrElse(
      spark.emptyDataFrame
        .select(
          lit(0).cast("int").as("bin"), lit(0L).as("cnt"), lit(0L).as("batch_id"))
        .limit(0))

  /** Running interpolated quantiles over the stored counters (empty
    * state → every quantile answers lo, the [[HistogramSketch]] empty
    * convention). */
  def quantiles(
      spark: SparkSession,
      statePath: String,
      lo: Double,
      hi: Double,
      bins: Int,
      qs: Seq[Double]): Seq[(Double, Double)] =
    HistogramSketch.quantiles(
      snapshot(spark, statePath).select(col("bin"), col("cnt")), lo, hi, bins, qs)

}
