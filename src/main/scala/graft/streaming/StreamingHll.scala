package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.Hll

/** Continuous distinct-cardinality monitoring: the [[Hll]] register
  * table maintained as a tiny parquet state over a stream — the
  * always-on form of the q45 batch sketch, for "how many distinct
  * users/keys/urls so far" without ever re-reading history (an exact
  * streaming countDistinct would hold every key in state forever; this
  * holds 256 rows at any cardinality).
  *
  * Per micro-batch: the batch reduces DISTRIBUTED to its own ≤256
  * register rows (one partial-aggregated groupBy, map-side combined),
  * and the driver folds them into the stored registers with cell-wise
  * MAX — HLL is a monoid, so the stream fold loses nothing relative to
  * sketching the concatenated history (exact parity, spec-gated, not
  * just error-bounded parity like the MG fold).
  *
  * Exactly-once: the state carries the last applied `batch_id`; a
  * replayed batch sees its own stamp and skips. MAX-merge is also
  * naturally idempotent, so even a double-fold would be harmless —
  * the stamp is kept for uniformity with the other streaming state
  * tables. Persistence goes through [[StateStore]] versioned commits
  * (a crash mid-write leaves the previous version current). */
object StreamingHll {

  def start(
      events: DataFrame,
      keyCol: Column,
      statePath: String,
      checkpoint: String,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val spark = events.sparkSession
    val writer = events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // null keys carry no identity — dropped, like StreamingTopK
        val keyed = batch.select(keyCol.cast("string").as("k")).filter(col("k").isNotNull)
        val batchRegs = Hll.registers(keyed, col("k"))
          .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
        if (batchRegs.nonEmpty) foldBatch(spark, statePath, batchRegs, batchId)
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  private[graft] def foldBatch(
      spark: SparkSession,
      statePath: String,
      batchRegs: Map[Int, Int],
      batchId: Long): Unit = {
    import spark.implicits._
    StampedFold.fold[Int, Int](
      spark, statePath, batchRegs, batchId,
      readKV = r => r.getAs[Int]("bucket") -> r.getAs[Int]("max_rank"),
      writeDf = m => m.toSeq.toDF("bucket", "max_rank"),
      merge = math.max)
  }

  /** Current register table: (bucket, max_rank, batch_id), ≤256 rows
    * from the latest committed state version. */
  def snapshot(spark: SparkSession, statePath: String): DataFrame =
    StateStore.readLatest(spark, statePath).getOrElse(
      spark.emptyDataFrame
        .select(
          lit(0).cast("int").as("bucket"), lit(0).cast("int").as("max_rank"),
          lit(0L).as("batch_id"))
        .limit(0))

  /** The running distinct estimate — [[Hll.estimate]] over the stored
    * registers (0 when nothing has been folded yet, the empty-sketch
    * convention: α·m²/m = α·m ≈ 185 is the raw estimator's floor, so
    * callers get the explicit 0 instead). */
  def estimate(spark: SparkSession, statePath: String): Double = {
    val snap = snapshot(spark, statePath)
    if (snap.isEmpty) 0.0 else Hll.estimate(snap.select(col("bucket"), col("max_rank")))
  }

}
