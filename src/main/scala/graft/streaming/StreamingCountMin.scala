package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.CountMin

/** Continuous point-frequency queries: the [[CountMin]] counter table
  * maintained as a tiny parquet state over a stream — the always-on
  * form of the q44 batch sketch ("how often has key K appeared so far"
  * for keys chosen AFTER the fact, which the Misra–Gries top-k cannot
  * answer). State is ≤ depth·width counter rows at any key cardinality.
  *
  * Per micro-batch: one partial-aggregated build reduces the batch to
  * its own counter table (shuffle ≤ depth·width rows per partition),
  * and the driver folds it into the stored counters by CELL-WISE
  * ADDITION — Count-Min is a linear sketch, so the stream fold equals
  * the batch sketch of the concatenated history exactly (spec-gated bit
  * parity, the [[StreamingHll]]/[[StreamingHistogram]] convention).
  * Addition is not idempotent, so the `batch_id` stamp is load-bearing:
  * a replayed batch sees its own stamp and skips. Persistence through
  * [[StateStore]] versioned commits.
  *
  * The never-underestimates guarantee and the εN error bound hold at
  * every point in the stream (linearity: the folded table IS the batch
  * table of everything seen). Estimates at serving time go through
  * [[CountMin.estimate]] — or [[estimates]] here, which carries the
  * geometry so probe coordinates can never mismatch. */
object StreamingCountMin {

  def start(
      events: DataFrame,
      keyCol: Column,
      statePath: String,
      checkpoint: String,
      depth: Int = 4,
      width: Int = 256,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val spark = events.sparkSession
    val writer = events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // null keys carry no identity — dropped, like the sibling folds
        val keyed = batch.select(keyCol.cast("string").as("k")).filter(col("k").isNotNull)
        val counts = CountMin.build(keyed, col("k"), depth, width)
          .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
        if (counts.nonEmpty) foldBatch(spark, statePath, counts, batchId)
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  private[graft] def foldBatch(
      spark: SparkSession,
      statePath: String,
      batchCounts: Map[(Int, Int), Long],
      batchId: Long): Unit = {
    import spark.implicits._
    StampedFold.fold[(Int, Int), Long](
      spark, statePath, batchCounts, batchId,
      readKV = row => (row.getAs[Int]("r"), row.getAs[Int]("c")) -> row.getAs[Long]("cnt"),
      writeDf = m => m.toSeq.map { case ((r, c), n) => (r, c, n) }.toDF("r", "c", "cnt"),
      merge = _ + _)
  }

  /** Current counter table: (r, c, cnt, batch_id) — ≤ depth·width rows
    * from the latest committed state version. */
  def snapshot(spark: SparkSession, statePath: String): DataFrame =
    StateStore.readLatest(spark, statePath).getOrElse(
      spark.emptyDataFrame
        .select(
          lit(0).cast("int").as("r"), lit(0).cast("int").as("c"),
          lit(0L).as("cnt"), lit(0L).as("batch_id"))
        .limit(0))

  /** Point estimates for `keys` against the stored counters, with the
    * build-time geometry supplied by the caller of [[start]] — the same
    * (depth, width) MUST be passed (see [[CountMin.estimate]]'s
    * coordinate validation, which catches a mismatch). */
  def estimates(
      spark: SparkSession,
      statePath: String,
      keys: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 256): DataFrame =
    CountMin.estimate(
      snapshot(spark, statePath).select(col("r"), col("c"), col("cnt")),
      keys, keyCol, depth, width)

}
