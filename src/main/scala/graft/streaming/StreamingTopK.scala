package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.FrequentItems

/** Continuous heavy hitters: a Misra–Gries sketch maintained as a tiny
  * parquet state table over a stream — the always-on form of the q43
  * batch aggregate, for "what are the hot keys right now" monitoring
  * (hot crawl domains, hot entity ids, hot query shapes) without ever
  * re-reading history.
  *
  * Per micro-batch: the batch reduces DISTRIBUTED to its own <= capacity
  * counters (the [[FrequentItems]] udaf — constant memory regardless of
  * batch size or key cardinality), and the driver folds that into the
  * stored sketch with the mergeable-summaries rule. State is <= capacity
  * rows of (item, est) plus the running total `n`, so the per-batch
  * driver work and the write are O(capacity) — at any corpus scale.
  *
  * The stream fold is a left-deep merge tree, so the n/(c+1) error
  * bound and the presence guarantee for items above it hold at every
  * point in the stream (same theory as the batch aggregate; gates in
  * StreamingTopKSpec). Exactly-once: state rows carry the last applied
  * `batch_id`; a replayed batch sees its own stamp and skips. State
  * persistence goes through [[StateStore]] — versioned commit-marked
  * writes (a crash mid-write leaves the previous version current) and
  * Hadoop-FS existence, correct on HDFS/S3, not just local disk. */
object StreamingTopK {

  /** Start maintaining the sketch at `statePath` from `events`.
    * `keyCol` is any string expression over the event columns. */
  def start(
      events: DataFrame,
      keyCol: Column,
      statePath: String,
      checkpoint: String,
      capacity: Int = 64,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val spark = events.sparkSession
    val writer = events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // null keys are dropped AND excluded from n: they carry no
        // frequency signal, and a null counter row would collide with
        // the empty-sketch sentinel in the state table
        val agg = batch
          .select(keyCol.cast("string").as("k"))
          .filter(col("k").isNotNull)
          .agg(
            FrequentItems.udafFor(capacity)(col("k")).as("sk"),
            count(lit(1)).as("n"))
          .collect()(0)
        val batchN = agg.getAs[Long]("n")
        if (batchN > 0L) {
          val batchSketch = agg
            .getSeq[org.apache.spark.sql.Row](0)
            .map(r => r.getString(0) -> r.getLong(1))
            .toMap
          foldBatch(spark, statePath, capacity, batchSketch, batchN, batchId)
        }
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  /** Fold one batch's sketch into the state — a no-op when the state is
    * already stamped with `batchId` (the crash-window replay). The
    * state table and the stream checkpoint are a paired unit: batch ids
    * are monotone within one checkpoint lineage, which is what makes
    * the stamp a valid replay marker. */
  private[graft] def foldBatch(
      spark: SparkSession,
      statePath: String,
      capacity: Int,
      batchSketch: Map[String, Long],
      batchN: Long,
      batchId: Long): Unit = {
    val (stored, storedN, storedBatch) = readState(spark, statePath)
    if (storedBatch != Some(batchId)) {
      val merged = FrequentItems.mergeCounts(stored, batchSketch, capacity)
      writeState(spark, statePath, merged, storedN + batchN, batchId)
    }
  }

  /** Current sketch: (item, est, n, batch_id) — <= capacity rows, read
    * from the latest committed state version. */
  def snapshot(spark: SparkSession, statePath: String): DataFrame =
    StateStore.readLatest(spark, statePath).getOrElse(
      spark.emptyDataFrame
        .select(
          lit(null).cast("string").as("item"), lit(0L).as("est"),
          lit(0L).as("n"), lit(0L).as("batch_id"))
        .limit(0))

  private def readState(
      spark: SparkSession,
      statePath: String): (Map[String, Long], Long, Option[Long]) =
    StateStore.readLatest(spark, statePath) match {
      case Some(state) =>
        val rows = state.collect()
        val m = rows
          .filter(_.getAs[String]("item") != null)
          .map(r => r.getAs[String]("item") -> r.getAs[Long]("est"))
          .toMap
        val n = rows.headOption.map(_.getAs[Long]("n")).getOrElse(0L)
        val b = rows.headOption.map(_.getAs[Long]("batch_id"))
        (m, n, b)
      case None => (Map.empty, 0L, None)
    }

  private def writeState(
      spark: SparkSession,
      statePath: String,
      sketch: Map[String, Long],
      n: Long,
      batchId: Long): Unit = {
    import spark.implicits._
    // a legally zeroed-out sketch (all counters hit the subtraction
    // level) still must persist n/batch_id: a null-item sentinel row
    val rows = if (sketch.isEmpty) Seq((null: String, 0L)) else sketch.toSeq
    StateStore.writeVersion(
      rows.toDF("item", "est")
        .withColumn("n", lit(n))
        .withColumn("batch_id", lit(batchId))
        .coalesce(1),
      statePath, batchId)
  }
}
