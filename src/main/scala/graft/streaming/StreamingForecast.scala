package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous Holt forecasting over streaming series points — the
  * online twin of [[graft.operators.Forecast.holt]]: per-key smoothing
  * state (level, trend) lives in a compact parquet state table (ONE row
  * per key, not a history), each micro-batch folds its new points into
  * the state in period order, and the refreshed forecast for every
  * touched key appends to an output table.
  *
  * The Holt recursion is an online fold by construction, so feeding the
  * same points in in-order batches leaves EXACTLY the state the batch
  * kernel computes on the full series (StreamingForecastSpec locks
  * this). Late points (period ≤ the key's folded frontier) are dropped:
  * a smoothing state cannot be rewound — re-run the batch kernel for
  * corrections.
  *
  * Scale notes: state is O(keys), each batch costs one shuffle of the
  * batch rows by key plus a state-table join; nothing re-reads history.
  * State persistence goes through [[StateStore]] versioned commits: a
  * crash mid-write leaves the previous committed version current — an
  * in-place overwrite of the only (level, trend) copy would lose ALL
  * accumulated smoothing state, and the stream checkpoint replays only
  * the last batch, so that loss would be permanent.
  */
object StreamingForecast {

  /** Per-key smoothing state; `trend` is None until the second
    * observation arrives (a lone point cannot seed a slope). */
  case class FState(
      key: String,
      n: Long,
      level: Double,
      trend: Option[Double],
      last_period: java.sql.Date)

  case class Pt(
      key: String,
      period: java.sql.Date,
      value: Double,
      s_n: Option[Long],
      s_level: Option[Double],
      s_trend: Option[Double],
      s_last: Option[java.sql.Date])

  /** Fold sorted new points into an optional prior state (the
    * [[graft.operators.Forecast.holt]] update, same operation order). */
  private[streaming] def fold(
      key: String,
      prior: Option[FState],
      pts: Array[(java.sql.Date, Double)],
      alpha: Double,
      beta: Double): FState = {
    var n = prior.map(_.n).getOrElse(0L)
    var level = prior.map(_.level).getOrElse(0.0)
    var trend = prior.flatMap(_.trend).getOrElse(Double.NaN)
    var last = prior.map(_.last_period).orNull
    pts.foreach { case (p, x) =>
      if (n == 0L) { level = x }
      else if (n == 1L) { trend = x - level; level = x }
      else {
        val l1 = alpha * x + (1 - alpha) * (level + trend)
        trend = beta * (l1 - level) + (1 - beta) * trend
        level = l1
      }
      n += 1
      last = p
    }
    FState(key, n, level, if (n >= 2) Some(trend) else None, last)
  }

  def start(
      series: DataFrame,
      statePath: String,
      outPath: String,
      checkpoint: String,
      alpha: Double = 0.5,
      beta: Double = 0.5,
      horizon: Int = 7,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = series.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, statePath, outPath, alpha, beta, horizon)
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  /** One micro-batch fold — package-private so StreamingForecastSpec can
    * REPLAY a batch directly (the crash-between-writes path foreachBatch
    * retries): the replay must re-emit the identical forecast rows, not
    * duplicate or drop them. */
  private[graft] def processBatch(
      batch: DataFrame,
      batchId: Long,
      statePath: String,
      outPath: String,
      alpha: Double,
      beta: Double,
      horizon: Int): Unit = {
        val spark = batch.sparkSession
        import spark.implicits._
        val batchRows = batch.select(col("key"), col("period"), col("value"))
        if (!batchRows.isEmpty) {
          val sDf = StateStore.readLatest(spark, statePath)
            .getOrElse(spark.emptyDataset[FState].toDF())
          // attach each key's state to its points; drop late arrivals
          // (at or behind the folded frontier)
          val joined = batchRows
            .join(
              sDf.select(
                col("key"), col("n").as("s_n"), col("level").as("s_level"),
                col("trend").as("s_trend"), col("last_period").as("s_last")),
              Seq("key"),
              "left_outer")
            .filter(col("s_last").isNull || col("period") > col("s_last"))
            .as[Pt]
          // localCheckpoint (eager) pins the fold result so the output
          // write and the state write below both read the SAME
          // materialized fold instead of recomputing the groupByKey
          // lineage per action
          val updated = joined
            .groupByKey(_.key)
            .mapGroups { (k, it) =>
              val rows = it.toArray
              val prior = rows.head.s_n.map(n =>
                FState(k, n, rows.head.s_level.get, rows.head.s_trend, rows.head.s_last.get))
              val pts = rows.map(r => (r.period, r.value)).sortBy(_._1.getTime)
              fold(k, prior, pts, alpha, beta)
            }
            .toDF()
            .localCheckpoint(true)
          val untouched = sDf.join(updated.select("key"), Seq("key"), "left_anti")
          val newState = untouched.unionByName(updated).localCheckpoint(true)
          // OUTPUT FIRST, then state: if the batch dies between the two
          // writes, a replay re-folds from the old state and re-emits the
          // same forecasts (the reverse order would fold the frontier
          // past the batch's points, dropping them as late — that
          // batch's output would be unrecoverable). The append is made
          // replay-IDEMPOTENT by dynamic-overwriting the batch_id
          // partition: a replayed batch replaces its own partition
          // instead of double-appending.
          val forecasts = updated
            .filter(col("trend").isNotNull)
            .select(
              col("key"), col("n"), col("level"), col("trend"),
              (col("level") + col("trend") * horizon).as("forecast"),
              lit(batchId).as("batch_id"))
          // skip the write when no key has a trend yet: an empty
          // partitioned write would leave a schema-less directory
          // (updated is localCheckpoint'd, so isEmpty is a cheap probe)
          if (!forecasts.isEmpty)
            forecasts.write
              .mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id")
              .parquet(outPath)
          // versioned commit: the previous state version stays readable
          // until this one's _SUCCESS lands (a replay at the same batch
          // id overwrites its own version dir — idempotent)
          StateStore.writeVersion(newState, statePath, batchId)
        }
  }

  /** The latest committed smoothing state (key, n, level, trend,
    * last_period) — empty before the first commit. */
  def stateSnapshot(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    StateStore.readLatest(spark, statePath)
      .getOrElse(spark.emptyDataset[FState].toDF())
  }
}
