package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental rollup maintenance via MERGEABLE partial-aggregate states —
  * the aggregation counterpart of [[IncrementalDedup]]'s batch-vs-corpus
  * shape, extending the reference's incremental-run orchestration
  * (/root/reference/05_prod_dev.py:1054-1101, which slices by date and
  * recomputes each slice's OUTPUT) to aggregates that span slices.
  *
  * The 100 TB story: a dashboard rollup over the full history must not
  * re-scan the history when a day of data arrives. Every aggregate kept
  * here merges associatively:
  *   - count/sum: add (sums as exact DECIMAL so merge order is bit-stable)
  *   - min/max: min/max
  *   - distinct: DataSketches HLL registers (`hll_sketch_agg`), unioned
  *     with `hll_union_agg` — constant-size state, register-wise max is
  *     associative, so union-of-slices ≡ sketch-of-everything.
  * So the state table holds one row per (slice, group), the new day
  * writes ONLY its slice partition, and the serving rollup is an
  * aggregate over the state table — O(groups × slices) rows, not
  * O(history) raw rows. Non-mergeable forms (exact countDistinct, exact
  * median) are exactly what this module refuses to store: they would
  * force the full re-scan back in.
  */
object IncrementalAgg {

  /** Per-(slice, group) mergeable state over `valueCol`, with an HLL
    * distinct sketch over `distinctCol`. One hash aggregate: partials
    * combine map-side, the shuffle carries one constant-size state row
    * per (slice, group). */
  def partialStates(
      df: DataFrame,
      sliceCol: Column,
      groupCols: Seq[Column],
      valueCol: Column,
      distinctCol: Column): DataFrame =
    df.groupBy(sliceCol.as("slice") +: groupCols: _*)
      .agg(
        count(lit(1)).as("s_cnt"),
        sum(valueCol.cast("decimal(18,2)")).as("s_sum"),
        min(valueCol).as("s_min"),
        max(valueCol).as("s_max"),
        hll_sketch_agg(distinctCol).as("s_hll"))

  /** Merge states into the serving rollup. Input may be any subset of
    * slices (a window rollup is the same merge over a slice-range
    * partition-pruned read). `s_sum` is DECIMAL end to end — the double
    * cast happens once, here, so merge order can never perturb bits. */
  def mergeStates(states: DataFrame, groupCols: Seq[String]): DataFrame =
    states
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("s_cnt")).as("n_rows"),
        sum(col("s_sum")).cast("double").as("total_value"),
        min(col("s_min")).as("min_value"),
        max(col("s_max")).as("max_value"),
        hll_sketch_estimate(hll_union_agg(col("s_hll"))).as("distinct_est"))

  /** Merge states INTO STATE FORM (same schema back, still mergeable) —
    * the fold [[graft.streaming.StreamingRollup]] uses to combine a
    * micro-batch's states with the stored ones before rewriting a slice
    * partition. `s_sum` is re-capped to DECIMAL(28,2) so repeated
    * merges keep a stable schema instead of widening to (38,2). */
  def mergeStatesRaw(states: DataFrame, keyCols: Seq[String]): DataFrame =
    states
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("s_cnt")).as("s_cnt"),
        sum(col("s_sum")).cast("decimal(28,2)").as("s_sum"),
        min(col("s_min")).as("s_min"),
        max(col("s_max")).as("s_max"),
        hll_union_agg(col("s_hll")).as("s_hll"))

  /** Write `states` into the state table at `path`, replacing ONLY the
    * slice partitions present in `states` (dynamic partition overwrite —
    * re-running a day is idempotent and never touches other days).
    *
    * BATCH path only: a torn overwrite here is recoverable because the
    * raw events that produced the slice still exist — re-running the
    * slice rebuilds it. The STREAMING fold merges stored state into
    * itself, where a torn write would be permanent, so
    * [[graft.streaming.StreamingRollup]] persists through
    * [[graft.streaming.StateStore]] versioned slice commits instead. */
  def writeStates(states: DataFrame, path: String): Unit = {
    val spark = states.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try states.write.mode("overwrite").partitionBy("slice").parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Serving read: the rollup over a slice range. The range predicate is
    * a PARTITION filter on the state table — slices outside the window
    * are never read (asserted in IncrementalAggSpec). */
  def rollupFromStore(
      spark: SparkSession,
      path: String,
      groupCols: Seq[String],
      sliceFrom: Option[String] = None,
      sliceTo: Option[String] = None): DataFrame = {
    val states = spark.read.parquet(path)
    val windowed = (sliceFrom.map(f => col("slice") >= lit(f)) ++
      sliceTo.map(t => col("slice") <= lit(t)))
      .reduceOption(_ && _)
      .map(states.filter)
      .getOrElse(states)
    mergeStates(windowed, groupCols)
  }
}
