package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical time-series decomposition and shift detection over the
  * canonical (key, period, value) daily series.
  *
  * The reference stops at lag-correlation and DTW alignment; these are the
  * next analyses its users run on the same series (trend extraction before
  * correlating, level-shift screening before trusting a mapping). Both are
  * pure window pipelines: one sort per key partition, no joins, no UDFs —
  * at 100 TB they cost exactly one exchange on `key` plus a per-partition
  * sort, and every expression stays inside whole-stage codegen.
  *
  * Inputs are assumed GAP-FREE (run [[graft.core.SeriesTable.resample]] or
  * [[graft.core.SeriesTable.interpolate]] first) so row frames and
  * calendar frames coincide.
  */
object Decompose {

  /** Moving-average seasonal decomposition (STL-lite):
    * trend = centered (2·half+1)-day mean (null until the frame is full),
    * seasonal = mean detrended value per (key, weekday),
    * residual = value − trend − seasonal.
    *
    * Two exchanges total: the trend/count frames share one
    * partitionBy(key) sort; the seasonal mean is a window over
    * (key, weekday) — a second hash exchange, no join-back. */
  def seasonal(series: DataFrame, half: Int = 3): DataFrame = {
    val span = 2 * half + 1
    val wk = Window.partitionBy(col("key")).orderBy(col("period"))
    val frame = wk.rowsBetween(-half, half)
    val wSeason = Window.partitionBy(col("key"), col("dow"))
    series
      .withColumn(
        "trend",
        when(count(lit(1)).over(frame) === span, avg(col("value")).over(frame)))
      .withColumn("dow", weekday(col("period")))
      .withColumn("detrended", col("value") - col("trend"))
      .withColumn("seasonal", avg(col("detrended")).over(wSeason))
      .select(
        col("key"),
        col("period"),
        col("value"),
        col("trend"),
        col("seasonal"),
        (col("detrended") - col("seasonal")).as("residual"))
  }

  /** Outlier REPAIR: flag per-key MAD outliers (|v − median| > k·MAD)
    * and replace each flagged value by linear interpolation between its
    * nearest CLEAN neighbors (calendar-weighted); an edge outlier takes
    * the one clean neighbor it has, and a key with no clean rows falls
    * back to its median. Returns (key, period, value, is_outlier,
    * repaired).
    *
    * The robust statistics are exact percentiles computed as WINDOW
    * aggregates over partitionBy(key) — no med/mad join-back and no
    * broadcast of a key-sized table (the [[Stats.madOutliers]] broadcast
    * shape is for few-group use; per-entity groups at 100 TB need the
    * window form, which reuses one hash exchange for both stats and the
    * neighbor scan). */
  def repairOutliers(series: DataFrame, k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val wKey = Window.partitionBy(col("key"))
    val wOrd = Window.partitionBy(col("key")).orderBy(col("period"))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wNext = wOrd.rowsBetween(1, Window.unboundedFollowing)
    val v = col("value").cast("double")
    val cleanObs = when(!col("is_outlier"), struct(col("period"), col("value")))
    val interp = col("prev.value") +
      (col("next.value") - col("prev.value")) *
      datediff(col("period"), col("prev.period")).cast("double") /
      datediff(col("next.period"), col("prev.period")).cast("double")
    series
      .withColumn("__med", percentile(v, lit(0.5)).over(wKey))
      .withColumn("__mad", percentile(abs(v - col("__med")), lit(0.5)).over(wKey))
      .withColumn("is_outlier", abs(v - col("__med")) > col("__mad") * k)
      .withColumn("prev", last(cleanObs, ignoreNulls = true).over(wPrev))
      .withColumn("next", first(cleanObs, ignoreNulls = true).over(wNext))
      .select(
        col("key"),
        col("period"),
        col("value"),
        col("is_outlier"),
        when(!col("is_outlier"), col("value"))
          .when(col("prev").isNotNull && col("next").isNotNull, interp)
          .when(col("prev").isNotNull, col("prev.value"))
          .when(col("next").isNotNull, col("next.value"))
          .otherwise(col("__med"))
          .as("repaired"))
  }

  /** Two-window mean-shift screen (Welch z): for each day with a full
    * 2·w-day history, recent = mean of the trailing `w` days, prior =
    * mean of the `w` days before those, and
    * shift_z = (recent − prior) / sqrt((s²_recent + s²_prior) / w) —
    * each window's OWN sample variance, so a clean level step scores the
    * step against the within-level noise (a pooled stddev over the mixed
    * 2·w window would include the step itself and cap z near 2 for any
    * step size). Rows with |shift_z| > `z` are flagged.
    *
    * All five frames share the single partitionBy(key).orderBy(period)
    * sort — one exchange, one sort, codegen throughout. Zero-variance
    * window pairs yield null shift_z (never a flag), not a division
    * error. */
  def meanShift(series: DataFrame, w: Int = 7, z: Double = 3.0): DataFrame = {
    val wk = Window.partitionBy(col("key")).orderBy(col("period"))
    val recentF = wk.rowsBetween(-(w - 1), 0)
    val priorF = wk.rowsBetween(-(2 * w - 1), -w)
    val histF = wk.rowsBetween(-(2 * w - 1), 0)
    val se = sqrt((col("recent_var") + col("prior_var")) / w)
    series
      .withColumn("recent_mean", avg(col("value")).over(recentF))
      .withColumn("prior_mean", avg(col("value")).over(priorF))
      .withColumn("recent_var", var_samp(col("value")).over(recentF))
      .withColumn("prior_var", var_samp(col("value")).over(priorF))
      .withColumn("n_hist", count(lit(1)).over(histF))
      .filter(col("n_hist") === 2 * w)
      .select(
        col("key"),
        col("period"),
        col("value"),
        col("recent_mean"),
        col("prior_mean"),
        when(se > 0, (col("recent_mean") - col("prior_mean")) / se).as("shift_z"))
      .withColumn("is_shift", coalesce(abs(col("shift_z")) > z, lit(false)))
  }
}
