package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational `describe()`/`summary()` equivalent (SURVEY.md §2.4 A7):
  * one row per requested column with count / mean / stddev / min /
  * quartiles / max, computed in a SINGLE aggregate pass over the input
  * (all columns' aggregates in one groupBy(), then a constant-size
  * unpivot) — unlike Dataset.summary(), the output is typed (no
  * stringly values) and deterministic enough to oracle-check.
  *
  * Scale note: exact `percentile` buffers each column's values in the
  * single final-aggregation task; at very large row counts swap
  * `percentile` for `approx_percentile` (same call shape, bounded
  * memory, GK-sketch partial aggregation). Exact is kept here for
  * bit-stable cross-engine verification, matching q10's discipline. */
object Stats {

  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "describe needs at least one column")
    def d(c: String): Column = col(c).cast("double")
    val aggExprs = cols.flatMap { c =>
      Seq(
        count(d(c)).cast("long").as(s"${c}__n"),
        round(avg(d(c)), 6).as(s"${c}__mean"),
        round(stddev(d(c)), 6).as(s"${c}__std"),
        round(min(d(c)), 6).as(s"${c}__min"),
        round(percentile(d(c), lit(0.25)), 6).as(s"${c}__p25"),
        round(percentile(d(c), lit(0.5)), 6).as(s"${c}__p50"),
        round(percentile(d(c), lit(0.75)), 6).as(s"${c}__p75"),
        round(max(d(c)), 6).as(s"${c}__max"))
    }
    df.agg(aggExprs.head, aggExprs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(
          lit(c).as("column"),
          col(s"${c}__n").as("n"),
          col(s"${c}__mean").as("mean"),
          col(s"${c}__std").as("std"),
          col(s"${c}__min").as("min"),
          col(s"${c}__p25").as("p25"),
          col(s"${c}__p50").as("p50"),
          col(s"${c}__p75").as("p75"),
          col(s"${c}__max").as("max"))
      }: _*)).as("s"))
      .select(col("s.*"))
  }

  /** Per-group robust outlier flags via MAD (median absolute deviation):
    * a value is an outlier when |x − median| > k·MAD. Robust where
    * z-scores break (mean and stddev are themselves dragged by the
    * outliers being hunted). Two small aggregates over the groups —
    * median first, then the deviation median — each broadcast back;
    * the data itself never shuffles. Adds `__med`, `__mad`, `__outlier`. */
  def madOutliers(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      k: Double = 3.0): DataFrame = {
    require(groupCols.nonEmpty, "madOutliers needs at least one group column")
    require(k > 0, s"k must be > 0, got $k")
    val v = col(valueCol).cast("double")
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(v, lit(0.5)).as("__med"))
    val withMed = df.join(broadcast(med), groupCols)
    val mad = withMed.groupBy(groupCols.map(col): _*)
      .agg(percentile(abs(v - col("__med")), lit(0.5)).as("__mad"))
    withMed
      .join(broadcast(mad), groupCols)
      .withColumn("__outlier", abs(v - col("__med")) > lit(k) * col("__mad"))
  }

  /** Per-group winsorization — the standard feature-prep clip: values
    * below the group's `lo` percentile (or above `hi`) are pulled to the
    * boundary. Adds `<valueCol>_w` (clipped value) plus `__plo`/`__phi`
    * (the boundaries) and `__clipped` (-1 low / 0 no / 1 high).
    *
    * Shape: one aggregate over the groups for the two exact percentiles
    * (group count is small by contract — it is broadcast back), then a
    * map-side clip; the input is scanned twice but never shuffled. At
    * very large scale swap `percentile` for `approx_percentile`, same
    * as [[describe]]'s note. */
  def winsorize(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      lo: Double = 0.05,
      hi: Double = 0.95): DataFrame = {
    require(groupCols.nonEmpty, "winsorize needs at least one group column")
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got ($lo, $hi)")
    val v = col(valueCol).cast("double")
    val bounds = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        percentile(v, lit(lo)).as("__plo"),
        percentile(v, lit(hi)).as("__phi"))
    df.join(broadcast(bounds), groupCols)
      .withColumn(s"${valueCol}_w", least(greatest(v, col("__plo")), col("__phi")))
      .withColumn(
        "__clipped",
        when(v < col("__plo"), lit(-1)).when(v > col("__phi"), lit(1)).otherwise(lit(0)))
  }
}
