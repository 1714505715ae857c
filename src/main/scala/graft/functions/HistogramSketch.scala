package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable equi-width histogram sketch with interpolated quantiles —
  * the scale path for quantile monitoring. Exact quantiles (q10's
  * `percentile`) materialize the whole column per group; this reduces
  * any column to ≤`bins` integer counters in one partial-aggregated
  * pass, and the counters MERGE by addition (per-day/per-batch
  * histograms union losslessly — the CountMin/HLL maintenance shape).
  * The price is resolution: a quantile is exact only to its bin, with
  * uniform-within-bin linear interpolation below that — the standard
  * monitoring tradeoff (error ≤ bin width, here range/128).
  *
  * Bit-exactness: bin indexes are `floor((x − lo)/(hi − lo) · bins)`
  * on IEEE doubles — identical ops in any engine given identical
  * inputs — counts are integers, and the interpolation formula is
  * evaluated with one pinned op order, so the histogram AND the
  * interpolated quantiles replay bit-for-bit (q46).
  *
  * Two passes by construction: pass 1 is an exact (min, max) aggregate
  * that fixes the bin geometry, pass 2 bins and counts. A streaming
  * deployment fixes (lo, hi) upfront instead and merges per-batch
  * counts — the geometry, not the algorithm, is what needs the extra
  * pass. */
object HistogramSketch {

  /** Exact (lo, hi) of `x` — the bin geometry. Driver scalars. */
  def range(df: DataFrame, x: Column): (Double, Double) = {
    val r = df.agg(min(x.cast("double")), max(x.cast("double"))).head()
    (r.getDouble(0), r.getDouble(1))
  }

  /** ≤`bins` rows of (bin, cnt): one partial-aggregated groupBy,
    * out-of-range values clamped into the EDGE bins on both sides —
    * required by the fixed-geometry deployment the object doc
    * prescribes (per-batch histograms under one (lo, hi)): a below-lo
    * value would otherwise emit a negative bin index that quantile
    * interpolation silently extrapolates below lo. Degenerate range
    * (hi == lo) puts everything in bin 0. NULL values carry no
    * distribution signal and are dropped (the CountMin/FrequentItems
    * null rule) — without the filter, `greatest(lit(lo), NULL)`
    * null-skips to lo and every null row would silently inflate bin 0,
    * dragging each interpolated quantile toward lo. */
  def build(df: DataFrame, x: Column, lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1)
    // clamp the VALUE into [lo, hi] before binning, not the bin index
    // after: the clamped quotient is bounded so the double→int cast is
    // total — clamping the index after floor().cast("int") would make a
    // far-out-of-range glitch value a CAST_OVERFLOW error under ANSI
    // mode, the exact input the clamp exists to absorb
    val xd = least(lit(hi), greatest(lit(lo), x.cast("double")))
    val bin =
      if (hi == lo) lit(0)
      else least(
        lit(bins - 1),
        floor((xd - lit(lo)) / (lit(hi) - lit(lo)) * bins).cast("int"))
    df.filter(x.cast("double").isNotNull)
      .select(bin.cast("int").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge histograms built with the SAME (lo, hi, bins): cell-wise
    * addition — the incremental/per-batch maintenance path. */
  def merge(hists: DataFrame*): DataFrame =
    hists.reduce(_ unionByName _)
      .groupBy(col("bin"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Interpolated quantiles from a collected histogram (≤bins rows —
    * bounded driver work). For each q: target = q·n; the answer bin is
    * the FIRST (ascending) whose running count reaches the target, and
    * the estimate is lo + (bin + (target − cumBefore)/cnt) · width —
    * uniform-within-bin interpolation, one pinned op order. target = 0
    * (empty or q = 0) answers lo. */
  def quantiles(
      hist: DataFrame,
      lo: Double,
      hi: Double,
      bins: Int,
      qs: Seq[Double]): Seq[(Double, Double)] =
    quantilesFromCounts(
      hist.select(col("bin").cast("int"), col("cnt").cast("long"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toSeq,
      lo, hi, bins, qs)

  /** The pure kernel of [[quantiles]] — also the property-test surface. */
  def quantilesFromCounts(
      counts: Seq[(Int, Long)],
      lo: Double,
      hi: Double,
      bins: Int,
      qs: Seq[Double]): Seq[(Double, Double)] = {
    val rows = counts.sortBy(_._1)
    val n = rows.map(_._2).sum
    val width = (hi - lo) / bins
    qs.map { q =>
      val target = q * n
      var cum = 0L
      var ans = lo // empty histogram: every quantile answers lo
      var found = n == 0L
      var i = 0
      while (i < rows.length && !found) {
        val (b, c) = rows(i)
        if (cum + c >= target && c > 0) {
          ans = lo + (b + (target - cum) / c) * width
          found = true
        }
        cum += c
        i += 1
      }
      if (!found) ans = hi // q beyond every bin (q = 1 with rounding up)
      q -> ans
    }
  }
}
