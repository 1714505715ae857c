package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** SQL-callable lag-scan correlation: `best_lag(period, v1, v2)` runs the
  * reference's in-memory kernel per group — sort by period, slide v1
  * against v2 by POSITION for lags 0..maxLag, Pearson per lag, strict->
  * argmax keeping the earliest best (mapping_engine.py:117-160).
  *
  * This is the positional (array-slicing) semantics of the reference UDF,
  * complementing the relational calendar-based path (LagCorrelation) —
  * identical on gap-free series with at least one valid lag (the
  * cross-check test locks that). Divergence by design on degenerate
  * series: zero-variance input returns the reference's sentinel
  * correlation -1.0 here (mapping_engine.py:131-133), while the
  * relational path emits no row at all. Use the relational path for
  * large jobs (it partial-aggregates; this one buffers the group).
  */
object BestLagAggregator {

  final case class Pt(period: String, v1: Double, v2: Double)
  final case class BestLag(optimal_lag: Int, correlation: Double, num_periods: Int)

  /** Pearson r; NaN for zero variance (caller skips NaN). */
  private def pearson(x: Array[Double], y: Array[Double]): Double = {
    val n = x.length
    var sx = 0.0; var sy = 0.0
    var i = 0
    while (i < n) { sx += x(i); sy += y(i); i += 1 }
    val mx = sx / n; val my = sy / n
    var cov = 0.0; var vx = 0.0; var vy = 0.0
    i = 0
    while (i < n) {
      val dx = x(i) - mx; val dy = y(i) - my
      cov += dx * dy; vx += dx * dx; vy += dy * dy
      i += 1
    }
    cov / math.sqrt(vx * vy)
  }

  /** The kernel (mapping_engine.py:117-160 semantics). */
  def bestLag(v1: Array[Double], v2: Array[Double], maxLag: Int): BestLag = {
    val n = v1.length
    if (n < 2) return BestLag(0, 0.0, n)
    var best = -1.0
    var bestL = 0
    var lag = 0
    while (lag <= maxLag) {
      val len = n - lag
      if (len >= 2) {
        val a = java.util.Arrays.copyOfRange(v1, 0, len)
        val b = java.util.Arrays.copyOfRange(v2, lag, lag + len)
        val r = pearson(a, b)
        if (!r.isNaN && r > best) { best = r; bestL = lag }
      }
      lag += 1
    }
    BestLag(bestL, best, n)
  }

  /** Aggregation buffer: the group's points plus a running count, so the
    * size guard is O(1) per row (List.length per reduce would be O(n²)). */
  final case class Buf(n: Int, pts: List[Pt])

  final class Agg(maxLag: Int, maxSeriesLength: Int) extends Aggregator[Pt, Buf, BestLag] {
    // Same fail-fast as DtwMapping's maxSeriesLength check: a pathological
    // hot key must error with a diagnosable message, not OOM the executor
    // while buffering the group.
    private def guard(n: Int): Unit =
      if (n > maxSeriesLength)
        throw new IllegalStateException(
          s"best_lag group has $n points > maxSeriesLength=$maxSeriesLength")
    override def zero: Buf = Buf(0, Nil)
    override def reduce(b: Buf, a: Pt): Buf = { guard(b.n + 1); Buf(b.n + 1, a :: b.pts) }
    override def merge(a: Buf, b: Buf): Buf = { guard(a.n + b.n); Buf(a.n + b.n, a.pts ::: b.pts) }
    override def finish(buf: Buf): BestLag = {
      val sorted = buf.pts.sortBy(_.period).toArray
      bestLag(sorted.map(_.v1), sorted.map(_.v2), maxLag)
    }
    override def bufferEncoder: Encoder[Buf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[BestLag] = Encoders.product[BestLag]
  }

  /** Register `best_lag(period, v1, v2)` on the session. */
  def register(
      spark: SparkSession,
      name: String = "best_lag",
      maxLag: Int = 6,
      maxSeriesLength: Int = 100000): Unit =
    spark.udf.register(name, udaf(new Agg(maxLag, maxSeriesLength), Encoders.product[Pt]))
}
