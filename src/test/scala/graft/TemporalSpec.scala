package graft

import graft.core.{PeriodUnit, SeriesTable}
import graft.operators.Temporal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the temporal re-aggregation family:
  * OHLC bars, time-weighted averages, gap reports, EWMA. */
class TemporalSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def daily(rows: Seq[(String, Int, Double)]) = {
    val df = rows
      .map { case (k, d, v) =>
        (k, java.time.LocalDate.of(2024, 1, 1).plusDays(d).toString, v)
      }
      .toDF("k", "t", "v")
    SeriesTable.canonicalize(df, "k", "t", "v", PeriodUnit.Day)
  }

  test("ohlcBars: open/close follow period order, not value order") {
    // 2024-01-01 is a Monday; days 0..4 land in one ISO week
    val s = daily(Seq(("K1", 0, 5.0), ("K1", 1, 9.0), ("K1", 2, 1.0), ("K1", 4, 7.0)))
    val r = Temporal.ohlcBars(s)
      .select($"week".cast("string"), $"open", $"high", $"low", $"close", $"volume", $"n_obs")
      .as[(String, Double, Double, Double, Double, Double, Long)]
      .collect()
    assert(r.toSeq == Seq(("2024-01-01", 5.0, 9.0, 1.0, 7.0, 22.0, 4L)))
  }

  test("ohlcBars: observations split by ISO week boundary") {
    // day 6 = Sunday 2024-01-07 (week of Jan 1), day 7 = Monday (next week)
    val s = daily(Seq(("K1", 6, 2.0), ("K1", 7, 3.0)))
    val weeks = Temporal.ohlcBars(s).select($"week".cast("string")).as[String].collect().sorted
    assert(weeks.toSeq == Seq("2024-01-01", "2024-01-08"))
  }

  test("twap: step-holds each value until the next observation") {
    // obs at day 0 (v=10, holds 2 days) and day 2 (v=40, holds to Feb 1 = 30 days)
    val s = daily(Seq(("K1", 0, 10.0), ("K1", 2, 40.0)))
    val r = Temporal.twap(s)
      .select($"month".cast("string"), $"twap", $"covered_days", $"n_obs")
      .as[(String, Double, Double, Long)]
      .collect()
    val (month, twap, covered, n) = r.head
    assert(month == "2024-01-01" && n == 2L && covered == 31.0)
    assert(math.abs(twap - (10.0 * 2 + 40.0 * 29) / 31.0) < 1e-9)
  }

  test("twap: a value never bleeds across the month boundary") {
    // single obs on Jan 30 holds 2 days (to Feb 1), not until some later obs
    val s = daily(Seq(("K1", 29, 10.0), ("K1", 40, 99.0)))
    val r = Temporal.twap(s)
      .select($"month".cast("string"), $"twap", $"covered_days")
      .as[(String, Double, Double)]
      .collect().map { case (m, t, c) => m -> ((t, c)) }.toMap
    assert(r("2024-01-01") == ((10.0, 2.0)))
    // Feb obs (day 40 = Feb 10) holds to Mar 1: 20 days
    assert(r("2024-02-01") == ((99.0, 20.0)))
  }

  test("gapReport: one row per maximal missing run, none for dense keys") {
    val s = daily(Seq(
      ("K1", 0, 1.0), ("K1", 1, 1.0), ("K1", 5, 1.0), ("K1", 6, 1.0), ("K1", 9, 1.0),
      ("K2", 0, 1.0), ("K2", 1, 1.0)))
    val r = Temporal.gapReport(s)
      .select($"key", $"gap_start".cast("string"), $"gap_end".cast("string"), $"gap_days")
      .as[(String, String, String, Long)]
      .collect().sortBy(t => (t._1, t._2))
    assert(r.toSeq == Seq(
      ("K1", "2024-01-03", "2024-01-05", 3L),
      ("K1", "2024-01-08", "2024-01-09", 2L)))
  }

  test("trendFit: exact line is recovered with r2 = 1 and extrapolated") {
    // value = 3 + 2*day -> slope 2, intercept 3 (epoch = first day)
    val s = daily((0 until 10).map(d => ("K1", d, 3.0 + 2.0 * d)))
    val r = Temporal.trendFit(s, epoch = "2024-01-01", horizonDays = 7)
      .select($"key", $"n", $"slope", $"intercept", $"r2", $"forecast")
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().head
    assert(r._2 == 10L)
    assert(math.abs(r._3 - 2.0) < 1e-9 && math.abs(r._4 - 3.0) < 1e-9)
    assert(math.abs(r._5 - 1.0) < 1e-9)
    assert(math.abs(r._6 - (3.0 + 2.0 * 16)) < 1e-9) // xmax=9, +7 days
  }

  test("trendFit: degenerate keys (too short, zero x-variance) are dropped") {
    val s = daily(Seq(("SHORT", 0, 1.0), ("SHORT", 1, 2.0)))
    assert(Temporal.trendFit(s, epoch = "2024-01-01").count() == 0)
  }

  test("pairCorrelations: finds the anti-correlated pair and respects minOverlap") {
    val rows =
      (0 until 12).map(d => ("A", d, d.toDouble)) ++
        (0 until 12).map(d => ("B", d, 100.0 - d)) ++ // perfectly anti-corr with A
        (0 until 5).map(d => ("C", d, d * d * 1.0)) // too few overlaps
    val r = Temporal.pairCorrelations(daily(rows), minOverlap = 10, topK = 10)
      .select($"key_a", $"key_b", $"correlation", $"n_overlap")
      .as[(String, String, Double, Long)]
      .collect()
    assert(r.map(t => (t._1, t._2)).toSeq == Seq(("A", "B")))
    assert(r.head._3 == -1.0 && r.head._4 == 12L)
  }

  test("invariants on a seeded random series: gaps tile the range, ewma stays in hull") {
    val rnd = new scala.util.Random(42)
    val rows = for {
      k <- 0 until 8
      d <- 0 until 40 if rnd.nextDouble() > 0.3 // ~30% missing days
    } yield (s"K$k", d, rnd.nextDouble() * 100.0)
    val s = daily(rows)

    // observed days + reported gap days tile each key's [min, max] range
    val spans = s.groupBy($"key")
      .agg(min($"period").as("p0"), max($"period").as("p1"), count(lit(1)).as("n_obs"))
      .select($"key", (datediff($"p1", $"p0") + 1).as("range_days"), $"n_obs")
      .as[(String, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val gapDays = Temporal.gapReport(s)
      .groupBy($"key").agg(sum($"gap_days").as("g"))
      .as[(String, Long)].collect().toMap
    spans.foreach { case (k, (range, nObs)) =>
      assert(gapDays.getOrElse(k, 0L) + nObs == range.toLong, s"key $k does not tile")
    }

    // ewma is a convex combination of window values: always inside the
    // hull of the key's observed values
    val hull = s.groupBy($"key").agg(min($"value").as("lo"), max($"value").as("hi"))
    val out = Temporal.ewma(s, alpha = 0.5, span = 10)
      .join(hull, Seq("key"))
      .filter($"ewma" < $"lo" - 1e-9 || $"ewma" > $"hi" + 1e-9)
    assert(out.count() == 0, "ewma escaped the value hull")
  }

  test("ewma: alpha=0.5 weights halve per step and renormalize at the edge") {
    val s = daily(Seq(("K1", 0, 8.0), ("K1", 1, 4.0), ("K1", 2, 2.0)))
    val out = Temporal.ewma(s, alpha = 0.5, span = 4)
      .select($"period".cast("string"), $"ewma")
      .as[(String, Double)].collect().toMap
    assert(out("2024-01-01") == 8.0) // lone obs: weight renormalizes to 1
    assert(math.abs(out("2024-01-02") - (4.0 + 0.5 * 8.0) / 1.5) < 1e-12)
    assert(math.abs(out("2024-01-03") - (2.0 + 0.5 * 4.0 + 0.25 * 8.0) / 1.75) < 1e-12)
  }

  test("ewma: span truncates the memory") {
    val s = daily((0 until 5).map(d => ("K1", d, if (d == 0) 100.0 else 0.0)))
    val out = Temporal.ewma(s, alpha = 0.5, span = 2)
      .select($"period".cast("string"), $"ewma")
      .as[(String, Double)].collect().toMap
    // day 2 onward: the 100 at day 0 is outside the 2-row window
    assert(out("2024-01-03") == 0.0 && out("2024-01-05") == 0.0)
  }
}
