package graft

import graft.core.{PeriodUnit, SeriesTable}
import graft.operators.Decompose
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the time-series decomposition family:
  * linear interpolation, STL-lite seasonal split, Welch mean-shift. */
class DecomposeSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def daily(rows: Seq[(String, Int, Double)]) = {
    val df = rows
      .map { case (k, d, v) =>
        (k, java.time.LocalDate.of(2024, 1, 1).plusDays(d).toString, v)
      }
      .toDF("k", "t", "v")
    SeriesTable.canonicalize(df, "k", "t", "v", PeriodUnit.Day)
  }

  test("interpolate fills interior gaps linearly and flags them") {
    val s = daily(Seq(("K1", 0, 10.0), ("K1", 3, 40.0), ("K2", 0, 5.0)))
    val out = SeriesTable.interpolate(s)
      .select($"key", $"period".cast("string"), $"value", $"interpolated")
      .as[(String, String, Double, Boolean)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out.size == 5) // K1 spans 4 days, K2 one
    assert(out(("K1", "2024-01-01")) == ((10.0, false)))
    assert(out(("K1", "2024-01-02")) == ((20.0, true)))
    assert(out(("K1", "2024-01-03")) == ((30.0, true)))
    assert(out(("K1", "2024-01-04")) == ((40.0, false)))
    assert(out(("K2", "2024-01-01")) == ((5.0, false)))
  }

  test("interpolate weights by calendar distance, not gap index") {
    // gap of 4 days: 0 -> 100 over 5 days = 20/day
    val s = daily(Seq(("K1", 0, 0.0), ("K1", 5, 100.0)))
    val out = SeriesTable.interpolate(s)
      .select($"period".cast("string"), $"value")
      .as[(String, Double)].collect().toMap
    assert(out("2024-01-03") == 40.0 && out("2024-01-05") == 80.0)
  }

  test("seasonal: pure linear series has zero seasonal and residual") {
    // value = 10 + d: the centered 7-day mean of a linear ramp IS the
    // center value, so detrended == 0 everywhere the frame is full
    val s = daily((0 until 21).map(d => ("K1", d, 10.0 + d)))
    val rows = Decompose.seasonal(s)
      .select($"period".cast("string"), $"value", $"trend", $"seasonal", $"residual")
      .collect()
    assert(rows.length == 21)
    val byDay = rows.map(r => r.getString(0) -> r).toMap
    // edges: frame incomplete -> null trend/residual
    assert(byDay("2024-01-01").isNullAt(2) && byDay("2024-01-21").isNullAt(2))
    // interior: trend == value, residual ~ 0
    val mid = byDay("2024-01-10")
    assert(math.abs(mid.getDouble(2) - mid.getDouble(1)) < 1e-9)
    assert(math.abs(mid.getDouble(4)) < 1e-9)
  }

  test("seasonal recovers an additive weekday pattern") {
    // value = 100 + bump(dow): flat trend, so the seasonal mean per
    // weekday equals bump minus the trend-window smoothing leftovers;
    // with a full-period-repeating pattern the 7-day MA is constant 101
    val bump = Map(0 -> 7.0, 1 -> 0.0, 2 -> 0.0, 3 -> 0.0, 4 -> 0.0, 5 -> 0.0, 6 -> 0.0)
    val s = daily((0 until 28).map { d =>
      val dow = java.time.LocalDate.of(2024, 1, 1).plusDays(d).getDayOfWeek.getValue - 1
      ("K1", d, 100.0 + bump(dow))
    })
    val out = Decompose.seasonal(s)
      .filter($"trend".isNotNull)
      .select(weekday($"period").as("dow"), $"seasonal", $"residual")
      .collect()
    // 7-day MA of the repeating pattern = 101 everywhere (full frames);
    // seasonal(dow=0) = 7 - 1 = 6, all other dows = -1; residual = 0
    out.foreach { r =>
      val expected = if (r.getInt(0) == 0) 6.0 else -1.0
      assert(math.abs(r.getDouble(1) - expected) < 1e-9, s"dow ${r.getInt(0)}")
      assert(math.abs(r.getDouble(2)) < 1e-9)
    }
  }

  test("meanShift flags a level step against within-window noise") {
    // alternating +/-0.5 noise around 10 for 14 days, then around 30:
    // Welch z explodes at the step; pooled-window z would cap near 2
    val s = daily((0 until 28).map { d =>
      val base = if (d < 14) 10.0 else 30.0
      ("K1", d, base + (if (d % 2 == 0) -0.5 else 0.5))
    })
    val out = Decompose.meanShift(s)
      .select($"period".cast("string"), $"shift_z", $"is_shift")
      .collect().map(r => r.getString(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Double]), r.getBoolean(2)))).toMap
    // first full-history day is day 13 (2024-01-14): windows both pre-step
    val (zQuiet, fQuiet) = out("2024-01-14")
    assert(!fQuiet && math.abs(zQuiet.get) < 3.0)
    // day 20 (2024-01-21): recent = all post-step, prior = all pre-step
    val (zStep, fStep) = out("2024-01-21")
    assert(fStep, s"step day not flagged, z=$zStep")
    assert(zStep.get > 30.0, s"Welch z should explode at the step, got $zStep")
  }

  test("repairOutliers heals a spike by interpolating clean neighbors") {
    // med=10, mad=0: only the spike deviates, so only it is flagged;
    // its clean neighbors (both 10) interpolate it back to 10
    val s = daily(Seq(
      ("K1", 0, 10.0), ("K1", 1, 10.0), ("K1", 2, 10.0), ("K1", 3, 100.0),
      ("K1", 4, 10.0), ("K1", 5, 10.0), ("K1", 6, 10.0)))
    val out = Decompose.repairOutliers(s)
      .select($"period".cast("string"), $"is_outlier", $"repaired")
      .as[(String, Boolean, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("2024-01-04") == ((true, 10.0)))
    assert(out.filter(_._1 != "2024-01-04").values.forall(v => !v._1 && v._2 == 10.0))
  }

  test("repairOutliers weights interpolation by calendar distance over gaps") {
    // spike at day 2; clean neighbors at day 0 (0.0) and day 6 (60.0):
    // repaired = 0 + 60 * 2/6 = 20
    val s = daily(Seq(
      ("K1", 0, 0.0), ("K1", 2, 500.0), ("K1", 6, 60.0),
      // spread anchors: med=40, mad=20 -> only the 500 exceeds 3*mad
      ("K1", 8, 10.0), ("K1", 9, 20.0), ("K1", 10, 40.0), ("K1", 11, 50.0)))
    val out = Decompose.repairOutliers(s)
      .select($"period".cast("string"), $"is_outlier", $"repaired")
      .as[(String, Boolean, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("2024-01-03")._1, "spike must be flagged")
    assert(math.abs(out("2024-01-03")._2 - 20.0) < 1e-9, s"got ${out("2024-01-03")._2}")
  }

  test("repairOutliers: edge outlier takes its one clean neighbor") {
    val s = daily(Seq(
      ("K1", 0, 900.0), ("K1", 1, 10.0), ("K1", 2, 10.0),
      ("K1", 3, 10.0), ("K1", 4, 10.0)))
    val out = Decompose.repairOutliers(s)
      .select($"period".cast("string"), $"is_outlier", $"repaired")
      .as[(String, Boolean, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("2024-01-01") == ((true, 10.0)))
  }

  test("meanShift yields null z (no flag) on zero-variance windows") {
    val s = daily((0 until 28).map(d => ("K1", d, 5.0)))
    val out = Decompose.meanShift(s).select($"shift_z", $"is_shift").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.isNullAt(0) && !r.getBoolean(1)))
  }
}
