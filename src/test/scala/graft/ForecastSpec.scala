package graft

import graft.core.{PeriodUnit, SeriesTable}
import graft.operators.Forecast
import org.scalatest.funsuite.AnyFunSuite

class ForecastSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def daily(rows: Seq[(String, Int, Double)]) = {
    val df = rows
      .map { case (k, d, v) =>
        (k, java.time.LocalDate.of(2024, 1, 1).plusDays(d).toString, v)
      }
      .toDF("k", "t", "v")
    SeriesTable.canonicalize(df, "k", "t", "v", PeriodUnit.Day)
  }

  test("holt: hand-computed updates and forecast") {
    // xs = [2, 4, 8]: seed (level, trend) = (4, 2);
    // x=8 -> level' = 0.5*8 + 0.5*6 = 7, trend' = 0.5*3 + 0.5*2 = 2.5
    val s = daily(Seq(("K1", 0, 2.0), ("K1", 1, 4.0), ("K1", 2, 8.0)))
    val r = Forecast.holt(s, 0.5, 0.5, horizon = 7).collect().head
    assert(r.n == 3L && r.level == 7.0 && r.trend == 2.5)
    assert(r.forecast == 7.0 + 7 * 2.5)
  }

  test("holt: a linear series converges to its true slope") {
    val s = daily((0 until 30).map(d => ("K1", d, 10.0 + 3.0 * d)))
    val r = Forecast.holt(s, 0.5, 0.5, horizon = 1).collect().head
    assert(math.abs(r.trend - 3.0) < 1e-6)
    assert(math.abs(r.level - (10.0 + 3.0 * 29)) < 1e-6)
    assert(math.abs(r.forecast - (10.0 + 3.0 * 30)) < 1e-5)
  }

  test("holt: single-observation keys are dropped, order is by period") {
    val s = daily(Seq(("LONE", 5, 9.0), ("K1", 1, 4.0), ("K1", 0, 2.0), ("K1", 2, 8.0)))
    val out = Forecast.holt(s, 0.5, 0.5, 7).collect()
    assert(out.map(_.key).toSeq == Seq("K1")) // unsorted input, same result
    assert(out.head.level == 7.0)
  }

  test("holt: oversized series fails fast with the offending key") {
    val s = daily((0 until 20).map(d => ("BIG", d, 1.0)))
    val e = intercept[org.apache.spark.SparkException] {
      Forecast.holt(s, 0.5, 0.5, 7, maxSeriesLength = 10).collect()
    }
    assert(e.getMessage.contains("BIG") || e.getCause.getMessage.contains("BIG"))
  }
}
