package graft

import graft.core.{PeriodUnit, SeriesTable}
import graft.operators.BestLagAggregator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ResampleSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val gappy = Seq(
    ("K1", "2024-01-01", 10.0),
    ("K1", "2024-01-04", 40.0), // gap: 02, 03
    ("K2", "2024-01-02", 5.0)
  ).toDF("k", "t", "v")

  test("resample zero-fills every gap in each key's range") {
    val s = SeriesTable.canonicalize(gappy, "k", "t", "v", PeriodUnit.Day)
    val out = SeriesTable.resample(s, PeriodUnit.Day, "zero")
      .select($"key", $"period".cast("string"), $"value").as[(String, String, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out.size == 5) // K1: 4 days, K2: 1 day
    assert(out(("K1", "2024-01-02")) == 0.0 && out(("K1", "2024-01-03")) == 0.0)
    assert(out(("K1", "2024-01-01")) == 10.0 && out(("K1", "2024-01-04")) == 40.0)
  }

  test("resample forward-fills with last observation") {
    val s = SeriesTable.canonicalize(gappy, "k", "t", "v", PeriodUnit.Day)
    val out = SeriesTable.resample(s, PeriodUnit.Day, "forward")
      .select($"key", $"period".cast("string"), $"value").as[(String, String, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("K1", "2024-01-02")) == 10.0 && out(("K1", "2024-01-03")) == 10.0)
  }

  test("monthly resample uses month steps") {
    val m = Seq(("K1", "2024-01", 1.0), ("K1", "2024-04", 4.0)).toDF("k", "t", "v")
    val s = SeriesTable.canonicalize(m, "k", "t", "v", PeriodUnit.Month)
    val out = SeriesTable.resample(s, PeriodUnit.Month, "zero")
      .select($"period".cast("string")).as[String].collect().sorted
    assert(out.toSeq == Seq("2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01"))
  }

  test("SQL best_lag on dense series equals the relational calendar path") {
    BestLagAggregator.register(spark, maxLag = 3)
    // dense DAILY series (positional == calendar) with a lag-2 relation:
    // v2(t) = v1(t-2), so corr(v1(t), v2(t+lag)) peaks at lag 2
    val rows = for (k <- 1 to 4; d <- 0 until 14)
      yield (s"K$k", java.time.LocalDate.of(2024, 1, 1).plusDays(d).toString,
        100.0 + 17 * ((d * 3 + k) % 7))
    val m2 = rows.toDF("key", "p", "v1").select($"key", to_date($"p").as("period"), $"v1")
    val shifted = m2.withColumn(
      "v2src", lag($"v1", 2).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"key").orderBy($"period")))
      .filter($"v2src".isNotNull)
      .select($"key", $"period", $"v1", $"v2src".as("v2"))

    shifted.createOrReplaceTempView("dense_merged")
    val viaSql = spark.sql(
      """SELECT key, best_lag(CAST(period AS STRING), v1, v2) AS b
        |FROM dense_merged GROUP BY key""".stripMargin)
      .select($"key", $"b.optimal_lag", round($"b.correlation", 6).as("c"))
      .as[(String, Int, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    val relational = graft.operators.LagCorrelation.bestLag(
      graft.operators.LagCorrelation.lagCorrTable(
        shifted, graft.core.MappingConfig(periodUnit = PeriodUnit.Day, maxLag = 3)))
      .select($"key", $"optimal_lag", $"correlation")
      .as[(String, Int, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    assert(viaSql.keySet == relational.keySet)
    viaSql.foreach { case (k, (l, c)) =>
      assert(l == relational(k)._1, s"$k lag $l != ${relational(k)._1}")
      assert(math.abs(c - relational(k)._2) < 1e-6, s"$k corr")
    }
  }
}
