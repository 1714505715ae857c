package graft

import graft.core.{MappingConfig, PeriodUnit, SeriesTable}
import graft.operators.{DtwMapping, LagCorrelation, MappingEngine}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end engine tests on reference-style archetypes
  * (/root/reference/test_mapping_engine.py:18-81): `simple` entities have
  * rev(t) = 0.1 * txn(t-1), so the engine must discover lag=1 with corr≈1. */
class MappingEngineSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val cfg = MappingConfig(periodUnit = PeriodUnit.Month, maxLag = 3, method = "correlation")

  /** Deterministic archetype generator: nCustomers x nMonths, pure 1-month
    * lag with 10% rate (no noise → exact recovery). */
  private def simpleData(nCustomers: Int, nMonths: Int): (DataFrame, DataFrame) = {
    val rng = new scala.util.Random(42)
    val rows = for {
      c <- 1 to nCustomers
      base = 100.0 + rng.nextInt(900)
      m <- 0 until nMonths
    } yield (f"CUS_$c%04d", f"2024-${m + 1}%02d", base + 37.0 * ((m * 7 + c) % 11))
    val txn = rows.toDF("customer_id", "month", "amount")
    val rev = rows.map { case (cid, month, amt) =>
      // rev in month m+1 = 10% of txn in month m
      val m = month.substring(5).toInt
      (cid, f"2024-${m + 1}%02d", amt * 0.1)
    }.toDF("customer_id", "month", "rev")
    (txn, rev)
  }

  test("canonicalize accepts 'yyyy-MM' strings and renames columns") {
    val (txn, _) = simpleData(2, 4)
    val t = SeriesTable.canonicalize(txn, "customer_id", "month", "amount", PeriodUnit.Month)
    assert(t.columns.toSeq == Seq("key", "period", "value"))
    val periods = t.select("period").distinct().as[java.sql.Date].collect().map(_.toString).sorted
    assert(periods.head == "2024-01-01")
  }

  test("missing required column raises with column name") {
    val (txn, _) = simpleData(2, 4)
    val e = intercept[IllegalArgumentException] {
      SeriesTable.canonicalize(txn.drop("month"), "customer_id", "month", "amount", PeriodUnit.Month)
    }
    assert(e.getMessage.contains("month"))
  }

  test("correlation discovers the pure 1-month lag with corr ~ 1") {
    val (txn, rev) = simpleData(5, 8)
    val t1 = SeriesTable.canonicalize(txn, "customer_id", "month", "amount", PeriodUnit.Month)
    val t2 = SeriesTable.canonicalize(rev, "customer_id", "month", "rev", PeriodUnit.Month)
    val best = LagCorrelation.bestLag(LagCorrelation.lagCorrTable(SeriesTable.merge(t1, t2), cfg))
    val rows = best.select("key", "optimal_lag", "correlation").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getInt(1) == 1, s"key ${r.getString(0)} lag ${r.getInt(1)} != 1")
      assert(r.getDouble(2) > 0.999999, s"corr ${r.getDouble(2)}")
    }
  }

  test("mapping rows pair month m with month m+lag and carry the score") {
    val (txn, rev) = simpleData(3, 6)
    val result = MappingEngine.mapTables(txn, rev, "customer_id", "month", "amount", "rev", cfg)
    val rows = result.collect()
    assert(rows.nonEmpty)
    result.select("time1", "time2").as[(String, String)].collect().foreach { case (t1m, t2m) =>
      assert(java.time.LocalDate.parse(t1m).plusMonths(1) == java.time.LocalDate.parse(t2m))
    }
    assert(result.filter(col("method") === "correlation").count() == rows.length)
    // value2 = 10% of value1 on every mapped pair
    result.select("value1", "value2").as[(Double, Double)].collect().foreach { case (v1, v2) =>
      assert(math.abs(v2 - 0.1 * v1) < 1e-9)
    }
  }

  test("correlation invariance under affine transform of either series") {
    val (txn, rev) = simpleData(3, 8)
    val t1 = SeriesTable.canonicalize(txn, "customer_id", "month", "amount", PeriodUnit.Month)
    val t2 = SeriesTable.canonicalize(rev, "customer_id", "month", "rev", PeriodUnit.Month)
    val t2scaled = t2.withColumn("value", col("value") * 5.0 + 1000.0)
    val a = LagCorrelation.bestLag(LagCorrelation.lagCorrTable(SeriesTable.merge(t1, t2), cfg))
    val b = LagCorrelation.bestLag(LagCorrelation.lagCorrTable(SeriesTable.merge(t1, t2scaled), cfg))
    val got = a.join(b.withColumnRenamed("correlation", "corr2"), Seq("key"))
      .select(abs(col("correlation") - col("corr2")).as[Double]).collect()
    got.foreach(d => assert(d < 1e-6))
  }

  test("dtw mapping: identical series align on the diagonal with zero cost") {
    val (txn, _) = simpleData(2, 6)
    val t1 = SeriesTable.canonicalize(txn, "customer_id", "month", "amount", PeriodUnit.Month)
    val merged = SeriesTable.merge(t1, t1.withColumnRenamed("value", "value"))
    val m = DtwMapping.mapping(merged, cfg.copy(method = "dtw"))
    val rows = m.collect()
    assert(rows.nonEmpty)
    m.select("dtw_cost").as[Double].collect().foreach(c => assert(c == 0.0))
    m.select("time1", "time2").as[(String, String)].collect().foreach { case (a, b) => assert(a == b) }
  }

  test("auto mode routes high-corr entities to correlation") {
    val (txn, rev) = simpleData(4, 8)
    val result = MappingEngine.mapTables(
      txn, rev, "customer_id", "month", "amount", "rev", cfg.copy(method = "auto"))
    val methods = result.select("method").distinct().as[String].collect().toSet
    assert(methods == Set("correlation"), s"expected all correlation, got $methods")
    assert(result.columns.contains("dtw_cost"), "unionByName keeps both method columns")
  }

  test("auto mode sends uncorrelated entities to dtw") {
    // table2 unrelated to table1 → corr far below 0.7 → DTW segment
    val rng = new scala.util.Random(1)
    val t1rows = for (m <- 1 to 9) yield ("K1", f"2024-$m%02d", rng.nextDouble() * 100)
    val t2rows = for (m <- 1 to 9) yield ("K1", f"2024-$m%02d", rng.nextDouble() * 100)
    val result = MappingEngine.mapTables(
      t1rows.toDF("k", "t", "v"), t2rows.toDF("k", "t", "v"),
      "k", "t", "v", "v", cfg.copy(method = "auto"))
    val methods = result.select("method").distinct().as[String].collect().toSet
    assert(methods == Set("dtw"), s"got $methods")
  }

  test("single-entity edge case") {
    val (txn, rev) = simpleData(1, 5)
    val result = MappingEngine.mapTables(txn, rev, "customer_id", "month", "amount", "rev", cfg)
    assert(result.count() > 0)
  }

  test("canonicalize sums duplicate observations per (key, period)") {
    val raw = Seq(
      ("K1", "2024-01", 5.0), ("K1", "2024-01", 7.0), ("K1", "2024-02", 1.0)
    ).toDF("k", "t", "v")
    val t = SeriesTable.canonicalize(raw, "k", "t", "v", PeriodUnit.Month)
    val m = t.select($"period".cast("string"), $"value").as[(String, Double)].collect().toMap
    assert(m.size == 2 && m("2024-01-01") == 12.0 && m("2024-02-01") == 1.0)
  }

  test("entities with no valid correlation still get a recommendation (corr -1 sentinel)") {
    // K_flat has a constant v1 series -> every lag's corr is NaN -> no row
    // in the corr table; it must still appear, routed away from Correlation
    val rows = (1 to 8).flatMap { m =>
      Seq(("K_ok", f"2024-$m%02d", m * 10.0, m * 1.0), ("K_flat", f"2024-$m%02d", 5.0, m * 1.0))
    }
    val merged = rows.toDF("key", "t", "v1", "v2")
      .select($"key", to_date(concat($"t", lit("-01"))).as("period"), $"v1", $"v2")
    val recs = graft.operators.Comparison.recommendationsFromMerged(merged, cfg)
      .select($"key", $"correlation", $"recommended_method").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(recs.contains("K_flat"), "flat entity must not be dropped")
    assert(recs("K_flat")._1 == -1.0)
    assert(recs("K_flat")._2 != "Correlation")
    assert(recs("K_ok")._1 > 0.9)
  }

  test("summary exposes nested all_lags; exploding it round-trips the corr table") {
    val (txn, rev) = simpleData(4, 8)
    val t1 = SeriesTable.canonicalize(txn, "customer_id", "month", "amount", PeriodUnit.Month)
    val t2 = SeriesTable.canonicalize(rev, "customer_id", "month", "rev", PeriodUnit.Month)
    val merged = SeriesTable.merge(t1, t2)
    val summary = LagCorrelation.summary(merged, cfg)
    // nested column is an array<struct<lag,correlation,n_overlap>> a user
    // can explode later (the reference's all_lags, 02_corr_mapping.p:25-29)
    val exploded = summary
      .select(col("key"), explode(col("all_lags")).as("x"))
      .select(col("key"), col("x.lag").as("lag"),
        col("x.correlation").as("correlation"), col("x.n_overlap").as("n_overlap"))
    val direct = LagCorrelation.lagCorrTable(merged, cfg)
      .select(col("key"), col("lag"), round(col("correlation"), 6).as("correlation"), col("n_overlap"))
    assert(exploded.count() == direct.count())
    assert(exploded.except(direct).count() == 0 && direct.except(exploded).count() == 0)
    // and the summary's best-lag fields agree with the window-argmax path
    val viaWindow = LagCorrelation.bestLag(LagCorrelation.lagCorrTable(merged, cfg))
      .select(col("key"), col("optimal_lag"), col("correlation"))
    val viaFold = summary.select(col("key"), col("optimal_lag"), col("correlation"))
    assert(viaFold.except(viaWindow).count() == 0 && viaWindow.except(viaFold).count() == 0)
  }

  test("short series (<2 overlapping points) produce no correlation rows") {
    val t1 = Seq(("K1", "2024-01", 5.0)).toDF("k", "t", "v")
    val t2 = Seq(("K1", "2024-01", 3.0)).toDF("k", "t", "v")
    val result = MappingEngine.mapTables(t1, t2, "k", "t", "v", "v", cfg)
    assert(result.count() == 0)
  }

  test("autoMapping broadcasts are gated: broadcastSummaries=false forces no hint") {
    // the segment key lists route through the same maybeBroadcast gate as
    // Pipeline.run — at 1M+ entities the per-entity key set is exactly
    // the table the gate exists to keep off the driver
    val (txn, rev) = simpleData(5, 8)
    val t1 = SeriesTable.canonicalize(txn, "customer_id", "month", "amount", PeriodUnit.Month)
    val t2 = SeriesTable.canonicalize(rev, "customer_id", "month", "rev", PeriodUnit.Month)
    val merged = SeriesTable.merge(t1, t2)
    def run(bcast: Boolean) = MappingEngine.autoMapping(
      merged, t1, t2, cfg.copy(method = "auto", broadcastSummaries = bcast))
    val gated = run(false)
    assert(
      !gated.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "broadcastSummaries=false must leave the strategy to Catalyst/AQE")
    assert(run(true).queryExecution.analyzed.toString.contains("ResolvedHint"))
    // and the gate never changes answers
    val a = gated.collect().map(_.toString).sorted
    val b = run(true).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
