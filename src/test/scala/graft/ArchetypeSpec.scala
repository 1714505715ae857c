package graft

import graft.core.{MappingConfig, PeriodUnit, SeriesTable}
import graft.operators.{DtwMapping, LagCorrelation, MappingEngine}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reproduction of the reference's three test archetypes
  * (/root/reference/test_mapping_engine.py:39-55, FIXTURES.md):
  * `simple` (pure 1-month lag), `complex` (multi-lag weighted mix),
  * `irregular` (sinusoidal modulation, varying lag) — deterministic
  * seed, engine behavior assertions per archetype. */
class ArchetypeSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val cfg = MappingConfig(periodUnit = PeriodUnit.Month, maxLag = 3)
  private val nMonths = 24

  /** txn series per entity: base + trend + noise (seeded). */
  private def txnValue(rng: scala.util.Random, m: Int): Double =
    500.0 + 20.0 * m + rng.nextGaussian() * 10.0

  private def genData(): (DataFrame, DataFrame) = {
    val rng = new scala.util.Random(42)
    val txnRows = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
    val revRows = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
    def month(m: Int) = f"2022-${m % 12 + 1}%02d-01".patch(0, (2022 + m / 12).toString, 4)
    for (archetype <- Seq("simple", "complex", "irregular"); e <- 1 to 5) {
      val key = s"${archetype}_$e"
      val txn = Array.tabulate(nMonths)(m => math.max(0, txnValue(rng, m)))
      txn.zipWithIndex.foreach { case (v, m) => txnRows += ((key, month(m), v)) }
      archetype match {
        case "simple" => // rev(t) = 0.1 * txn(t-1)
          for (m <- 1 until nMonths) revRows += ((key, month(m), 0.1 * txn(m - 1)))
        case "complex" => // rev(t) = 0.06*txn(t-1) + 0.04*txn(t-2)
          for (m <- 2 until nMonths)
            revRows += ((key, month(m), 0.06 * txn(m - 1) + 0.04 * txn(m - 2)))
        case "irregular" => // sinusoidal modulation, lag varies 0-2
          for (m <- 2 until nMonths) {
            val lag = rng.nextInt(3)
            val rate = 0.05 + rng.nextDouble() * 0.1
            revRows += ((key, month(m), rate * txn(m - lag) * (1 + 0.2 * math.sin(m))))
          }
      }
    }
    (txnRows.toSeq.toDF("customer_id", "month", "amount"),
      revRows.toSeq.toDF("customer_id", "month", "rev"))
  }

  private lazy val (txn, rev) = genData()
  private lazy val t1 = SeriesTable.canonicalize(txn, "customer_id", "month", "amount", PeriodUnit.Month)
  private lazy val t2 = SeriesTable.canonicalize(rev, "customer_id", "month", "rev", PeriodUnit.Month)
  private lazy val merged = SeriesTable.merge(t1, t2)

  test("simple archetype: lag 1 recovered with high correlation") {
    val best = LagCorrelation.bestLag(LagCorrelation.lagCorrTable(merged, cfg))
      .filter(col("key").startsWith("simple"))
      .select($"key", $"optimal_lag", $"correlation").as[(String, Int, Double)].collect()
    assert(best.length == 5)
    best.foreach { case (k, lagV, c) =>
      assert(lagV == 1, s"$k lag=$lagV")
      assert(c > 0.95, s"$k corr=$c")
    }
  }

  test("complex archetype: dominant lag 1 found; correlation still strong") {
    val best = LagCorrelation.bestLag(LagCorrelation.lagCorrTable(merged, cfg))
      .filter(col("key").startsWith("complex"))
      .select($"key", $"optimal_lag", $"correlation").as[(String, Int, Double)].collect()
    best.foreach { case (k, lagV, c) =>
      assert(lagV == 1, s"$k lag=$lagV") // 0.06 weight dominates 0.04
      assert(c > 0.8, s"$k corr=$c")
    }
  }

  test("auto mode: simple+complex go correlation; irregular keys split by fit") {
    val out = MappingEngine.autoMapping(merged, t1, t2, cfg)
    val methodByKey = out.select($"key", $"method").distinct().as[(String, String)].collect()
    methodByKey.filter(_._1.startsWith("simple")).foreach { case (k, m) =>
      assert(m == "correlation", s"$k -> $m")
    }
    // every irregular key got mapped by exactly one method
    val irr = methodByKey.filter(_._1.startsWith("irregular"))
    assert(irr.nonEmpty)
    assert(irr.groupBy(_._1).values.forall(_.length == 1))
  }

  test("dtw on irregular series yields monotone per-key paths over all months") {
    val m = DtwMapping
      .summarize(merged.filter(col("key").startsWith("irregular")), cfg)
      .collect()
    assert(m.length == 5)
    m.foreach { s =>
      assert(s.num_mappings >= nMonths - 2)
      val idx = s.path.map(p => (p.idx1, p.idx2))
      assert(idx == idx.sorted, s"${s.key} path not monotone")
    }
  }

  test("T4-parity throughput: 200 entities x 24 months beats the reference floor") {
    // reference perf scenario (test_mapping_engine.py:211-240): 200x24,
    // correlation, max_lag=6; its own floor is ~1,000 rec/s
    val rng = new scala.util.Random(4)
    val rows = for (k <- 1 to 200; m <- 0 until 24)
      yield (s"C$k", f"2022-${m % 12 + 1}%02d-01".patch(0, (2022 + m / 12).toString, 4),
        100.0 + rng.nextDouble() * 50 + m)
    val txn = rows.toDF("customer_id", "month", "amount")
    val rev = rows.map { case (k, month, v) =>
      (k, java.time.LocalDate.parse(month).plusMonths(1).toString, v * 0.1)
    }.toDF("customer_id", "month", "rev")
    val t0 = System.nanoTime()
    val n = graft.operators.MappingEngine.mapTables(
      txn, rev, "customer_id", "month", "amount", "rev",
      cfg.copy(method = "correlation", maxLag = 6)).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val recPerSec = (rows.length * 2) / sec
    assert(n > 0)
    // Functional floor only — 10x under the reference's 1,000 rec/s so a
    // loaded CI machine can't flake it; real throughput claims live in
    // ScaleBench/PERF.md (measured ~200x the reference floor).
    assert(recPerSec > 100, f"throughput $recPerSec%.0f rec/s — something is pathologically slow")
  }

  test("empty merged input: auto mapping yields empty result with full schema") {
    val empty = merged.filter(lit(false))
    val out = MappingEngine.autoMapping(empty, t1.filter(lit(false)), t2.filter(lit(false)), cfg)
    assert(out.count() == 0)
    assert(out.columns.toSet.contains("correlation") && out.columns.toSet.contains("dtw_cost"))
  }

  test("maxSeriesLength guard fails fast with the offending key") {
    val guard = cfg.copy(maxSeriesLength = 10)
    val e = intercept[org.apache.spark.SparkException] {
      DtwMapping.summarize(merged.filter(col("key") === "simple_1"), guard).collect()
    }
    assert(e.getMessage.contains("simple_1") || e.getCause.getMessage.contains("simple_1"))
  }
}
