package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Winsorization semantics: exact-percentile boundaries per group,
  * values clipped to them, flags mark the direction. (describe() is
  * oracle-locked via q23; winsorize via q34 — these are the unit-level
  * edge cases.) */
class StatsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("winsorize clips to per-group percentile boundaries") {
    // group a: 1..100 → p05 (interpolated) = 5.95, p95 = 95.05
    // group b: constant 7 → boundaries 7/7, nothing clips
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++ Seq.fill(10)(("b", 7.0)))
      .toDF("g", "v")
    val w = Stats.winsorize(df, "v", Seq("g"), 0.05, 0.95)
    val a = w.filter($"g" === "a")
    assert(a.agg(min($"v_w"), max($"v_w")).as[(Double, Double)].head() == ((5.95, 95.05)))
    // 5 low values (1..5) below 5.95, 5 high (96..100) above 95.05
    assert(a.filter($"__clipped" === -1).count() == 5)
    assert(a.filter($"__clipped" === 1).count() == 5)
    // interior values untouched
    assert(a.filter($"__clipped" === 0 && $"v_w" =!= $"v").count() == 0)
    val b = w.filter($"g" === "b")
    assert(b.filter($"__clipped" =!= 0).count() == 0)
    assert(b.select($"v_w").distinct().as[Double].collect().toSeq == Seq(7.0))
  }

  test("madOutliers flags robustly: one wild value does not move the scale") {
    // 99 values in [1,99] plus one wild 1e6: median ~50.5, MAD ~25 —
    // only the wild point exceeds 3*MAD. A z-score at 3 sigma would have
    // sigma ~1e5 dragged by the outlier itself.
    val df = ((1 to 99).map(i => ("a", i.toDouble)) :+ (("a", 1e6))).toDF("g", "v")
    val out = Stats.madOutliers(df, "v", Seq("g"))
    val flagged = out.filter($"__outlier").select($"v").as[Double].collect().toSeq
    assert(flagged == Seq(1e6), s"flagged $flagged")
    assert(out.filter($"__outlier" === false).count() == 99)
  }

  test("winsorize rejects bad bounds") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException](Stats.winsorize(df, "v", Nil))
    intercept[IllegalArgumentException](Stats.winsorize(df, "v", Seq("g"), 0.9, 0.1))
  }
}
