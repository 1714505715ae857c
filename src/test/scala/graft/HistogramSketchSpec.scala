package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HistogramSketch

class HistogramSketchSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("quantiles on uniform data land within one bin width of truth") {
    val df = spark.range(100000).select((col("id") % 10000).cast("double").as("x"))
    val (lo, hi) = HistogramSketch.range(df, col("x"))
    assert(lo == 0.0 && hi == 9999.0)
    val hist = HistogramSketch.build(df, col("x"), lo, hi, 128)
    val binWidth = (hi - lo) / 128
    HistogramSketch.quantiles(hist, lo, hi, 128, Seq(0.25, 0.5, 0.75, 0.99))
      .foreach { case (q, est) =>
        val truth = q * (hi - lo)
        assert(math.abs(est - truth) <= binWidth,
          s"q=$q est=$est truth=$truth width=$binWidth")
      }
  }

  test("null values are dropped, not counted in bin 0") {
    // without the null filter, greatest(lit(lo), NULL) null-skips to lo
    // and every null row lands in bin 0, dragging quantiles toward lo
    val df = Seq(Some(5.0), Some(9.0), None, None, None).toDF("x")
    val hist = HistogramSketch.build(df, col("x"), 0.0, 10.0, 10)
      .as[(Int, Long)].collect().toMap
    assert(hist.values.sum == 2L, s"nulls were counted: $hist")
    assert(!hist.contains(0), s"nulls landed in bin 0: $hist")
  }

  test("histograms merge by addition to the whole (monoid)") {
    val a = spark.range(0, 5000).select(col("id").cast("double").as("x"))
    val b = spark.range(5000, 10000).select(col("id").cast("double").as("x"))
    val whole = a.unionByName(b)
    val (lo, hi) = HistogramSketch.range(whole, col("x"))
    val merged = HistogramSketch.merge(
      HistogramSketch.build(a, col("x"), lo, hi, 64),
      HistogramSketch.build(b, col("x"), lo, hi, 64))
      .orderBy("bin").as[(Int, Long)].collect().toSeq
    val direct = HistogramSketch.build(whole, col("x"), lo, hi, 64)
      .orderBy("bin").as[(Int, Long)].collect().toSeq
    assert(merged == direct)
  }

  test("degenerate range (all-equal column) bins everything at 0") {
    val df = Seq.fill(100)(42.0).toDF("x")
    val (lo, hi) = HistogramSketch.range(df, col("x"))
    assert(lo == hi)
    val hist = HistogramSketch.build(df, col("x"), lo, hi, 128)
      .as[(Int, Long)].collect().toSeq
    assert(hist == Seq((0, 100L)))
    val q = HistogramSketch.quantiles(
      hist.toDF("bin", "cnt"), lo, hi, 128, Seq(0.5))
    assert(q == Seq(0.5 -> 42.0)) // width 0: interpolation collapses to lo
  }

  test("out-of-range values clamp into the EDGE bins on both sides") {
    // fixed-geometry deployments (per-batch merges under one (lo, hi))
    // feed build() values outside the range; a below-lo value must land
    // in bin 0, not a negative bin that interpolation extrapolates
    val df = Seq(-500.0, -1.0, 0.0, 500.0, 999.0, 1500.0).toDF("x")
    val hist = HistogramSketch.build(df, col("x"), 0.0, 999.0, 16)
      .as[(Int, Long)].collect().toMap
    assert(hist(0) == 3L, hist.toString) // -500, -1, 0
    assert(hist(15) == 2L, hist.toString) // 999, 1500
    assert(hist.keys.forall(b => b >= 0 && b <= 15))
  }

  test("the max value is clamped into the last bin, counts total n") {
    val df = spark.range(1000).select(col("id").cast("double").as("x"))
    val hist = HistogramSketch.build(df, col("x"), 0.0, 999.0, 16)
      .as[(Int, Long)].collect()
    assert(hist.map(_._2).sum == 1000L)
    assert(hist.map(_._1).max == 15)
    assert(hist.map(_._1).min == 0)
  }
}
