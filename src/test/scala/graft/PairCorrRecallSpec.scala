package graft

import graft.operators.Temporal
import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Recall gate for the banded pair-correlation scale path: the sign-LSH
  * candidate screen must recover the exact screen's strongest pairs —
  * same contract as AnnRecallSpec for the embedding ANN family. */
class PairCorrRecallSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.01"

  test("banded candidates recover >= 0.8 of the exact top-50 co-moving pairs") {
    val series = Tables.engagementSeries(spark, dir)
    val exact = Temporal
      .pairCorrelations(series, minOverlap = 10, topK = 50)
      .select("key_a", "key_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    val banded = Temporal
      .pairCorrelationsBanded(
        series, epoch = "2024-01-01",
        slotDays = 2, nBits = 3, nBands = 5, minOverlap = 10, topK = 50)
      .select("key_a", "key_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    val recall = (exact & banded).size.toDouble / exact.size
    assert(exact.size == 50, s"exact screen returned ${exact.size} pairs")
    assert(recall >= 0.8, f"banded recall $recall%.2f < 0.8 (hit ${(exact & banded).size}/50)")
  }

  test("auto screen picks EXACT on the sparse harness series (and matches it)") {
    // harness keys are observed on ~10-15 of 31 days: the sign grid has
    // too little information at log2(keys) selectivity (measured recall
    // 0.04 at sf0.1) — the auto regime rule must refuse to band here
    val series = Tables.engagementSeries(spark, dir)
    val auto = Temporal
      .pairCorrelationsAuto(series, epoch = "2024-01-01",
        slotDays = 1, minOverlap = 10, topK = 50)
      .collect().map(_.toSeq).sortBy(_.toString)
    val exact = Temporal
      .pairCorrelations(series, minOverlap = 10, topK = 50)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(auto.sameElements(exact), "auto did not degrade to the exact screen")
  }

  test("auto screen picks BANDED on a dense corpus with recall >= 0.8 of exact top-50") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // ScaleBench-style planted corpus, small: 400 dense daily series over
    // 40 days; odd keys mirror their even partner (anti-correlated) with
    // jitter, so the exact top-50 is the plant. Support fills the grid
    // (40 >= nBits*nBands = 11*3), so the regime rule must band.
    val nKeys = 400L
    val nDays = 40
    val base = spark.range(nKeys * nDays).select(
      (col("id") / nDays).cast("long").as("k"),
      (col("id") % nDays).cast("int").as("d"))
    def noiseOf(k: org.apache.spark.sql.Column) =
      pmod(hash(k, col("d")), lit(1000)).cast("double") / 1000.0 - 0.5
    val even = (col("k") / 2).cast("long") * 2
    val jitter = pmod(hash(col("k"), col("d"), lit(7)), lit(1000)).cast("double") / 20000.0
    val series = base.select(
      col("k").cast("string").as("key"),
      date_add(lit("2024-01-01").cast("date"), col("d")).as("period"),
      (when(pmod(col("k"), lit(2)) === 0, noiseOf(even)).otherwise(-noiseOf(even)) * 10.0
        + jitter).as("value"))
    val (nBits, nBands) = Temporal.bandSizing(nKeys, nDays)
    assert(nDays >= nBits * nBands, "test corpus no longer dense enough to band")
    val exact = Temporal
      .pairCorrelations(series, minOverlap = 10, topK = 50)
      .select("key_a", "key_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val auto = Temporal
      .pairCorrelationsAuto(series, epoch = "2024-01-01",
        slotDays = 1, minOverlap = 10, topK = 50)
      .select("key_a", "key_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val recall = (exact & auto).size.toDouble / exact.size
    assert(recall >= 0.8, f"dense auto recall $recall%.2f < 0.8")
    // and it really banded: a candidate screen can MISS pairs, the exact
    // screen cannot — equality would mean the regime rule chose exact
    // (vacuous recall). Distinguish via the pre-pass arithmetic instead:
    val present = series.count()
    assert(present / nKeys >= nBits.toLong * nBands, "regime rule would not band")
  }

  test("banded results are a subset of the exact pair table (no fabricated pairs)") {
    val series = Tables.engagementSeries(spark, dir)
    // the full exact pair table (no top-k): every banded pair must appear
    // with the identical correlation — banding filters, never distorts
    val exactAll = Temporal
      .pairCorrelations(series, minOverlap = 10, topK = Int.MaxValue)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    val banded = Temporal
      .pairCorrelationsBanded(
        series, epoch = "2024-01-01",
        slotDays = 2, nBits = 3, nBands = 5, minOverlap = 10, topK = 50)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getDouble(2), r.getLong(3))))
    banded.foreach { case (pair, cv) =>
      assert(exactAll.get(pair).contains(cv), s"pair $pair: banded $cv vs exact ${exactAll.get(pair)}")
    }
  }
}
