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
