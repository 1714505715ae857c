package graft

import graft.functions.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Cross-group shingle overlap: exact Jaccard identities and the
  * MinHash estimate's behavior at the extremes. */
class GroupOverlapSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("identical groups: jaccard 1 and signature estimate 1; disjoint: both 0-ish") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "a"),
      (2L, "alpha beta gamma delta epsilon zeta", "b"), // b == a
      (3L, "uno dos tres cuatro cinco seis", "c") // c disjoint from both
    ).toDF("doc_id", "text", "source")
    val rows = Dedup.groupOverlap(docs, "text", "source")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r)
      .toMap
    val ab = rows(("a", "b"))
    assert(ab.getAs[Double]("jaccard") === 1.0)
    assert(ab.getAs[Double]("est_jaccard") === 1.0)
    assert(ab.getAs[Long]("n_common") === ab.getAs[Long]("n_grams_a"))
    // c shares no shingles -> no pair row at all (driven by intersection)
    assert(!rows.contains(("a", "c")) && !rows.contains(("b", "c")))
  }

  test("partial overlap: exact jaccard matches set arithmetic") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6", "a"), // shingles: 4
      (2L, "w3 w4 w5 w6 w7 w8", "b") // shares "w3 w4 w5","w4 w5 w6"
    ).toDF("doc_id", "text", "source")
    val r = Dedup.groupOverlap(docs, "text", "source").collect()(0)
    assert(r.getAs[Long]("n_grams_a") === 4L)
    assert(r.getAs[Long]("n_grams_b") === 4L)
    assert(r.getAs[Long]("n_common") === 2L)
    assert(r.getAs[Double]("jaccard") === 0.333333) // 2 / (4+4-2)
  }
}
