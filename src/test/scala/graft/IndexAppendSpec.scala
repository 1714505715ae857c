package graft

import graft.functions.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental IVF-PQ index maintenance: appending a fresh batch under
  * the base-trained model must produce EXACTLY the rows a full
  * re-encode under the same model would — routing and encoding are
  * per-row, so the only thing a deployment can observe differing is
  * model staleness (the retrain-cadence decision), never row-level
  * divergence between the append path and a rebuild. */
class IndexAppendSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.load(spark, dir, "embeddings").cache()

  test("appended rows == full re-encode under the same base-trained model") {
    val base = emb.filter(col("vec_id") < 300)
    val fresh = emb.filter(col("vec_id") >= 300)
    val appended = Similarity
      .ivfPqIndexAppend(base, fresh, "vec_id", "embedding", cacheKey = Some("append-spec"))
      .orderBy("id").collect().map(_.toSeq)
    // same model (shared cacheKey trains once on base); re-encode EVERY
    // row and keep the fresh ids — per-row routing/encoding means the
    // two paths must agree exactly
    val rebuilt = Similarity
      .ivfPqIndexAppend(base, emb, "vec_id", "embedding", cacheKey = Some("append-spec"))
      .filter(col("id") >= 300)
      .orderBy("id").collect().map(_.toSeq)
    assert(appended.length == 200)
    assert(appended.sameElements(rebuilt))
  }

  test("append output is index-schema complete: one row per fresh id, valid code words") {
    val base = emb.filter(col("vec_id") < 300)
    val fresh = emb.filter(col("vec_id") >= 300)
    val rows = Similarity
      .ivfPqIndexAppend(base, fresh, "vec_id", "embedding",
        nLists = 8, nSub = 16, kSub = 16, cacheKey = Some("append-spec-2"))
      .collect()
    assert(rows.length == fresh.count())
    rows.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) < 8, s"bucket out of range: $r")
      val codes = r.getSeq[Int](2)
      assert(codes.length == 16 && codes.forall(c => c >= 0 && c < 16), s"bad codes: $r")
    }
  }
}
