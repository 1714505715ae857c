package graft

import graft.functions.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Margin-based bitext mining: the planted translation pair wins with a
  * high margin and mutuality; a hub vector (near everything) is scored
  * down by its own neighborhood density. */
class BitextSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def unit(v: Seq[Double]): Seq[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  test("true pair is forward-best, mutual, and out-margins a hub match") {
    // src side: 4 orthogonal docs. tgt side: y10 is x0's translation
    // (nearly parallel), y11 is a HUB at equal angle to every src doc.
    val e = (i: Int) => Seq.tabulate(4)(j => if (j == i) 1.0 else 0.0)
    val vecs = Seq(
      (0L, e(0), "en"),
      (1L, e(1), "en"),
      (2L, e(2), "en"),
      (3L, e(3), "en"),
      (10L, unit(Seq(0.98, 0.02, 0.0, 0.0)), "de"),
      (11L, unit(Seq(0.5, 0.5, 0.5, 0.5)), "de"))
    val emb = vecs.map { case (id, v, _) => (id, v) }.toDF("vec_id", "embedding")
    val langs = vecs.map { case (id, _, l) => (id, l) }.toDF("vec_id", "lang")
    val rows = Similarity
      .mineBitext(emb, langs, "vec_id", "embedding", "lang", "en", "de", k = 2, minMargin = 1.0)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    // x0's forward best is the translation, not the hub, and it's mutual
    val p0 = rows(0L)
    assert(p0.getLong(1) === 10L)
    assert(p0.getAs[Long]("mutual") === 1L)
    assert(p0.getAs[Long]("accepted") === 1L)
    // a hub-only source doc (x2: cos 0.5 with hub, ~0 with y10) matches
    // the hub but with a LOWER margin than the true pair's
    val p2 = rows(2L)
    assert(p2.getLong(1) === 11L)
    assert(p0.getAs[Double]("margin") > p2.getAs[Double]("margin"))
    // every src doc got exactly one forward-best row
    assert(rows.keySet === Set(0L, 1L, 2L, 3L))
  }
}
