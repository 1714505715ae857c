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

  test("property: all-nonpositive-cosine corpora never surface margin or accepted") {
    // the guard at the margin computation is correctness-bearing: with
    // ax+ay <= 0 the raw ratio is NaN (0/0 — and Spark sorts NaN ABOVE
    // every double, so it would win the forward window and pass any
    // threshold), +Infinity, or sign-flipped. Property: for corpora
    // where every cross-language cosine is <= 0 or undefined (zero
    // vectors), every mined row has margin exactly 0 and accepted 0 —
    // even against a permissive threshold.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val nonneg = Gen.chooseNum(0.0, 5.0)
    val vecGen = Gen.frequency(
      4 -> Gen.listOfN(4, nonneg),
      1 -> Gen.const(List.fill(4)(0.0))) // zero vector: cosine is NaN
    val corpusGen = for {
      nx <- Gen.chooseNum(2, 5)
      ny <- Gen.chooseNum(2, 5)
      xs <- Gen.listOfN(nx, vecGen)
      ys <- Gen.listOfN(ny, vecGen)
    } yield (xs, ys.map(_.map(v => -v))) // src orthant+, tgt orthant- => dot <= 0
    val prop = Prop.forAll(corpusGen) { case (xs, ys) =>
      val vecs = xs.zipWithIndex.map { case (v, i) => (i.toLong, v, "en") } ++
        ys.zipWithIndex.map { case (v, i) => ((100 + i).toLong, v, "de") }
      val emb = vecs.map { case (id, v, _) => (id, v) }.toDF("vec_id", "embedding")
      val langs = vecs.map { case (id, _, l) => (id, l) }.toDF("vec_id", "lang")
      val rows = Similarity
        .mineBitext(emb, langs, "vec_id", "embedding", "lang", "en", "de",
          k = 2, minMargin = 0.5)
        .collect()
      rows.nonEmpty &&
        rows.forall(r => r.getAs[Double]("margin") == 0.0 &&
          r.getAs[Long]("accepted") === 0L)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
