package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DIMSUM-sampled term-term cosine: pass-through exactness at p=1,
  * bounded estimation error when genuinely sampling. */
class DimsumSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // deterministic corpus: 60 docs over a 12-word vocab with skewed
  // frequencies ("the"-like hot terms) and co-occurrence structure
  private lazy val docs = (0 until 60).map { i =>
    val words = Seq("the", "of") ++ // hot pair in every doc
      (if (i % 2 == 0) Seq("spark", "engine", "spark") else Seq("duck", "oracle")) ++
      (if (i % 3 == 0) Seq("join", "shuffle") else Seq("scan")) ++
      Seq(s"tail${i % 6}")
    (i.toLong, words.mkString(" "))
  }.toDF("doc_id", "text")

  test("sqrtGamma large enough for p=1 everywhere makes the estimate exact") {
    val out = TextFunctions
      .dimsumTermSimilarity(docs, "text", "doc_id", sqrtGamma = 1e6)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("est_cos") === r.getAs[Double]("cos"),
        s"pair ${r.getAs[String]("term_a")}/${r.getAs[String]("term_b")}")
      assert(r.getAs[Double]("abs_err") === 0.0)
    }
  }

  test("finite sqrtGamma samples hot terms yet keeps mean error bounded") {
    val df = TextFunctions.dimsumTermSimilarity(docs, "text", "doc_id", sqrtGamma = 5.0)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the hot 'the'/'of' columns (norm ~ sqrt(60)) must actually be
    // sampled at p < 1: their sampled dot can't equal the exact one
    // for EVERY hot pair if coins are real; assert estimation happened
    val sampled = rows.count(r => r.getAs[Double]("abs_err") > 0.0)
    assert(sampled > 0, "no pair shows sampling error — estimator degenerated to exact")
    val meanErr = rows.map(_.getAs[Double]("abs_err")).sum / rows.length
    assert(meanErr < 0.15, f"mean |est-cos| $meanErr%.4f too high")
    // estimates stay in a sane cosine range (reweighting can overshoot 1)
    rows.foreach(r => assert(r.getAs[Double]("est_cos") >= 0.0))
  }

  test("pairs are canonical (term_a < term_b) and driven by exact co-occurrence") {
    val rows = TextFunctions
      .dimsumTermSimilarity(docs, "text", "doc_id", sqrtGamma = 5.0)
      .collect()
    rows.foreach { r =>
      assert(r.getAs[String]("term_a") < r.getAs[String]("term_b"))
      assert(r.getAs[Long]("dot") > 0L) // row set = co-occurring pairs only
    }
  }
}
