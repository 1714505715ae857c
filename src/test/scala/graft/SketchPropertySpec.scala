package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{Hll, HistogramSketch}

/** ScalaCheck properties for the pure sketch kernels (the Spark-side
  * builds are spec- and oracle-gated; these pin the driver math). */
object HllProperties extends Properties("Hll") {

  private val ranksGen: Gen[Map[Int, Int]] =
    Gen.mapOf(Gen.zip(Gen.chooseNum(0, 255), Gen.chooseNum(1, 53)))

  property("estimate is positive and finite") = Prop.forAll(ranksGen) { m =>
    val e = Hll.estimateFromRanks(m)
    e > 0.0 && !e.isInfinite && !e.isNaN
  }

  property("empty registers estimate the raw floor alpha*m") = Prop.protect {
    // S = m when every rank is 0, so E = alpha*m^2/m = alpha*m (~184 at
    // m=256) — the raw estimator's floor, which is why callers with a
    // true empty stream special-case 0 (StreamingHll.estimate)
    val e = Hll.estimateFromRanks(Map.empty)
    math.abs(e - 0.7213 / (1.0 + 1.079 / 256.0) * 256.0) < 1e-9
  }

  property("raising any register never decreases the estimate") =
    Prop.forAll(ranksGen, Gen.chooseNum(0, 255), Gen.chooseNum(1, 53)) { (m, b, r) =>
      val raised = m.updated(b, math.max(m.getOrElse(b, 0), r))
      Hll.estimateFromRanks(raised) >= Hll.estimateFromRanks(m) - 1e-9
    }

  property("MAX-merge is commutative, associative, idempotent in estimate") =
    Prop.forAll(ranksGen, ranksGen) { (a, b) =>
      def merge(x: Map[Int, Int], y: Map[Int, Int]) =
        (x.keySet ++ y.keySet).map(k => k -> math.max(x.getOrElse(k, 0), y.getOrElse(k, 0))).toMap
      Hll.estimateFromRanks(merge(a, b)) == Hll.estimateFromRanks(merge(b, a)) &&
      Hll.estimateFromRanks(merge(a, a)) == Hll.estimateFromRanks(a)
    }
}

object HistogramProperties extends Properties("HistogramSketch") {

  private val histGen: Gen[Seq[(Int, Long)]] =
    Gen.mapOf(Gen.zip(Gen.chooseNum(0, 127), Gen.chooseNum(1L, 10000L)))
      .map(_.toSeq)

  private val qGen: Gen[Double] = Gen.chooseNum(0.0, 1.0)

  property("estimates stay inside [lo, hi]") = Prop.forAll(histGen, qGen) { (h, q) =>
    val Seq((_, est)) = HistogramSketch.quantilesFromCounts(h, 0.0, 1000.0, 128, Seq(q))
    est >= 0.0 && est <= 1000.0
  }

  property("quantiles are monotone in q") = Prop.forAll(histGen, qGen, qGen) { (h, q1, q2) =>
    val (ql, qh) = if (q1 <= q2) (q1, q2) else (q2, q1)
    val res = HistogramSketch.quantilesFromCounts(h, 0.0, 1000.0, 128, Seq(ql, qh)).map(_._2)
    res(0) <= res(1) + 1e-9
  }

  property("the estimate lands inside (or at the edge of) a populated bin") =
    Prop.forAll(histGen.suchThat(_.nonEmpty), qGen.suchThat(_ > 0.0)) { (h, q) =>
      val width = 1000.0 / 128
      val Seq((_, est)) = HistogramSketch.quantilesFromCounts(h, 0.0, 1000.0, 128, Seq(q))
      h.exists { case (b, _) => est >= b * width - 1e-9 && est <= (b + 1) * width + 1e-9 }
    }

  property("single-bin histogram interpolates linearly across that bin") =
    Prop.forAll(Gen.chooseNum(0, 127), Gen.chooseNum(1L, 1000L), qGen.suchThat(_ > 0.0)) {
      (b, c, q) =>
        val width = 1000.0 / 128
        val Seq((_, est)) =
          HistogramSketch.quantilesFromCounts(Seq(b -> c), 0.0, 1000.0, 128, Seq(q))
        // target = q*c falls inside the only bin: est = lo + (b + q)*w
        math.abs(est - (b + q * c / c) * width) < width + 1e-9 &&
          math.abs(est - (b * width + q * width)) < 1e-6
    }
}
