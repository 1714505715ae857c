package graft

import graft.operators.Dtw
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the DTW kernel (SURVEY.md §5). */
object DtwProperties extends Properties("Dtw") {

  private val series: Gen[Array[Double]] =
    Gen.chooseNum(2, 24).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0)).map(_.toArray))

  property("cost is non-negative and finite") = Prop.forAll(series, series) { (a, b) =>
    val (c, _) = Dtw.distance(a, b)
    c >= 0.0 && !c.isInfinite && !c.isNaN
  }

  property("self-distance is zero with identity-containing path") =
    Prop.forAll(series) { a =>
      val (c, path) = Dtw.distance(a, a)
      c == 0.0 && path.length >= a.length
    }

  property("cost symmetric under swap (unconstrained)") = Prop.forAll(series, series) { (a, b) =>
    math.abs(Dtw.distance(a, b)._1 - Dtw.distance(b, a)._1) < 1e-9
  }

  property("path is monotone, continuous, anchored at both corners") =
    Prop.forAll(series, series) { (a, b) =>
      val (_, path) = Dtw.distance(a, b)
      val anchored = path.head == ((0, 0)) && path.last == ((a.length - 1, b.length - 1))
      val steps = path.toSeq.sliding(2).forall {
        case Seq((i1, j1), (i2, j2)) =>
          (i2 - i1) >= 0 && (j2 - j1) >= 0 && (i2 - i1) <= 1 && (j2 - j1) <= 1 &&
            (i2 - i1) + (j2 - j1) >= 1
        case _ => true
      }
      anchored && steps
    }

  property("normalization invariance: affine-transformed input, same cost") =
    Prop.forAll(series, series, Gen.chooseNum(0.5, 10.0), Gen.chooseNum(-50.0, 50.0)) {
      (a, b, scale, shift) =>
        val a2 = a.map(x => x * scale + shift)
        val c1 = Dtw.distance(a, b, normalizeInput = true)._1
        val c2 = Dtw.distance(a2, b, normalizeInput = true)._1
        math.abs(c1 - c2) < 1e-6
    }

  property("banded cost >= unconstrained cost") = Prop.forAll(series, series) { (a, b) =>
    val w = math.max(1, math.abs(a.length - b.length))
    Dtw.distance(a, b, Some(w))._1 >= Dtw.distance(a, b, None)._1 - 1e-9
  }

  property("band covering the whole grid equals unconstrained exactly") =
    Prop.forAll(series, series) { (a, b) =>
      val w = math.max(a.length, b.length)
      val (cb, pb) = Dtw.distance(a, b, Some(w))
      val (cu, pu) = Dtw.distance(a, b, None)
      math.abs(cb - cu) < 1e-12 && pb.toSeq == pu.toSeq
    }

  property("normalize: zero mean, unit (population) variance for non-constant input") =
    Prop.forAll(series) { a =>
      val out = Dtw.normalize(a)
      val mean = out.sum / out.length
      val variance = out.map(x => (x - mean) * (x - mean)).sum / out.length
      val constant = a.distinct.length == 1
      math.abs(mean) < 1e-9 && (constant || math.abs(variance - 1.0) < 1e-6)
    }
}
