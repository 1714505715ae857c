package graft

import graft.operators.Sax
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaxSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def seriesDf(rows: Seq[(String, String, Double)]) =
    rows.toDF("key", "p", "value").select($"key", to_date($"p").as("period"), $"value")

  /** Independent naive SAX (plain Scala over the same conventions) —
    * the golden twin of the relational plan. */
  private def naive(values: Seq[Double], w: Int): String = {
    val u = values.map(v => math.round(v * 100))
    val n = u.size
    val mean = u.sum.toDouble / n
    val varu = u.map(x => x * x).sum.toDouble / n - mean * mean
    val frames = u.zipWithIndex.groupBy { case (_, i) => i.toLong * w / n }
    (0L until w).map { f =>
      val fu = frames(f).map(_._1)
      val z = if (varu <= 0) 0.0 else (fu.sum.toDouble / fu.size - mean) / math.sqrt(varu)
      if (z < -0.6745) 'a' else if (z < 0) 'b' else if (z < 0.6745) 'c' else 'd'
    }.mkString
  }

  test("saxWords matches an independent naive implementation on ramp/spike/flat shapes") {
    val shapes = Map(
      "ramp" -> (1 to 12).map(_.toDouble),
      "spike" -> Seq(5.0, 5.0, 5.0, 5.0, 90.0, 95.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0),
      "vee" -> Seq(9.0, 7.0, 5.0, 3.0, 1.0, 0.0, 0.5, 2.5, 4.5, 6.5, 8.5, 9.5),
      "noisy" -> Seq(3.1, 2.9, 3.3, 2.7, 3.0, 3.2, 2.8, 3.05, 2.95, 3.15, 2.85, 3.0))
    val rows = shapes.toSeq.flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case (v, i) => (k, f"2024-01-${i + 1}%02d", v) }
    }
    val got = Sax.saxWords(seriesDf(rows), w = 4, minLen = 8)
      .select($"key", $"word").as[(String, String)].collect().toMap
    shapes.foreach { case (k, vs) =>
      assert(got(k) == naive(vs, 4), s"key=$k got=${got(k)} want=${naive(vs, 4)}")
    }
  }

  test("flat series reads all-'c' (z pinned to 0, first letter at-or-above 0), short series are dropped") {
    val rows = (1 to 10).map(i => ("flat", f"2024-01-$i%02d", 7.0)) ++
      (1 to 5).map(i => ("short", f"2024-01-$i%02d", i.toDouble))
    val got = Sax.saxWords(seriesDf(rows), w = 5, minLen = 8)
      .select($"key", $"word").as[(String, String)].collect().toMap
    assert(got == Map("flat" -> "ccccc"))
  }

  test("words are gap-invariant: the same value sequence on different calendars matches") {
    // the PAA frames divide the OBSERVED sequence, so a key sampled
    // every day and one sampled irregularly share a word when their
    // observation sequences match — the sparse-series property the
    // slot-grid sign-LSH sketch lacks
    val vs = Seq(1.0, 2.0, 4.0, 8.0, 16.0, 24.0, 30.0, 33.0, 35.0, 36.0)
    val dense = vs.zipWithIndex.map { case (v, i) => ("dense", f"2024-01-${i + 1}%02d", v) }
    val sparseDays = Seq(1, 2, 5, 9, 10, 14, 17, 21, 25, 28)
    val sparse = vs.zip(sparseDays).map { case (v, d) => ("sparse", f"2024-02-$d%02d", v) }
    val got = Sax.saxWords(seriesDf(dense ++ sparse), w = 5, minLen = 8)
      .select($"key", $"word").as[(String, String)].collect().toMap
    assert(got("dense") == got("sparse"))
  }

  test("saxScreen surfaces a planted co-moving pair and verifies it with the exact corr") {
    // two keys tracking the same ramp (corr 1.0) among unrelated
    // deterministic-hash noise keys
    val planted = (1 to 14).flatMap { i =>
      Seq(("pa", f"2024-01-$i%02d", 10.0 + i * 3), ("pb", f"2024-01-$i%02d", 100.0 + i * 7))
    }
    val noise = (1 to 20).flatMap { k =>
      (1 to 14).map { i =>
        (f"n$k%02d", f"2024-01-$i%02d",
          ((k * 31 + i * 17) % 23).toDouble + ((k * 7 + i * 13) % 11) * 3.0)
      }
    }
    val out = Sax.saxScreen(seriesDf(planted ++ noise),
        w = 4, minLen = 8, minOverlap = 10, topK = 10)
      .select($"key_a", $"key_b", $"correlation").as[(String, String, Double)].collect()
    val top = out.maxBy(r => math.abs(r._3))
    assert((top._1, top._2) == ("pa", "pb"), out.mkString(", "))
    assert(top._3 == 1.0)
  }

  test("capped screen pairs are contained in the uncapped pairs and hot buckets are dropped") {
    // 8 keys share one hot flat word ('cccc'); 2 planted ramps share a
    // distinctive word. cap=4 must drop every hot-bucket pair and keep
    // the planted pair; every surviving (pair, correlation) must appear
    // IDENTICALLY in the uncapped output (the cap filters candidates,
    // never changes a verified score). topK large enough that neither
    // output truncates, so containment is over the full pair sets.
    // all 8 hot keys share one SHAPE (scaled copies → identical word,
    // SAX z-normalization is affine-invariant) so they pool in one
    // bucket of 8; their pairwise corr is a well-defined 1.0
    val hot = (1 to 8).flatMap { k =>
      (1 to 12).map(i => (f"h$k%02d", f"2024-01-$i%02d", (5.0 + i % 3) * (1.0 + 0.01 * k)))
    }
    val planted = (1 to 12).flatMap { i =>
      Seq(("pa", f"2024-01-$i%02d", 10.0 + i * 3), ("pb", f"2024-01-$i%02d", 100.0 + i * 7))
    }
    def pairs(maxBucket: Int) =
      Sax.saxScreen(seriesDf(hot ++ planted), w = 4, minLen = 8,
          minOverlap = 10, topK = 10000, maxBucket = maxBucket)
        .select($"key_a", $"key_b", $"correlation")
        .as[(String, String, Double)].collect().toSet
    val (capped, uncapped) = (pairs(4), pairs(0))
    assert(capped.subsetOf(uncapped), s"capped ⊄ uncapped: ${capped.diff(uncapped)}")
    assert(capped.exists(p => (p._1, p._2) == ("pa", "pb")), s"planted pair lost: $capped")
    assert(!capped.exists(_._1.startsWith("h")), s"hot bucket survived the cap: $capped")
    assert(uncapped.exists(_._1.startsWith("h")))
  }

  test("duplicate (key, period) rows are averaged before the verify join, not fanned out") {
    // 'dup' carries TWO rows per period whose mean equals 'clean's
    // value; correlations against the deduplicated twin must match
    // exactly and n_overlap must count PERIODS, not row combinations
    val base = (1 to 12).map(i => 10.0 + i * 3)
    val clean = base.zipWithIndex.flatMap { case (v, i) =>
      Seq(("ca", f"2024-01-${i + 1}%02d", v), ("cb", f"2024-01-${i + 1}%02d", v * 2 + 1)) }
    val dup = base.zipWithIndex.flatMap { case (v, i) =>
      Seq(("da", f"2024-01-${i + 1}%02d", v - 1.0), ("da", f"2024-01-${i + 1}%02d", v + 1.0),
        ("db", f"2024-01-${i + 1}%02d", v * 2 + 1)) }
    val out = Sax.saxScreen(seriesDf(clean ++ dup), w = 4, minLen = 8,
        minOverlap = 10, topK = 10000)
      .select($"key_a", $"key_b", $"correlation", $"n_overlap")
      .as[(String, String, Double, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("da", "db")) == ((1.0, 12L)), s"dup pair wrong: $out")
    assert(out(("ca", "cb")) == ((1.0, 12L)))
  }

  test("screen candidates are word-bucketed: output pairs share their word") {
    val rows = (1 to 30).flatMap { k =>
      (1 to 12).map(i => (f"k$k%02d", f"2024-01-$i%02d", ((k + i * k) % 17).toDouble))
    }
    val df = Sax.saxScreen(seriesDf(rows), w = 4, minLen = 8, minOverlap = 10, topK = 50)
    val words = Sax.saxWords(seriesDf(rows), w = 4, minLen = 8)
      .select($"key", $"word").as[(String, String)].collect().toMap
    df.select($"key_a", $"key_b", $"word").as[(String, String, String)].collect().foreach {
      case (a, b, wd) => assert(words(a) == wd && words(b) == wd)
    }
  }
}
