package graft

import graft.functions.FrequentItems
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries heavy-hitters aggregate: exactness below capacity, the
  * underestimate + n/(c+1) bound + presence guarantees under eviction
  * and distributed merges. */
class FrequentItemsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def sketch(items: Seq[String], capacity: Int, parts: Int): Map[String, Long] =
    items.toDF("k")
      .repartition(parts) // force real partial-buffer merges
      .agg(FrequentItems.udafFor(capacity)(col("k")).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

  test("capacity >= cardinality: estimates are exact regardless of partitioning") {
    val items = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(7)("c")
    for (parts <- Seq(1, 4, 8)) {
      val m = sketch(items, capacity = 8, parts = parts)
      assert(m === Map("a" -> 30L, "b" -> 20L, "c" -> 7L), s"parts=$parts")
    }
  }

  test("under eviction: underestimates, n/(c+1) bound, heavy items present") {
    // 2 heavy keys (400 each) in a sea of 200 distinct light keys (4 each)
    val heavy = Seq.fill(400)("hot1") ++ Seq.fill(400)("hot2")
    val light = (0 until 200).flatMap(i => Seq.fill(4)(s"cold$i"))
    val items = heavy ++ light
    val n = items.size
    val c = 16
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(1, 8)) {
      val m = sketch(items, capacity = c, parts = parts)
      assert(m.size <= c)
      m.foreach { case (k, est) =>
        assert(est <= exact(k), s"overestimate for $k (parts=$parts)")
        assert(exact(k) - est <= n / (c + 1), s"bound breach for $k (parts=$parts)")
      }
      // both heavy keys exceed n/(c+1)=94 -> guaranteed present
      assert(m.contains("hot1") && m.contains("hot2"), s"parts=$parts")
    }
  }

  test("guarantee holds for every item above threshold on an adversarial tail") {
    // many mid-weight keys right at the eviction boundary
    val items = (0 until 50).flatMap(i => Seq.fill(20 + i)(s"k$i"))
    val n = items.size
    val c = 10
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val m = sketch(items, capacity = c, parts = 4)
    exact.foreach { case (k, cnt) =>
      if (cnt > n / (c + 1)) assert(m.contains(k), s"missing guaranteed-heavy $k ($cnt)")
    }
    m.foreach { case (k, est) =>
      assert(est <= exact(k) && exact(k) - est <= n / (c + 1))
    }
  }
}
