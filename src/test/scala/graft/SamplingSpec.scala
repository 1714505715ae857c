package graft

import graft.functions.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The properties deterministic sampling exists for: same ids in, same
  * rows out — across runs, partitionings, and dataset growth. */
class SamplingSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private lazy val docs = (1 to 2000)
    .map(i => (i.toLong, if (i % 3 == 0) "en" else "de", s"text $i"))
    .toDF("doc_id", "lang", "text")

  test("hashSample is deterministic and approximately sized") {
    val a = Sampling.hashSample(docs, "doc_id", 0.5).select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "selection must not depend on partitioning")
    assert(math.abs(a.size - 1000) < 120, s"got ${a.size} of 2000 at fraction 0.5")
  }

  test("sampling decisions are stable as the dataset grows (incremental property)") {
    val first = Sampling.hashSample(docs.filter($"doc_id" <= 1000), "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    val grown = Sampling.hashSample(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(grown.filter(_ <= 1000) == first, "growing the input must not flip old decisions")
  }

  test("hashSampleBy applies per-stratum fractions; unlisted strata drop") {
    val s = Sampling.hashSampleBy(docs, "doc_id", "lang", Map("en" -> 1.0))
    assert(s.select("lang").distinct().as[String].collect().toSeq == Seq("en"))
    assert(s.count() == docs.filter($"lang" === "en").count())
  }

  test("trainTestSplit partitions every row exactly once, stably") {
    val split = Sampling.trainTestSplit(docs, "doc_id", 0.125)
    assert(split.count() == 2000)
    val test = split.filter($"split" === "test").count()
    assert(math.abs(test - 250) < 60, s"test split size $test vs expected 250")
    // a row's split never changes when the data is re-partitioned
    val again = Sampling.trainTestSplit(docs.repartition(13), "doc_id", 0.125)
    assert(split.select("doc_id", "split").except(again.select("doc_id", "split")).count() == 0)
  }

  test("exactSampleBy: row-exact per stratum, deterministic, near-stable under growth") {
    val sample = Sampling.exactSampleBy(docs, "doc_id", "lang", n = 40)
    val counts = sample.groupBy("lang").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    full.foreach { case (lang, total) =>
      assert(counts.getOrElse(lang, 0L) == math.min(40L, total), s"lang=$lang")
    }
    // deterministic under repartition
    val again = Sampling.exactSampleBy(docs.repartition(13), "doc_id", "lang", n = 40)
    assert(sample.select("doc_id").except(again.select("doc_id")).count() == 0)
    // growth: adding rows only swaps members whose hash undercuts them —
    // the surviving intersection stays large (here: exact subset check on
    // a doubled corpus would need new ids; assert sample ids still chosen
    // from the original membership when sampling a superset)
    val superset = docs.unionByName(
      docs.withColumn("doc_id", $"doc_id" + 1000000L))
    val grown = Sampling.exactSampleBy(superset, "doc_id", "lang", n = 40)
    val kept = grown.join(sample.select("doc_id"), Seq("doc_id"), "left_semi").count()
    assert(kept >= 10, s"grown sample shares only $kept rows with the original")
  }

  test("weightedSample: deterministic, weight-monotone, exact-k") {
    val weighted = docs.withColumn("w", when($"doc_id" <= 100, 1000.0).otherwise(1.0))
    val s = Sampling.weightedSample(weighted, "doc_id", "w", k = 50)
    assert(s.count() == 50)
    // same sample under a different partitioning (pure function of id+w)
    val again = Sampling.weightedSample(weighted.repartition(11), "doc_id", "w", k = 50)
    assert(s.select("doc_id").except(again.select("doc_id")).count() == 0)
    // 100 rows carry 1000x the weight of the other 1900: they hold
    // ~1000/(1000+~2) of the mass, so the top-50 should be dominated by
    // them (P[any light row drawn before 50 heavy] is tiny)
    val heavy = s.filter($"doc_id" <= 100).count()
    assert(heavy >= 45, s"only $heavy of 50 sampled rows are heavy-weight")
    // zero/negative weights never sampled
    val withZero = weighted.withColumn("w", when($"doc_id" === 1L, 0.0).otherwise($"w"))
    assert(Sampling.weightedSample(withZero, "doc_id", "w", k = 2000)
      .filter($"doc_id" === 1L).count() == 0)
  }

  test("weightedSampleBy: exact k per stratum, deterministic") {
    val weighted = docs.withColumn("w", ($"doc_id" % 7 + 1).cast("double"))
    val s = Sampling.weightedSampleBy(weighted, "doc_id", "lang", "w", k = 30)
    val counts = s.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> 30L, "de" -> 30L))
    val again = Sampling.weightedSampleBy(weighted.repartition(5), "doc_id", "lang", "w", 30)
    assert(s.select("doc_id").except(again.select("doc_id")).count() == 0)
  }

  test("weightedSampleByTokenBudget stops at the budget, boundary doc included") {
    val d = docs.withColumn("w", lit(1.0)).withColumn("nt", lit(30L))
    val s = Sampling.weightedSampleByTokenBudget(d, "doc_id", "lang", "w", "nt", 100L)
    // 30-token docs against a 100-token budget: cum 30/60/90/120 — the
    // 4th doc crosses the boundary and is the last one kept
    val counts = s.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> 4L, "de" -> 4L), s"got $counts")
    // deterministic under repartition
    val again = Sampling.weightedSampleByTokenBudget(
      d.repartition(9), "doc_id", "lang", "w", "nt", 100L)
    assert(s.select("doc_id").except(again.select("doc_id")).count() == 0)
    // zero budget still yields the first doc per stratum (cum - nt < 0 is
    // false for every row... boundary: first row cum-nt = 0 < 0 false) —
    // so zero budget yields nothing
    assert(Sampling.weightedSampleByTokenBudget(d, "doc_id", "lang", "w", "nt", 0L)
      .count() == 0)
  }

  test("mixtureRates: rate = min(1, weight*budget/tokens), zero for unlisted strata") {
    val rows = Seq(
      ("a", 100L), ("a", 100L), // a: 200 tokens
      ("b", 50L),               // b: 50 tokens
      ("c", 500L)               // c: unlisted
    ).toDF("source", "n")
    val m = Sampling.mixtureRates(rows, "source", "n", Map("a" -> 0.6, "b" -> 0.4), 100L)
      .collect().map(r => r.getAs[String]("stratum") ->
        (r.getAs[Double]("sample_rate"), r.getAs[Long]("expected_tokens"))).toMap
    assert(m("a") == ((0.3, 60L)))  // 0.6*100/200
    assert(m("b") == ((0.8, 40L)))  // 0.4*100/50
    assert(m("c") == ((0.0, 0L)))
  }

  test("capPerGroup keeps the best N per group, deterministic ties by id") {
    val rows = Seq(
      // srcA: quality 0.9, 0.8, 0.8, 0.1 — cap 2 keeps 0.9 and the
      // LOWER-id of the two 0.8s
      (1L, "srcA", 0.8), (2L, "srcA", 0.9), (3L, "srcA", 0.8), (4L, "srcA", 0.1),
      // srcB under the cap: all kept
      (5L, "srcB", 0.5)
    ).toDF("doc_id", "source", "q")
    val kept = Sampling.capPerGroup(rows, "source", "q", "doc_id", cap = 2)
      .select("doc_id", "group_rank").as[(Long, Int)].collect().toMap
    assert(kept.keySet == Set(1L, 2L, 5L))
    assert(kept(2L) == 1 && kept(1L) == 2 && kept(5L) == 1)
    // partitioning must not change the survivors
    val again = Sampling.capPerGroup(rows.repartition(7), "source", "q", "doc_id", cap = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(again == Set(1L, 2L, 5L))
    // rank-limit must push a partial limit below the exchange (a hot
    // domain never ships its full membership to one reducer)
    val plan = Sampling.capPerGroup(rows, "source", "q", "doc_id", cap = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }
}
