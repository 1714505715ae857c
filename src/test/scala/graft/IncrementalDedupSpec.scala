package graft

import graft.functions.{IncrementalDedup, TextFunctions => TF}
import graft.functions.expressions.BloomMightContain
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalDedupSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three four five six seven eight nine ten eleven twelve"),
    (3L, "totally unrelated corpus content that stands alone just fine")
  ).toDF("doc_id", "text")

  private lazy val batch = Seq(
    // doc 10: repeats corpus doc 1 verbatim -> every shingle is a dup
    (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    // doc 11: fresh content, zero overlap
    (11L, "completely new material nothing of this exists in the index"),
    // doc 12: one corpus passage embedded in new text (partial overlap)
    (12L, "prefix words one two three four five six seven eight suffix words")
  ).toDF("doc_id", "text")

  test("bloom probe has no false negatives over the indexed set") {
    BloomMightContain.register(spark)
    val idx = IncrementalDedup
      .shingleFps(corpus, "text", "doc_id", 4).select($"fp").distinct()
    val bytes = IncrementalDedup.buildBloom(idx, fpp = 0.01)
    val misses = idx
      .withColumn("hit", call_function("bloom_might_contain", lit(bytes), $"fp"))
      .filter(!$"hit")
      .count()
    assert(misses == 0, "a bloom filter must never reject an inserted key")
  }

  test("the sketch broadcasts once per held byte array, fresh per re-serialization") {
    BloomMightContain.register(spark)
    val idx = IncrementalDedup
      .shingleFps(corpus, "text", "doc_id", 4).select($"fp").distinct()
    val bytes = IncrementalDedup.buildBloom(idx, fpp = 0.01)
    def probeAll(b: Array[Byte]): Long = idx
      .withColumn("hit", call_function("bloom_might_contain", lit(b), $"fp"))
      .filter($"hit").count()
    val n0 = BloomMightContain.broadcastsCreated
    val total = idx.count()
    // a serve loop over ONE held sketch: one broadcast, not one per call
    assert(probeAll(bytes) == total && probeAll(bytes) == total)
    assert(BloomMightContain.broadcastsCreated == n0 + 1,
      "identical byte array must reuse its broadcast across constructions")
    // a re-serialized sketch (fresh array, same content) is a NEW filter
    // as far as the memo can safely know — it must broadcast again
    assert(probeAll(bytes.clone()) == total)
    assert(BloomMightContain.broadcastsCreated == n0 + 2,
      "a fresh byte array must get a fresh broadcast")
  }

  test("passage dedup stats are exact (bloom-pruned path == plain anti-join)") {
    val idx = IncrementalDedup.shingleFps(corpus, "text", "doc_id", 4)
    val got = IncrementalDedup
      .passageDedupStats(batch, idx, "text", "doc_id", shingleSize = 4)
      .orderBy($"id")
      .as[(Long, Long, Long, Double, Boolean)]
      .collect()

    // reference computation without any bloom: exact IN-set per shingle
    val idxSet = idx.select($"fp").distinct().as[Long].collect().toSet
    val expected = IncrementalDedup
      .shingleFps(batch, "text", "doc_id", 4)
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
      .map { case (id, fps) =>
        val dup = fps.count(f => idxSet.contains(f._2))
        val frac = BigDecimal(dup.toDouble / fps.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, fps.length.toLong, dup.toLong, frac, frac < 0.5)
      }
      .toSeq
      .sortBy(_._1)
    assert(got.toSeq == expected)

    val byId = got.map(r => r._1 -> r).toMap
    assert(!byId(10L)._5, "verbatim re-crawl must be dropped")
    assert(byId(10L)._4 == 1.0)
    assert(byId(11L)._5 && byId(11L)._3 == 0L, "fresh doc must be kept with zero dups")
    assert(byId(12L)._3 > 0L, "embedded corpus passage must be detected")
  }

  test("fp fingerprints match the portable md5 formula (oracle contract)") {
    val r = corpus
      .select(TF.portableHash(lit("alpha beta gamma delta")).as("fp"))
      .head()
      .getLong(0)
    // '0x' || substr(md5('alpha beta gamma delta'), 1, 15) in DuckDB
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha beta gamma delta".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    assert(r == java.lang.Long.parseLong(hex, 16))
  }

  test("bloom probe stays codegen-compatible and prunes scan-side") {
    BloomMightContain.register(spark)
    val idx = IncrementalDedup
      .shingleFps(corpus, "text", "doc_id", 4).select($"fp").distinct()
    val bytes = IncrementalDedup.buildBloom(idx, fpp = 0.01)
    val probed = IncrementalDedup
      .shingleFps(batch, "text", "doc_id", 4)
      .withColumn("maybe", call_function("bloom_might_contain", lit(bytes), $"fp"))
    // executes inside whole-stage codegen (would fall back to interpreted
    // eval on a doGenCode bug): the `*(n)` marker on the probing Project
    // is the codegen flag in executedPlan.toString
    val plan = probed.queryExecution.executedPlan.toString()
    assert(
      plan.linesIterator.exists(l => l.contains("bloom_might_contain") && l.trim.startsWith("*")),
      plan)
    // and the probe itself is correct on both branches
    val t = probed.filter($"maybe").count()
    val f = probed.filter(!$"maybe").count()
    assert(t > 0 && f > 0 && t + f == probed.count())
  }
}
