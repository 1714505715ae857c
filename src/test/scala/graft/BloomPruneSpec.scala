package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomPrune

class BloomPruneSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("no false negatives: every true member survives the prune") {
    val small = spark.range(0, 1000, 7).toDF("k") // members: multiples of 7
    val big = spark.range(0, 1000).toDF("k")
    val bloom = BloomPrune.buildSized(small, col("k"))
    val pruned = BloomPrune.prune(big, col("k"), bloom).as[Long].collect().toSet
    val members = (0L until 1000L by 7).toSet
    assert(members.subsetOf(pruned), s"missing members: ${members -- pruned}")
  }

  test("false-positive rate sits near the 10-bits/key design point") {
    val small = spark.range(0, 100000, 10).toDF("k") // 10k members
    val big = spark.range(0, 100000).toDF("k") // 90k non-members
    val bloom = BloomPrune.buildSized(small, col("k"))
    val prunedN = BloomPrune.prune(big, col("k"), bloom).count()
    val fp = (prunedN - 10000).toDouble / 90000
    // ~0.9% theoretical at k=6, 10 bits/key; allow 3x headroom
    assert(fp < 0.03, s"false-positive rate $fp")
    assert(prunedN >= 10000, "lost members")
  }

  test("prune + join equals the plain join exactly; the probe stays at the scan") {
    val small = spark.range(0, 5000, 13).toDF("k")
    val big = spark.range(0, 5000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val bloom = BloomPrune.buildSized(small, col("k"))
    val prunedJoin = BloomPrune.prune(big, col("k"), bloom)
      .join(small, Seq("k")).orderBy("k").collect().map(_.toSeq)
    val plainJoin = big.join(small, Seq("k")).orderBy("k").collect().map(_.toSeq)
    assert(prunedJoin.sameElements(plainJoin))
    // the membership probe is a Filter over the scan — no exchange, no
    // join node introduced by the prune itself
    val plan = BloomPrune.prune(big, col("k"), bloom)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("int-typed build probed with a long-typed key keeps every member") {
    // xxhash64 hashes INT and BIGINT differently; without width
    // normalization the same VALUE computes different bit positions and
    // true members get filtered before the join — silent wrong results
    val smallInt = spark.range(0, 1000, 7)
      .select(col("id").cast("int").as("k")) // int-inferred schema shape
    val bigLong = spark.range(0, 1000).toDF("k") // bigint facts
    val bloom = BloomPrune.buildSized(smallInt, col("k"))
    val pruned = BloomPrune.prune(bigLong, col("k"), bloom).as[Long].collect().toSet
    val members = (0L until 1000L by 7).toSet
    assert(members.subsetOf(pruned),
      s"type-mismatched probe lost members: ${members -- pruned}")
  }

  test("decimal(p,0) build probed with a long-typed key keeps every member") {
    // the JDBC/Hive shape: the dim's key infers as decimal(20,0) while
    // the fact side is bigint — same value, different xxhash64 digest
    // without normalization, so every true member would be lost
    val smallDec = spark.range(0, 1000, 7)
      .select(col("id").cast("decimal(20,0)").as("k"))
    val bigLong = spark.range(0, 1000).toDF("k")
    val bloom = BloomPrune.buildSized(smallDec, col("k"))
    val pruned = BloomPrune.prune(bigLong, col("k"), bloom).as[Long].collect().toSet
    val members = (0L until 1000L by 7).toSet
    assert(members.subsetOf(pruned),
      s"decimal-keyed build lost members: ${members -- pruned}")
  }

  test("broadcast probe admits exactly the literal probe's rows") {
    val small = spark.range(0, 20000, 11).toDF("k")
    val big = spark.range(0, 20000).toDF("k")
    val bloom = BloomPrune.buildSized(small, col("k"))
    val lit = BloomPrune.prune(big, col("k"), bloom)
      .as[Long].collect().sorted.toSeq
    val bc = BloomPrune.pruneBroadcast(big, col("k"), bloom)
      .as[Long].collect().sorted.toSeq
    assert(lit == bc, "literal and broadcast probes disagree")
  }
}
