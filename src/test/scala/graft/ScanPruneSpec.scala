package graft

import graft.functions.{Retrieval, ScanPrune}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Literal scan pruning: the chunked In builder selects exactly the
  * requested keys, reaches the parquet reader as pushed OR-of-eq chunks
  * (never the degenerate min/max range of one giant In), survives
  * multi-thousand-value sets without blowing the reader's recursion,
  * and above the literal cap the term serve paths fall back to a
  * codegen'd bloom pre-filter instead of giving up pruning. */
class ScanPruneSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("inLiteral selects exactly the requested keys (chunked == plain isin)") {
    val df = (0L until 5000L).toDF("fp")
    val wanted = (0L until 3333L).map(i => i * 37 % 5000).distinct
    val got = df.filter(ScanPrune.inLiteral($"fp", wanted))
      .as[Long].collect().toSet
    assert(got == wanted.toSet)
    val e = intercept[IllegalArgumentException] {
      ScanPrune.inLiteral($"fp", Seq.empty)
    }
    assert(e.getMessage.contains("at least one value"))
  }

  test("a multi-thousand-value literal is pushed to the parquet scan and executes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scanprune").toString
    // fp-clustered layout: sorted within files, the pushdown target shape
    (0L until 20000L).toDF("fp")
      .repartition($"fp").sortWithinPartitions($"fp")
      .write.parquet(s"$dir/t")
    ScanPrune.ensureEqPushdown(spark)
    val wanted = (0L until 2500L).map(i => i * 7 % 20000).distinct
    val probed = spark.read.parquet(s"$dir/t").filter(ScanPrune.inLiteral($"fp", wanted))
    val p = probed.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [") && p.contains("In(fp"), p)
    // 2500 values = 25 chunks: each stays under the session threshold
    // so the reader sees OR-of-eq, not a min/max range — and the
    // per-chunk depth keeps parquet's recursive evaluation (which
    // overflowed the task stack at 1000-value chunks) well bounded
    assert(probed.as[Long].collect().toSet == wanted.toSet)
  }

  test("an exactly-eqChunk-sized literal still row-group-prunes (the threshold boundary)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scanprune_edge").toString
    // 4 range-disjoint files (session shuffle.partitions = 4), one row
    // group each: [0,5000) [5000,10000) [10000,15000) [15000,20000)
    (0L until 20000L).toDF("fp")
      .repartitionByRange($"fp").sortWithinPartitions($"fp")
      .write.parquet(s"$dir/t")
    ScanPrune.ensureEqPushdown(spark)
    assert(spark.conf.get("spark.sql.parquet.pushdown.inFilterThreshold").toInt
      > ScanPrune.eqChunk,
      "a full chunk must sit strictly under the engine threshold")
    // ONE full chunk whose values span the whole domain: under OR-of-eq
    // translation only the two files holding the values survive; under
    // the min/max-range degradation this test exists to catch, the
    // range [0, 19999] keeps every row group alive
    val wanted = (0L until 99L) :+ 19999L
    assert(wanted.length == ScanPrune.eqChunk)
    val probed = spark.read.parquet(s"$dir/t").filter(ScanPrune.inLiteral($"fp", wanted))
    val scan = probed.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(probed.as[Long].collect().toSet == wanted.toSet)
    val scanned = scan.metrics("numOutputRows").value
    assert(scanned <= 10000L,
      s"scan emitted $scanned rows — the boundary chunk degraded to a range filter")
  }

  test("repeated serve constructions over an identical local phrase frame hit the prune memo") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scanprune_memo").toString
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta")).toDF("doc_id", "text")
    Retrieval.buildPositionalIndex(docs, "text", "doc_id", dir)
    val phrases = Seq((1L, "beta gamma")).toDF("phrase_id", "phrase")
    def serve() = Retrieval.phraseSearchFromIndex(spark, dir, phrases, "phrase_id", "phrase")
      .select($"phrase_id", $"doc_id", $"n_occurrences")
      .as[(Long, Long, Long)].collect().toSet
    val first = serve()
    val hits0 = Retrieval.pruneMemoHits
    assert(serve() == first, "memoized construction must serve identical results")
    assert(Retrieval.pruneMemoHits > hits0,
      "an identical driver-local phrase frame must hit the memo")
    // a FILE-backed phrase frame must NOT memoize: its plan stays
    // identical when the file content changes, and a stale vocabulary
    // would silently drop matching postings
    val phrasePath = s"$dir/phrases"
    phrases.write.parquet(phrasePath)
    val fromFile = spark.read.parquet(phrasePath)
    val hits1 = Retrieval.pruneMemoHits
    Retrieval.phraseSearchFromIndex(spark, dir, fromFile, "phrase_id", "phrase").count()
    Retrieval.phraseSearchFromIndex(spark, dir, fromFile, "phrase_id", "phrase").count()
    assert(Retrieval.pruneMemoHits == hits1, "file-backed frames must bypass the memo")
  }

  test("a stopped session's prune-memo entries are swept at the next insert") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scanprune_sweep").toString
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta")).toDF("doc_id", "text")
    Retrieval.buildPositionalIndex(docs, "text", "doc_id", dir)
    // a second session (shared context — the suite JVM can't hold an
    // independently stoppable one, hence the injectable predicate)
    val s2 = spark.newSession()
    val ph2 = s2.createDataFrame(Seq((1L, "beta gamma"))).toDF("phrase_id", "phrase")
    Retrieval.phraseSearchFromIndex(s2, dir, ph2, "phrase_id", "phrase").count()
    assert(Retrieval.pruneMemoHolds(s2), "s2's serve must have memoized")
    val stopped0 = Retrieval.pruneMemoStopped
    try {
      Retrieval.pruneMemoStopped = _ eq s2 // "s2's context has stopped"
      // any next memoizable insert triggers the sweep
      val phMain = Seq((9L, "gamma delta")).toDF("phrase_id", "phrase")
      Retrieval.phraseSearchFromIndex(spark, dir, phMain, "phrase_id", "phrase").count()
      assert(!Retrieval.pruneMemoHolds(s2),
        "entries pinned to a stopped session must be swept at insert")
      assert(Retrieval.pruneMemoHolds(spark), "live-session entries survive the sweep")
    } finally Retrieval.pruneMemoStopped = stopped0
  }

  test("over the literal cap the phrase serve path engages the bloom pre-filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scanprune_bloom").toString
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta"),
      (2L, "delta epsilon zeta"),
      (3L, "beta gamma eta")).toDF("doc_id", "text")
    Retrieval.buildPositionalIndex(docs, "text", "doc_id", dir)
    // maxTermPushdown+1 distinct phrase terms: two real phrases plus
    // filler vocabulary that never matches — a 10⁵-sentence decontam
    // sweep in miniature
    val phrases = (Seq((1L, "alpha beta"), (2L, "beta gamma")) ++
      (0 until Retrieval.maxTermPushdown).map(i => (100L + i, f"filler$i%05d")))
      .toDF("phrase_id", "phrase")
    val served = Retrieval.phraseSearchFromIndex(
      spark, dir, phrases, "phrase_id", "phrase")
    val p = served.queryExecution.executedPlan.toString
    assert(p.contains("xxhash64"), s"over-cap path did not engage the bloom:\n$p")
    assert(!p.contains("In(term"), "over-cap path must not build a giant literal")
    val got = served.select($"phrase_id", $"doc_id", $"n_occurrences")
      .as[(Long, Long, Long)].collect().toSet
    // identical to the direct (unpruned) audit — the bloom has no false
    // negatives, and its false positives die in the anchor fold
    val want = Retrieval.phraseSearch(
      docs, "text", "doc_id", phrases, "phrase_id", "phrase")
      .select($"phrase_id", $"doc_id", $"n_occurrences")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.map(_._1) == Set(1L, 2L))
  }
}
