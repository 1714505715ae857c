package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression locks: the scale properties the engine
  * promises (pushdown, pruning, broadcasts, no accidental cartesians)
  * asserted against the executed plans of registered queries. */
class PlanSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q1: filter pushed to parquet and columns pruned") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), "column pruning lost: reads unneeded columns")
  }

  test("q5: top-k becomes TakeOrderedAndProject, not global sort") {
    val p = plan("q5_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("m5: per-entity tables broadcast; no cartesian product") {
    val p = plan("m5_corr_mapping")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("m3: lag scan is window + partial-aggregated corr, no join of exploded table") {
    val p = plan("m3_lag_corr")
    assert(p.contains("Window"), p)
    assert(p.contains("partial_corr") || p.contains("HashAggregate"), p)
    // the old formulation self-joined after the lag explode
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("d7: LSH candidates come from an equi-join, not a cross join") {
    val p = plan("d7_embed_lsh")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("d14: banded LSH candidates come from an equi-join on (band, bucket)") {
    val p = plan("d14_embed_lsh_bands")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("d62: ANN bitext plans no cross join — unlike the d61 verifier") {
    // the deployable bitext artifact: candidates are a banded equi-join
    // with NEITHER language partition broadcast (both are corpus-sized
    // at real scale), margins ride the candidate set
    val p = plan("d62_bitext_ann")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q23: describe is ONE aggregate pass (no per-column re-scan)") {
    val p = plan("q23_describe")
    // one scan of lineitem feeding one aggregate; a per-column union of
    // aggregates would show three scans
    assert(p.split("Scan parquet").length - 1 == 1, p)
  }

  test("d24: gopher rules are one pruned scan, no shuffle") {
    val p = plan("d24_gopher_quality")
    assert(p.split("Scan parquet").length - 1 == 1, p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "documents scan must prune to (doc_id, text): " + p)
    assert(!p.contains("Exchange"), "per-row metrics must not shuffle: " + p)
  }

  test("d28: vocab stats aggregate partially before the shuffle, pruned scans only") {
    val p = plan("d28_vocab_stats")
    // the distributed rank caches the counted vocab; the cached plan's
    // embedded parquet scan reprints per reference, so assert every
    // occurrence is the PRUNED scan and the rank reads the cache
    val scans = p.split("Scan parquet").length - 1
    val pruned = p.split("ReadSchema: struct<doc_id:bigint,text:string>").length - 1
    assert(scans == pruned, s"unpruned documents scan present ($scans vs $pruned):\n$p")
    assert(p.contains("InMemoryTableScan"), p)
    // the global rank must NOT be a single-partition window
    assert(!p.contains("Window [row_number() windowspecdefinition(n_occurrences"), p)
    // token counts combine map-side: HashAggregate below the Exchange
    assert(p.contains("HashAggregate"), p)
  }

  test("temporal family: one exchange each; d51 quantization never shuffles") {
    // m27 OHLC: one partial-aggregated hash agg — no window, no join-back
    val ohlc = plan("m27_ohlc")
    assert(!ohlc.contains("Window"), "OHLC must not window: " + ohlc)
    assert(!ohlc.contains("SortMergeJoin"), ohlc)
    // m31 trend: moment-based OLS is ONE aggregate (partial + final)
    val trend = plan("m31_trend")
    assert(!trend.contains("Window") && !trend.contains("Join"), trend)
    // m32 pair screen: top-k is TakeOrderedAndProject, join is an
    // equi-join on period (never cartesian)
    val pair = plan("m32_pair_corr")
    assert(pair.contains("TakeOrderedAndProject"), pair)
    assert(!pair.contains("CartesianProduct") && !pair.contains("BroadcastNestedLoopJoin"), pair)
    // d51 int8 quantization: pure scan-stage arithmetic, zero Exchange
    val quant = plan("d51_int8_quant")
    assert(!quant.contains("Exchange"), "per-row quantization must not shuffle: " + quant)
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // the runtime-filter lever for 100 TB fact joins: a selective filter
    // on the dimension side injects a bloom_filter_agg whose result
    // pre-filters the fact scan before the shuffle. Thresholds are
    // sized for clusters; lower them to observe the plan shape locally.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.sources.Tables.load(spark, dir, "lineitem")
      val ord = graft.sources.Tables.load(spark, dir, "orders")
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val p = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(p.contains("bloom_filter_agg"), s"runtime bloom filter not injected:\n${p.take(1500)}")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("d57: span dedup explodes exactly once (grams); the text rebuild stays in-row") {
    val p = plan("d57_span_dedup_apply")
    // TWO Generates = the gram posexplode once per consumer (the
    // first-occurrence aggregate and the join-back) — recomputing grams
    // is the memory-safe choice at corpus scale. A THIRD would mean the
    // token rebuild regressed to the explode + anti-join + collect_list
    // shape instead of the in-row indexed filter.
    assert(p.split("Generate").length - 1 == 2, p)
    // first-occurrence min(struct) must partial-aggregate map-side
    assert(p.contains("partial_min") || p.contains("partial_count"), p)
  }

  test("q43: the MG sketch runs as a partial-buffered object aggregate") {
    val p = plan("q43_heavy_hitters")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
  }

  test("d59: the vocab-side joins broadcast; pair dots partial-aggregate") {
    val p = plan("d59_dimsum_terms")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("d70: the phrase side broadcasts against positional postings; no nested loop") {
    val p = plan("d70_phrase")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the postings side is never broadcast: the only broadcast
    // exchanges feed from the 5-row phrase table's lineage, so a
    // SortMergeJoin of postings against postings must not appear
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("m39: SAX candidates come from a word equi-join, never a nested loop") {
    val p = plan("m39_sax_screen")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("word"), p)
  }

  test("index serve paths plant the query/phrase vocabulary as a pushed scan filter") {
    // the stored postings are term-clustered so parquet min/max can
    // prune row groups — but only a LITERAL predicate reaches the scan
    // (a broadcast join never does), so the serve paths must plant the
    // driver-collected term set as an In filter
    import graft.functions.Retrieval
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta delta epsilon zeta"))
      .toDF("doc_id", "text")
    val proot = java.nio.file.Files.createTempDirectory("graft_plan_pidx").toString
    Retrieval.buildPositionalIndex(docs, "text", "doc_id", proot)
    val ph = Seq((1L, "beta delta")).toDF("phrase_id", "phrase")
    val pp = Retrieval.phraseSearchFromIndex(spark, proot, ph, "phrase_id", "phrase")
      .queryExecution.executedPlan.toString
    assert(pp.contains("In(term") && pp.contains("PushedFilters: ["), pp)
    val broot = java.nio.file.Files.createTempDirectory("graft_plan_bidx").toString
    Retrieval.buildIndex(docs, "text", "doc_id", broot)
    val qs = Seq((1L, "beta zeta")).toDF("query_id", "query")
    val bp = Retrieval.bm25FromIndex(spark, broot, qs, "query_id", "query", 5)
      .queryExecution.executedPlan.toString
    assert(bp.contains("In(term") && bp.contains("PushedFilters: ["), bp)
    // index-served snippets split the postings by ROLE: the hit-finding
    // scan takes the phrase-vocabulary pushdown, while the window
    // reassembly needs every term of the hit docs, so at least one
    // postings scan must stay unfiltered
    val sp = Retrieval.snippetsFromIndex(spark, proot, ph, "phrase_id", "phrase", 2)
      .queryExecution.executedPlan.toString
    val snScans = sp.split("Scan parquet").length - 1
    val snPruned = sp.split(java.util.regex.Pattern.quote("In(term")).length - 1
    assert(snScans >= 2 && snPruned >= 1 && snPruned < snScans,
      s"scans=$snScans pruned=$snPruned\n$sp")
  }

  test("m32: pair aggregate runs above a by-pair exchange of RAW rows, not duplicated partials") {
    // the r13 shape: the exchange feeding the pair corr aggregate
    // repartitions the JOINED rows by (key_a, key_b); the partial+final
    // HashAggregate pair sits ABOVE it. The old shape ran the partial
    // aggregate in the join's map stage, duplicating per-pair corr state
    // across every map partition (M x |pairs| partial rows — measured
    // 249 MB shuffled at sf0.1 for a top-50 answer).
    val p = plan("m32_pair_corr")
    assert(p.contains("REPARTITION_BY_COL"), p)
    // no partial_corr may appear BELOW the repartition exchange: the
    // text between the exchange line and the end (deeper plan) must be
    // corr-free
    val below = p.substring(p.indexOf("REPARTITION_BY_COL"))
    assert(!below.contains("partial_corr"), s"partial corr below the pair exchange:\n$p")
  }

  test("no registered query plans a CartesianProduct") {
    // BroadcastNestedLoopJoin is allowed only where intentional (d6 brute
    // force, single-row stat crosses in m9/q8)
    SparkEntry.queries.keys.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
    }
  }
}
