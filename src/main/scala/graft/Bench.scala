package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the harness captures only a bounded TAIL of this
    // process's output, and one full suite at WARN emits enough chatter
    // (HintErrorLogger, WindowExec, codegen) that round-12's captured
    // tail carried zero lines of signal. Queries that legitimately warn
    // are plan-locked in specs; the bench's job is the numbers.
    spark.sparkContext.setLogLevel("ERROR")
    // run in sorted-name order: queries is a Map (unordered), and several
    // families share staging caches (m6/m7/m8/m11 the DTW summaries,
    // d3/d5 the MinHash signatures) — whichever runs first pays the
    // shared cost, so a fixed order keeps per-query attribution
    // comparable across rounds
    // Dev-only: SPARK_GRAFT_ONLY=m6_dtw_mapping,m11_pipeline restricts the
    // run for targeted timing, in the GIVEN order (so staging-cache costs
    // can be attributed deliberately). The driver sets no env -> full
    // suite in sorted order.
    val ordered = sys.env.get("SPARK_GRAFT_ONLY").map(_.trim).filter(_.nonEmpty) match {
      case Some(names) =>
        val toks = names.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        val unknown = toks.filterNot(SparkEntry.queries.contains)
        if (unknown.nonEmpty) sys.error(
          s"SPARK_GRAFT_ONLY: unknown queries ${unknown.mkString(", ")}; " +
            s"known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
        toks.map(n => n -> SparkEntry.queries(n))
      case None => SparkEntry.queries.toSeq.sortBy(_._1)
    }
    // wall-clock budget (seconds, whole process): round 12's driver run
    // was timeout-killed with the artifact unwritten, because the old
    // Bench wrote its JSON once, after 2-3 complete passes. Under the
    // budget the bench degrades instead: it stops starting new queries,
    // emits whatever passes/queries completed, and flags the artifact
    // "truncated":true. Default sits comfortably under the driver's
    // observed timeout window; the artifact is ALSO rewritten after
    // every query (below), so even kill -9 leaves a parseable file.
    val budgetS = sys.env.get("SPARK_GRAFT_BENCH_BUDGET")
      .flatMap(s => scala.util.Try(s.trim.toDouble).toOption).getOrElse(1200.0)
    val benchT0 = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - benchT0) / 1e9
    def overBudget: Boolean = elapsedS > budgetS

    // a query that THROWS used to record only its elapsed-to-failure
    // time, which reads as a FAST query, not a broken one (the
    // steady-state min then propagates the lie). Record the exception
    // class per query; a nonempty "errors" list is the loud signal.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]

    // host load bracketing the run (1/5/15-min from /proc/loadavg):
    // four consecutive rounds had to caveat co-tenant load in prose
    // (same-commit swings up to 1494 s vs 85 s) — record it in the
    // artifact so cross-round comparisons can cite measured load
    // instead of guessing
    def loadavg(): Seq[Double] =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split("\\s+").take(3).toSeq.map(_.toDouble)
      catch { case _: Exception => Seq.empty }
    // fixed calibration probe: a corpus-independent, CPU-bound synthetic
    // aggregate of FIXED size (seeded hash over a fixed range, no
    // shuffle, whole-stage codegen) run first and last. Round-11's
    // closing artifact silently carried ~16% machine-state inflation
    // past the loadavg heuristic; with the probe in the artifact a
    // cross-round comparison can divide out machine speed mechanically
    // (query_sec / calib_sec is machine-normalized) instead of
    // adjudicating by re-probe. min of two consecutive runs so the
    // probe itself reports steady-state, not its own JIT warmup; one
    // UNTIMED action first so the START probe measures the machine,
    // not first-action session/codegen warmup (measured 1.94 s start
    // vs 0.19 s end without it — a 10× artifact of the session, which
    // would drown the machine-state signal start-vs-end exists to
    // catch).
    def calibrate(): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(0L, 200000000L, 1L)
          .selectExpr("sum(hash(id, 42)) as s", "count(1) as c")
          .collect()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    // ---- incremental artifact ------------------------------------------
    // Mutable pass state, rewritten to bench_full.json after EVERY query:
    // a timeout-kill at any point leaves a parseable artifact holding
    // every number measured so far (round-12's driver run got rc=124 and
    // produced NOTHING because the old code wrote once at the very end).
    val cold = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val warm = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val extra = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var passesDone = 0
    var truncated = false
    var calibStart = -1.0
    var calibEnd = -1.0
    var loadStart: Seq[Double] = Seq.empty
    var loadEnd: Seq[Double] = Seq.empty
    var highLoad = false

    def fmt(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    def errJson(cap: Int): String = errors.take(cap)
      .map { case (q, c) => s"""{"query":"$q","class":"$c"}""" }
      .mkString("[", ",", "]")

    /** The FULL artifact (the round-1 contract line, plus the fields
      * added since): per-query steady map = min across completed passes,
      * restricted to queries the cold pass has reached so far. */
    def fullJson(done: Boolean): String = {
      val steady = cold.toSeq.map { case (k, v) =>
        k -> math.min(
          math.min(v, warm.getOrElse(k, Double.MaxValue)),
          extra.getOrElse(k, Double.MaxValue))
      }
      val total = steady.map(_._2).sum
      val coldTotal = cold.valuesIterator.sum
      // verifier tier (Gates.verifierTier): exact quadratic forms kept to
      // gate their deployable twins — reported separately so the headline
      // can be read as deployment plans vs verification-only plans
      val deployTotal = steady.filterNot(q => Gates.verifierTier(q._1)).map(_._2).sum
      val verifierJson = Gates.verifierTier.toSeq.sorted.mkString("[\"", "\",\"", "\"]")
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(steady)},""" +
        s""""cold_value":$coldTotal,"cold_queries":${fmt(cold.toSeq)},"passes":$passesDone,""" +
        s""""truncated":${truncated || !done},"errors":${errJson(Int.MaxValue)},""" +
        s""""high_load":$highLoad,"calib_start_s":$calibStart,"calib_end_s":$calibEnd,""" +
        s""""deploy_value":$deployTotal,"verifier_tier":$verifierJson,""" +
        s""""budget_s":$budgetS,"elapsed_s":$elapsedS,""" +
        s""""loadavg_start":${loadStart.mkString("[", ",", "]")},""" +
        s""""loadavg_end":${loadEnd.mkString("[", ",", "]")},"sf":"$sfDir"}"""
    }

    /** A COMPACT artifact (< ~1 KB) that survives a bounded tail capture:
      * every BENCH_rNN.json since round 1 has "parsed": null because the
      * harness keeps only the last 2000 characters of output and the full
      * 180-query line is ~8 KB — its head is always cut mid-line. The
      * scalar headline fields plus a pointer to the on-disk full map fit
      * comfortably; per-query data lives in bench_full.json (and in the
      * full line printed immediately above the compact one). */
    def compactJson(done: Boolean): String = {
      val steady = cold.toSeq.map { case (k, v) =>
        k -> math.min(
          math.min(v, warm.getOrElse(k, Double.MaxValue)),
          extra.getOrElse(k, Double.MaxValue))
      }
      val total = steady.map(_._2).sum
      val deployTotal = steady.filterNot(q => Gates.verifierTier(q._1)).map(_._2).sum
      s"""{"metric":"total","value":$total,"unit":"sec","queries":{},""" +
        s""""n_queries":${steady.size},"queries_full":"bench_full.json",""" +
        s""""cold_value":${cold.valuesIterator.sum},"deploy_value":$deployTotal,""" +
        s""""passes":$passesDone,"truncated":${truncated || !done},""" +
        s""""errors":${errJson(10)},"n_errors":${errors.size},""" +
        s""""high_load":$highLoad,"calib_start_s":$calibStart,"calib_end_s":$calibEnd,""" +
        s""""loadavg_start":${loadStart.mkString("[", ",", "]")},""" +
        s""""loadavg_end":${loadEnd.mkString("[", ",", "]")},"sf":"$sfDir"}"""
    }

    // stdout capture can truncate a 180-query line; persist the complete
    // machine-readable map alongside so every per-query number survives
    // the round. Rewritten after every query (a few KB — negligible).
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json"))
    def writeArtifact(done: Boolean): Unit =
      try java.nio.file.Files.write(outPath, (fullJson(done) + "\n").getBytes("UTF-8"))
      catch { case e: Exception => System.err.println(s"bench_full.json write failed: $e") }

    /** One pass; stops early (and flags truncated) when the wall-clock
      * budget is exhausted. Returns false when the budget cut it short. */
    def pass(into: scala.collection.mutable.LinkedHashMap[String, Double]): Boolean = {
      val it = ordered.iterator
      while (it.hasNext && !truncated) {
        val (name, fn) = it.next()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case t: Throwable => errors(name) = t.getClass.getName }
        into(name) = (System.nanoTime() - t0) / 1e9
        if (overBudget) truncated = true
        writeArtifact(done = false)
      }
      !truncated
    }

    // Two passes, headline = per-query min. One cold pass conflates the
    // engine with the machine: JIT/codegen warmup, cold page cache, and
    // any concurrent load on the host land on whichever query runs under
    // them (round-3's driver run measured 1494 s for a suite that timed
    // 85 s unloaded — same commit). The min is the steady-state number a
    // production deployment sees (indexes built once, code JIT-hot); the
    // cold pass is still reported for build-cost visibility.
    spark.range(0L, 1000000L).selectExpr("sum(hash(id, 42))").collect()
    loadStart = loadavg()
    calibStart = calibrate()
    var ok = pass(cold)
    passesDone = 1
    // emit a parseable line after EVERY pass: if the process is killed in
    // a later pass, the bounded tail may still carry this one
    writeArtifact(done = false)
    println(compactJson(done = false))
    if (ok) {
      ok = pass(warm)
      passesDone = 2
      writeArtifact(done = false)
      println(compactJson(done = false))
    }
    // high-load disambiguation: four rounds of verdicts had to hand-
    // reason "uniform movement = co-tenant drift" from the loadavg
    // fields. Make the call mechanical instead — when the host is
    // visibly loaded, spend one more warm pass and keep the min, and
    // flag the artifact either way so cross-round regression reads are
    // (load-flagged) data, not judgment.
    // ANY loadavg component > 4 triggers the third pass: round-11's
    // inflated closing run had a 1-min average of 4.0 (under the old
    // head-only check) while the 15-min average was 6.66 — a
    // recently-busy box shows up in the longer components first
    highLoad = loadStart.exists(_ > 4.0)
    if (ok && highLoad) {
      pass(extra)
      passesDone = 3
    }
    // loadavg BEFORE the end calibration probe: the probe itself is two
    // CPU-saturating 200M-row runs, so sampling after it would pollute
    // exactly the machine-state signal loadavg_end exists to carry
    loadEnd = loadavg()
    calibEnd = calibrate()
    // the FULL contract line (complete per-query map), then the compact
    // line LAST so a bounded tail capture ends on a complete JSON object
    println(fullJson(done = true))
    writeArtifact(done = true)
    println(compactJson(done = true))
    spark.stop()
  }
}
