package graft

import graft.core.{MappingConfig, PeriodUnit, SeriesTable}
import graft.operators.{Comparison, Pipeline}
import graft.streaming.EventsStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val cfg = MappingConfig(periodUnit = PeriodUnit.Month, maxLag = 3)

  /** Simple archetype: rev(t) = 10% of txn(t-1). */
  private def seriesPair(nKeys: Int, nMonths: Int): (DataFrame, DataFrame) = {
    val rows = for {
      k <- 1 to nKeys
      m <- 1 to nMonths
    } yield (s"K$k", f"2024-$m%02d", 100.0 + 13 * ((m * 3 + k) % 7))
    val t1 = SeriesTable.canonicalize(
      rows.toDF("k", "t", "v"), "k", "t", "v", PeriodUnit.Month)
    val t2 = SeriesTable.canonicalize(
      rows.map { case (k, t, v) =>
        (k, f"2024-${t.substring(5).toInt + 1}%02d", v * 0.1)
      }.toDF("k", "t", "v"), "k", "t", "v", PeriodUnit.Month)
    (t1, t2)
  }

  test("pipeline reuses stored lags for correlation-recommended keys") {
    val (t1, t2) = seriesPair(3, 6)
    val recs = Seq(
      ("K1", "Correlation", 1),
      ("K2", "Either (prefer Correlation for simplicity)", 2)
    ).toDF("key", "recommended_method", "optimal_lag")
    val out = Pipeline.run(t1, t2, recs, cfg, "run_1")
    val byKey = out.groupBy("key").agg(
      first("method").as("m"), first("lag_offset").as("lag")).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.get(2))).toMap
    assert(byKey("K1") == ("correlation", 1))
    assert(byKey("K2") == ("correlation", 2)) // stored lag 2 reused verbatim
    // K3 has no recommendation -> default lag 1
    assert(byKey("K3") == ("correlation", 1))
    assert(out.columns.contains("pipeline_run_id"))
  }

  test("pipeline routes DTW-recommended keys through dtw") {
    val (t1, t2) = seriesPair(2, 6)
    val recs = Seq(("K1", "DTW", 0)).toDF("key", "recommended_method", "optimal_lag")
    val out = Pipeline.run(t1, t2, recs, cfg, "run_2")
    val methods = out.select("key", "method").distinct().as[(String, String)].collect().toMap
    assert(methods("K1") == "dtw")
    assert(methods("K2") == "correlation") // default path
  }

  test("incremental slice filters the period range") {
    val (t1, _) = seriesPair(2, 6)
    val sliced = Pipeline.incrementalSlice(t1, "2024-02-01", "2024-03-31")
    val periods = sliced.select("period").distinct().as[java.sql.Date].collect().map(_.toString)
    assert(periods.toSet == Set("2024-02-01", "2024-03-01"))
  }

  test("partitioned write + external table + monitoring view") {
    val (t1, t2) = seriesPair(2, 5)
    val recs = Seq(("K1", "Correlation", 1)).toDF("key", "recommended_method", "optimal_lag")
    val out = Pipeline.run(t1, t2, recs, cfg, "run_3")
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    Pipeline.writePartitioned(out, s"$dir/mapping")
    // partition pruning layout: one directory per time1 value
    val parts = new java.io.File(s"$dir/mapping").listFiles().map(_.getName).filter(_.startsWith("time1="))
    assert(parts.nonEmpty)
    Pipeline.registerExternalTable(spark, s"$dir/mapping", "mapping_test")
    val viaSql = spark.sql("SELECT COUNT(*) FROM mapping_test").as[Long].head()
    assert(viaSql == out.count())
    val mon = spark.sql("SELECT * FROM mapping_test_monitor")
    assert(mon.columns.toSeq == Seq("method", "time1", "n_mappings", "n_keys"))
    assert(mon.count() > 0)
    spark.sql("DROP TABLE IF EXISTS mapping_test")
  }

  test("registerExternalTable handles database-qualified names") {
    val (t1, t2) = seriesPair(2, 5)
    val recs = Seq(("K1", "Correlation", 1)).toDF("key", "recommended_method", "optimal_lag")
    val out = Pipeline.run(t1, t2, recs, cfg, "run_q")
    val dir = java.nio.file.Files.createTempDirectory("graft_qual").toString
    Pipeline.writePartitioned(out, s"$dir/m")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_testdb")
    try {
      Pipeline.registerExternalTable(spark, s"$dir/m", "graft_testdb.mapping_q")
      assert(spark.sql("SELECT COUNT(*) FROM graft_testdb.mapping_q").as[Long].head() == out.count())
      // the monitor view carries the full qualified name flattened, so
      // same-named tables in different databases keep distinct views
      assert(spark.sql("SELECT COUNT(*) FROM graft_testdb_mapping_q_monitor").as[Long].head() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_testdb.mapping_q")
      spark.sql("DROP DATABASE IF EXISTS graft_testdb")
    }
  }

  test("end-to-end: train recommendations, run pipeline, QA passes") {
    val (t1, t2) = seriesPair(4, 8)
    val merged = SeriesTable.merge(t1, t2)
    val recs = Comparison.recommendationsFromMerged(merged, cfg)
      .select(col("key"), col("recommended_method"), col("optimal_lag"))
    val out = Pipeline.run(t1, t2, recs, cfg, "run_4")
    assert(out.count() > 0)
    val qa = graft.operators.QualityChecks.check(
      out.select(col("key"), col("time1"), col("value1"), col("time2"), col("value2"),
        col("lag_offset")), t1).head()
    assert(qa.getAs[String]("coverage_status") == "PASS")
    assert(qa.getAs[String]("duplicate_status") == "PASS")
    assert(qa.getAs[String]("temporal_status") == "PASS")
  }

  test("sla report after a pipeline run: PASS rows and the summary verdict") {
    val (t1, t2) = seriesPair(3, 6)
    val recs = Seq(("K1", "Correlation", 1)).toDF("key", "recommended_method", "optimal_lag")
    val out = Pipeline.run(t1, t2, recs, cfg, "run_sla")
    val rows = graft.operators.Sla.report(out, t1, durationSec = 12.5)
      .collect().map(r => r.getAs[String]("check") -> r).toMap
    assert(rows.keySet == Set("coverage_pct", "duration_sec", "total_mappings", "sla_met"))
    assert(rows("coverage_pct").getAs[String]("status") == "PASS") // all keys map (default lag)
    assert(rows("duration_sec").getAs[String]("status") == "PASS")
    assert(rows("duration_sec").getAs[Double]("metric_value") == 12.5)
    assert(rows("total_mappings").getAs[String]("severity") == "CRITICAL")
    assert(rows("sla_met").getAs[String]("status") == "PASS")
  }

  test("sla report alerts on low coverage, long duration, empty output") {
    val (t1, t2) = seriesPair(2, 6)
    val empty = Pipeline.run(t1, t2,
      Seq.empty[(String, String, Int)].toDF("key", "recommended_method", "optimal_lag"),
      cfg, "run_sla2").filter(lit(false))
    val rows = graft.operators.Sla.report(empty, t1, durationSec = 3600.0)
      .collect().map(r => r.getAs[String]("check") -> r.getAs[String]("status")).toMap
    assert(rows("coverage_pct") == "ALERT")
    assert(rows("duration_sec") == "ALERT")
    assert(rows("total_mappings") == "ALERT")
    assert(rows("sla_met") == "ALERT")
  }

  test("incremental run: slice -> temp write -> partition-pruned read-back") {
    val (t1, t2) = seriesPair(3, 6)
    val recs = Seq(("K1", "Correlation", 1)).toDF("key", "recommended_method", "optimal_lag")
    val dir = java.nio.file.Files.createTempDirectory("graft_incr").toString
    val back = Pipeline.incrementalRun(
      t1, t2, recs, cfg, "run_incr", "2024-02-01", "2024-04-30", s"$dir/tmp")
    // read-back rows are exactly the slice
    val times = back.select("time1").distinct().as[String].collect()
    assert(times.nonEmpty && times.forall(t => t >= "2024-02-01" && t <= "2024-04-30"))
    // and the scan PRUNES partitions: the executed plan carries a
    // partition filter on time1 (no full-table file read)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("time1"), plan)
    // prune actually drops partitions: the temp dir has partitions outside
    // the slice window only if the unsliced run would have written them;
    // all written partitions come from the slice, so every directory is in range
    val parts = new java.io.File(s"$dir/tmp").listFiles()
      .map(_.getName).filter(_.startsWith("time1="))
    assert(parts.forall { p => val d = p.stripPrefix("time1="); d >= "2024-02-01" && d <= "2024-04-30" })
  }

  test("broadcastSummaries=false plans no forced broadcast; results unchanged") {
    val (t1, t2) = seriesPair(3, 6)
    val recs = Seq(
      ("K1", "Correlation", 1),
      ("K2", "DTW", 0)
    ).toDF("key", "recommended_method", "optimal_lag")
    val forced = Pipeline.run(t1, t2, recs, cfg, "run_bc")
    val gated = Pipeline.run(t1, t2, recs, cfg.copy(broadcastSummaries = false), "run_bc")
    assert(forced.queryExecution.analyzed.toString.contains("ResolvedHint"))
    assert(!gated.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "broadcastSummaries=false must leave join strategy to Catalyst/AQE")
    val a = forced.drop("pipeline_run_id").collect().map(_.toString).sorted
    val b = gated.drop("pipeline_run_id").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("precomputed DTW summaries reproduce the in-run DTW segment exactly") {
    val (t1, t2) = seriesPair(3, 6)
    val recs = Seq(
      ("K1", "DTW", 0),
      ("K2", "Correlation", 1)
    ).toDF("key", "recommended_method", "optimal_lag")
    val merged = SeriesTable.merge(t1, t2)
    val summaries = graft.operators.DtwMapping.summarize(merged, cfg).toDF()
    val direct = Pipeline.run(t1, t2, recs, cfg, "run_pre")
    val reused = Pipeline.run(t1, t2, recs, cfg, "run_pre", dtwSummaries = Some(summaries))
    val a = direct.collect().map(_.toString).sorted
    val b = reused.collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("productionRun: validate -> map -> save -> QA -> SLA -> metadata, end to end") {
    val (t1, t2) = seriesPair(4, 8)
    val merged = SeriesTable.merge(t1, t2)
    val recs = Comparison.recommendationsFromMerged(merged, cfg)
      .select(col("key"), col("recommended_method"), col("optimal_lag"))
    val dir = java.nio.file.Files.createTempDirectory("graft_prod").toString
    val res = Pipeline.productionRun(
      spark, t1, t2, recs, cfg, "r42", dir, "prod_mappings_test")
    assert(res.slaMet, "sla must pass on the archetype data")
    assert(res.mapping.count() > 0)
    // persisted partition layout + registered table agree with the result
    assert(new java.io.File(res.outputPath).listFiles().exists(_.getName.startsWith("time1=")))
    assert(spark.sql("SELECT COUNT(*) FROM prod_mappings_test").as[Long].head() == res.mapping.count())
    // QA on the persisted output passes the same gates as the direct path
    val qa = res.qa.head()
    assert(qa.getAs[String]("coverage_status") == "PASS")
    assert(qa.getAs[String]("temporal_status") == "PASS")
    // metadata JSON exists and carries the run id + SLA verdicts
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/metadata_r42.json")))
    assert(meta.contains("\"run_id\": \"r42\"") && meta.contains("\"sla_met\": \"PASS\""))
    // schema validation fail-fast: a malformed input raises before any work
    val e = intercept[IllegalArgumentException] {
      Pipeline.productionRun(
        spark, t1.drop("value"), t2, recs, cfg, "r43", dir, "prod_mappings_test2")
    }
    assert(e.getMessage.contains("value"))

    // restoreRun: a second run supersedes the table; rolling back
    // re-points it at the first run's immutable snapshot
    val firstCount = res.mapping.count()
    Pipeline.productionRun(
      spark, t1.filter(col("key") =!= "K1"), t2, recs, cfg, "r44", dir, "prod_mappings_test")
    assert(Pipeline.listRuns(spark, dir) == Seq("r42", "r44"))
    assert(spark.sql("SELECT COUNT(*) FROM prod_mappings_test").as[Long].head() < firstCount)
    Pipeline.restoreRun(spark, dir, "prod_mappings_test", "r42")
    assert(spark.sql("SELECT COUNT(*) FROM prod_mappings_test").as[Long].head() == firstCount)
    intercept[IllegalArgumentException](
      Pipeline.restoreRun(spark, dir, "prod_mappings_test", "nope"))
    spark.sql("DROP TABLE IF EXISTS prod_mappings_test")
  }

  test("GraftSession.restore puts tuned confs back to the caller's values") {
    val key = "spark.sql.ansi.enabled"
    graft.core.GraftSession.restore(spark) // drop any recording from earlier suites
    spark.conf.set(key, "true")
    graft.core.GraftSession.tune(spark) // records the caller's "true"
    assert(spark.conf.get(key) == "false") // engine semantics while tuned
    graft.core.GraftSession.restore(spark)
    assert(spark.conf.get(key) == "true", "restore must return the caller's ANSI setting")
    // put the suite back into engine mode for the remaining tests
    graft.core.GraftSession.tune(spark)
  }

  test("streaming daily series matches the batch aggregation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    // stage the sf0.001 events as the stream input (nanos-safe load)
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").parquet(s"$dir/in")
    val expected = graft.sources.Tables.bothSeries(spark, "/root/testdata/sf0.001")
      .withColumnRenamed("v1", "e1").withColumnRenamed("v2", "e2").cache()

    // complete-mode memory sink: every window present -> full equality
    val stream = EventsStream.dailySeries(EventsStream.readEvents(spark, s"$dir/in"))
    val mq = stream.writeStream.outputMode("complete").format("memory")
      .queryName("series_mem").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(mq.awaitTermination(120000), "memory-sink stream did not finish in time")
    val got = spark.table("series_mem")
    assert(got.count() == expected.count())
    val diff = got.join(expected, Seq("key", "period"))
      .filter(
        abs(coalesce(col("v1"), lit(0)) - coalesce(col("e1"), lit(0))) > 1e-9 ||
          abs(coalesce(col("v2"), lit(0)) - coalesce(col("e2"), lit(0))) > 1e-9)
    assert(diff.count() == 0)

    // append-mode parquet sink: only watermark-finalized windows appear,
    // but every emitted row must agree with the batch aggregation
    val pq = EventsStream.writer(
      EventsStream.dailySeries(EventsStream.readEvents(spark, s"$dir/in"), "0 seconds"),
      s"$dir/out", s"$dir/ckpt").start()
    assert(pq.awaitTermination(120000), "parquet-sink stream did not finish in time")
    val sunk = spark.read.parquet(s"$dir/out")
    assert(sunk.count() > 0 && sunk.count() <= expected.count())
    assert(sunk.join(expected, Seq("key", "period"), "left_anti").count() == 0)
  }

  test("streaming dedup drops replayed events within the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup").toString
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    // at-least-once source: the same events land twice
    events.write.mode("overwrite").parquet(s"$dir/in")
    events.write.mode("append").parquet(s"$dir/in")
    val deduped = EventsStream.dedupedEvents(EventsStream.readEvents(spark, s"$dir/in"))
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_mem")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "dedup stream did not finish in time")
    val got = spark.table("dedup_mem")
    assert(got.count() == events.count(), "each event exactly once")
    assert(got.select("event_id").distinct().count() == got.count())
  }

  test("model store: versioned snapshots, time-travel reads, O(1) restore") {
    import graft.sources.ModelStore
    val root = java.nio.file.Files.createTempDirectory("graft_models").toString + "/m"
    val v1df = Seq(("a", 1), ("b", 2)).toDF("key", "optimal_lag")
    val v2df = Seq(("a", 3), ("b", 4), ("c", 5)).toDF("key", "optimal_lag")
    assert(ModelStore.versions(spark, root).isEmpty)
    assert(ModelStore.save(v1df, root) == 1L)
    assert(ModelStore.save(v2df, root) == 2L)
    // latest read follows the pointer
    assert(ModelStore.load(spark, root).count() == 3)
    // VERSION AS OF
    assert(ModelStore.load(spark, root, Some(1L)).count() == 2)
    // RESTORE: pointer-only rollback, history intact
    ModelStore.restore(spark, root, 1L)
    assert(ModelStore.currentVersion(spark, root).contains(1L))
    assert(ModelStore.load(spark, root).count() == 2)
    assert(ModelStore.versions(spark, root) == Seq(1L, 2L))
    // a save after restore appends v3 — never clobbers rolled-over history
    assert(ModelStore.save(v2df, root) == 3L)
    assert(ModelStore.load(spark, root, Some(2L)).count() == 3)
    intercept[IllegalArgumentException](ModelStore.restore(spark, root, 99L))
  }

  test("streaming sessionization (flatMapGroupsWithState) agrees with batch q15") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").parquet(s"$dir/in")
    val sessions = EventsStream.sessionize(
      EventsStream.readEvents(spark, s"$dir/in"), watermark = "0 seconds")
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sess_mem")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "session stream did not finish in time")
    val got = spark.table("sess_mem")
    val expected = SparkEntry.queries("q15_sessions")(spark, "/root/testdata/sf0.001")
      .withColumnRenamed("n_events", "e_n")
      .withColumnRenamed("duration_ms", "e_dur")
      .withColumnRenamed("total_value", "e_tot")
    // append mode: only watermark-finalized sessions appear, but every
    // emitted session must match its batch counterpart bit-for-bit
    assert(got.count() > 0 && got.count() <= expected.count())
    assert(got.join(expected, Seq("key", "session_id"), "left_anti").count() == 0)
    val mismatch = got.join(expected, Seq("key", "session_id"))
      .filter(
        col("n_events") =!= col("e_n") || col("duration_ms") =!= col("e_dur") ||
          abs(col("total_value") - col("e_tot")) > 1e-9)
    assert(mismatch.count() == 0)
  }

  test("streaming interval join: purchase-click attribution with bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double)]
    val events = in.toDF().toDF("event_id", "user_id", "ts", "event_type", "value")
    val q = EventsStream
      .attributedPurchases(events, watermark = "2 hours", lookback = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("attr").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq(
      (1L, 1L, ts(9, 59), "click", 0.0), // 31 min before the purchase: out
      (2L, 1L, ts(10, 0), "click", 0.0), // exactly 30 min: inclusive, in
      (3L, 1L, ts(10, 20), "click", 0.0), // in
      (4L, 1L, ts(10, 30), "purchase", 42.0),
      (5L, 2L, ts(10, 0), "click", 0.0), // same user, purchase 60 min later: out
      (6L, 2L, ts(11, 0), "purchase", 7.0),
      (7L, 3L, ts(10, 25), "view", 1.0)) // wrong type: never joins
    rows.foreach(in.addData(_))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attr").select($"purchase_id", $"click_id")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((4L, 2L), (4L, 3L)))
    // cross-check vs the equivalent BATCH inequality join on the same rows
    val batch = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val p = batch.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("pu"), $"ts".as("p_ts"))
    val c = batch.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("cu"), $"ts".as("c_ts"))
    val want = p.join(c, $"pu" === $"cu" &&
        $"c_ts" >= $"p_ts" - expr("interval 30 minutes") && $"c_ts" <= $"p_ts")
      .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("sessionize: numbering survives state timeout; out-of-order events fold by min/max") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val events = in.toDF().toDF("event_id", "user_id", "ts", "value")
    val q = EventsStream.sessionize(events, watermark = "2 hours")
      .writeStream.outputMode("append").format("memory").queryName("sess_cont").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    var eid = 0L
    def feed(rows: (Long, Int, Int, Double)*): Unit = {
      rows.foreach { case (user, h, m, v) => eid += 1; in.addData((eid, user, ts(h, m), v)) }
      q.processAllAvailable()
    }
    // user 100: session 1 at 10:00, then nothing until 14:30 — the state
    // store's event-time timeout closes session 1 in between (watermark is
    // pushed by user 200), so 14:30 must open session_id 2, NOT restart at 1.
    // user 300: events arrive 12:00, then 11:00 (on-time but out-of-order,
    // in a LATER micro-batch), then 12:20 — one session of 3 events,
    // duration 11:00→12:20, not a negative-duration or split session.
    feed((100L, 10, 0, 1.0))
    feed((300L, 12, 0, 1.0), (200L, 12, 0, 0.0))
    feed((300L, 11, 0, 1.0), (200L, 13, 0, 0.0))
    feed((300L, 12, 20, 1.0), (200L, 14, 0, 0.0))
    feed((100L, 14, 30, 1.0))
    feed((200L, 18, 0, 0.0))
    feed((200L, 19, 0, 0.0))
    q.stop()
    val got = spark.table("sess_cont")
    assert(got.groupBy("key", "session_id").count().filter(col("count") > 1).count() == 0,
      "no duplicate (key, session_id) pairs after a timeout")
    val a = got.filter(col("key") === "100").select("session_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == Seq(1L, 2L), s"user 100 sessions should be numbered 1,2 — got $a")
    val c = got.filter(col("key") === "300").collect()
    assert(c.length == 1, s"user 300 should have ONE folded session, got ${c.length}")
    assert(c.head.getAs[Long]("n_events") == 3L)
    assert(c.head.getAs[Long]("duration_ms") == 80L * 60000L,
      "duration spans min(start) to max(last), never negative")
  }

  test("stream-driven incremental mapping remaps touched entities per batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_map").toString
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").parquet(s"$dir/in")
    val series = EventsStream.dailySeries(
      EventsStream.readEvents(spark, s"$dir/in"), watermark = "0 seconds")
    val mapped = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = EventsStream.incrementalMapping(series, s"$dir/store", s"$dir/ckpt") {
      (accumulated, batchId) =>
        val merged = accumulated.filter(col("v1").isNotNull && col("v2").isNotNull)
        val best = graft.operators.LagCorrelation.bestLag(
          graft.operators.LagCorrelation.lagCorrTable(
            merged, MappingConfig(periodUnit = PeriodUnit.Day, maxLag = 6)))
        mapped += best.count()
        best.write.mode("overwrite").parquet(s"$dir/mapping")
    }.start()
    assert(q.awaitTermination(180000), "incremental-mapping stream did not finish in time")
    assert(mapped.nonEmpty && mapped.last > 0)
    assert(spark.read.parquet(s"$dir/mapping").count() == mapped.last)
  }

  test("m11 segments on the STAGED recommendation model, not a live training plan") {
    // Pipeline.run's three segment branches each reference the model with
    // a different pushed-down filter; an unmaterialized model plan would
    // re-run the per-lag corr scan per branch (NOTES.md round-3). Lock
    // that building m11 populates the shared staging entry.
    val sfDir = "/root/testdata/sf0.001"
    // start from a clean slate so the assertion can't pass vacuously off
    // an earlier test's staging, and probe with contains (no side effect
    // that could poison the shared cache on the failure path)
    graft.sources.StagingCache.remove(spark, s"recommendations:$sfDir")
    SparkEntry.queries("m11_pipeline")(spark, sfDir).count()
    assert(
      graft.sources.StagingCache.contains(spark, s"recommendations:$sfDir"),
      "m11 did not leave the recommendation model staged")
  }
}
