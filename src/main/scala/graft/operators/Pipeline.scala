package graft.operators

import graft.core.{MappingConfig, SeriesTable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Production pipeline — Scala counterpart of the reference's
  * ProductionPipeline / MappingEngine.process
  * (/root/reference/05_prod_dev.py:329-447, 769-982).
  *
  * Given a pre-trained recommendations "model" (one row per entity with
  * `recommended_method` and `optimal_lag`), segment input entities:
  *   - Correlation-recommended → lag-shifted join REUSING the stored lag
  *     (no correlation recompute — the reference's key prod optimization);
  *   - DTW-recommended → DTW re-run on the merged series;
  *   - no recommendation → default lag 1 (05_prod_dev.py:410-414).
  *
  * Scale notes: segmentation is three filters over one left join of the
  * distinct-keys table (small) against the model (small, broadcast); the
  * fact tables are touched once per segment with equi-joins only. No
  * driver-side counts gate the flow — empty segments union away lazily.
  */
object Pipeline {

  /** Correlation mapping with GIVEN per-entity lags (no score recompute):
    * the shared lag-shifted join-back. `lags`: (key, optimal_lag). */
  def correlationMappingWithLags(
      t1: DataFrame,
      t2: DataFrame,
      lags: DataFrame,
      cfg: MappingConfig): DataFrame =
    LagCorrelation.mappingWithLags(t1, t2, lags, cfg)

  /** Full pipeline run: segment by stored recommendation, map per segment,
    * union, stamp the run id.
    *
    * Per-entity tables (the model, the DTW key set) broadcast only when
    * `cfg.broadcastSummaries` — the reference's default, right while the
    * entity count is small; at 1M+ entities set it false and AQE picks
    * the join strategy from runtime sizes (same gate as
    * [[LagCorrelation.maybeBroadcast]]).
    *
    * `recommendations` should be a MATERIALIZED table (cached, or read
    * from the model store — production always serves from storage): the
    * three segment branches each reference it with a different pushed-down
    * method filter, so a live training plan passed here would be
    * re-evaluated per branch (measured 3x the per-lag corr scan; see
    * NOTES.md round-3).
    *
    * `dtwSummaries`: optionally pass ALREADY-COMPUTED DTW summaries
    * (key, total_cost, path) over the merged series — e.g. the ones the
    * recommendation training just produced — and the DTW segment's mapping
    * is derived by exploding their stored paths instead of re-running the
    * DTW kernel over the fact tables. */
  def run(
      t1: DataFrame,
      t2: DataFrame,
      recommendations: DataFrame,
      cfg: MappingConfig,
      runId: String,
      dtwSummaries: Option[DataFrame] = None): DataFrame = {
    def gate(df: DataFrame): DataFrame = LagCorrelation.maybeBroadcast(df, cfg)
    val inputKeys = t1.select(col("key")).distinct()
    val withRec = inputKeys.join(
      gate(recommendations.select(col("key"), col("recommended_method"), col("optimal_lag"))),
      Seq("key"),
      "left")

    val corrKeys = withRec.filter(
      col("recommended_method")
        .isin("Correlation", "Either (prefer Correlation for simplicity)"))
    val dtwKeys = withRec.filter(col("recommended_method") === "DTW")
    val noRecKeys = withRec.filter(col("recommended_method").isNull)

    val corrPart =
      correlationMappingWithLags(t1, t2, corrKeys.select(col("key"), col("optimal_lag")), cfg)
    val dtwPart = dtwSummaries match {
      case Some(s) =>
        DtwMapping
          .mappingFromSummaries(s.join(gate(dtwKeys.select("key")), Seq("key"), "left_semi"))
          .drop("dtw_cost")
      case None =>
        DtwMapping
          .mapping(
            SeriesTable.merge(t1, t2)
              .join(gate(dtwKeys.select("key")), Seq("key"), "left_semi"),
            cfg)
          .drop("dtw_cost")
    }
    // Default for unknown entities: lag 1 (05_prod_dev.py:412).
    val defaultPart = correlationMappingWithLags(
      t1,
      t2,
      noRecKeys.select(col("key"), lit(1).as("optimal_lag")),
      cfg)

    corrPart
      .unionByName(dtwPart, allowMissingColumns = true)
      .unionByName(defaultPart, allowMissingColumns = true)
      .withColumn("pipeline_run_id", lit(runId))
  }

  /** Incremental mode: the reference's "incremental processing" is a batch
    * re-run over a date-range filter (05_prod_dev.py:1054-1101) — a
    * BETWEEN predicate that prunes partitions when the sink is
    * period-partitioned. */
  def incrementalSlice(series: DataFrame, start: String, end: String): DataFrame =
    series.filter(col("period").between(lit(start).cast("date"), lit(end).cast("date")))

  /** End-to-end incremental run (05_prod_dev.py:1054-1101): slice both
    * series to [start, end], run the stored-model pipeline on the slice,
    * write the result to a temp path partitioned by `time1`, and read it
    * back date-filtered — the read-back is the validation step AND the
    * hand-off the reference does before swapping into the serving table
    * (its write-temp-then-read-back loop). The returned DataFrame scans
    * only the slice's partitions (partition pruning on `time1`;
    * PipelineSpec locks the pruned scan in the executed plan). */
  def incrementalRun(
      t1: DataFrame,
      t2: DataFrame,
      recommendations: DataFrame,
      cfg: MappingConfig,
      runId: String,
      start: String,
      end: String,
      tmpPath: String): DataFrame = {
    val sliced = run(
      incrementalSlice(t1, start, end),
      incrementalSlice(t2, start, end),
      recommendations,
      cfg,
      runId)
    writePartitioned(sliced, tmpPath)
    t1.sparkSession.read.parquet(tmpPath)
      .filter(col("time1").between(start, end))
  }

  /** Partitioned sink (05_prod_dev.py:862-867): partition by the mapping's
    * source period so date-range reads prune files. */
  def writePartitioned(mapping: DataFrame, path: String): Unit =
    mapping.write.mode("overwrite").partitionBy("time1").parquet(path)

  /** Everything the run produced, with the mapping re-read from its
    * persisted form (what downstream consumers will actually see). */
  final case class ProductionResult(
      mapping: DataFrame,
      qa: DataFrame,
      sla: DataFrame,
      outputPath: String,
      slaMet: Boolean)

  /** The reference ProductionPipeline.run orchestration
    * (05_prod_dev.py:769-982), end to end: validate input schemas →
    * stored-model mapping → partitioned save + external-table DDL → QA
    * checks → SLA report (computed on the PERSISTED output, as the
    * reference's monitor does) → metadata JSON next to the data.
    *
    * Returns lazily-usable QA/SLA DataFrames plus the overall SLA
    * verdict; only the constant-size metadata touches the driver. */
  def productionRun(
      spark: SparkSession,
      t1: DataFrame,
      t2: DataFrame,
      recommendations: DataFrame,
      cfg: MappingConfig,
      runId: String,
      outputPath: String,
      tableName: String,
      dtwSummaries: Option[DataFrame] = None): ProductionResult = {
    SeriesTable.validateSchema(t1, Seq("key", "period", "value"), "table1")
    SeriesTable.validateSchema(t2, Seq("key", "period", "value"), "table2")
    val t0 = System.nanoTime()
    val mapped = run(t1, t2, recommendations, cfg, runId, dtwSummaries)
    val path = s"$outputPath/mappings_$runId"
    writePartitioned(mapped, path)
    registerExternalTable(spark, path, tableName)
    val persisted = spark.read.parquet(path)
    val elapsed = (System.nanoTime() - t0) / 1e9
    val qa = QualityChecks.check(
      persisted.select(
        col("key"), col("time1"), col("value1"), col("time2"), col("value2"),
        col("lag_offset")),
      t1)
    val sla = Sla.report(persisted, t1, elapsed)
    val slaRows = sla.collect()
    val slaMet = slaRows
      .find(_.getAs[String]("check") == "sla_met")
      .exists(_.getAs[String]("status") == "PASS")
    // metadata JSON beside the data (05_prod_dev.py:884-905) — run
    // identity + the SLA verdicts, not data, so it stays driver-safe.
    // Written through the Hadoop FileSystem resolved from the output
    // path, so hdfs:// and s3a:// destinations work the same as local.
    def js(s: String): String = "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
    val checks = slaRows.map { r =>
      s"""${js(r.getAs[String]("check"))}: ${js(r.getAs[String]("status"))}"""
    }.mkString(", ")
    val metaPath = new org.apache.hadoop.fs.Path(s"$outputPath/metadata_$runId.json")
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(metaPath, true)
    try out.write(
      s"""{"run_id": ${js(runId)}, "output_path": ${js(path)}, "table": ${js(tableName)}, $checks}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    ProductionResult(persisted, qa, sla, path, slaMet)
  }

  /** Runs persisted under `outputPath` (one `mappings_<runId>` snapshot
    * per [[productionRun]]), ascending by run id. */
  def listRuns(spark: SparkSession, outputPath: String): Seq[String] =
    graft.sources.ModelStore.listSnapshots(spark, outputPath, "mappings_").sorted

  /** The reference's RESTORE of the results table
    * (05_prod_dev.py:1173-1188, `RESTORE TABLE ... VERSION AS OF`) over
    * run-versioned parquet: every [[productionRun]] persists an immutable
    * `mappings_<runId>` snapshot, so rollback is re-pointing the external
    * table (and its monitor view) at an earlier run — O(1), snapshots
    * untouched. See [[graft.sources.ModelStore]] for the same workflow on
    * arbitrary model tables. */
  def restoreRun(spark: SparkSession, outputPath: String, tableName: String, runId: String): Unit = {
    val avail = listRuns(spark, outputPath)
    require(avail.contains(runId),
      s"cannot restore to run $runId: not under $outputPath (available: ${avail.mkString(", ")})")
    registerExternalTable(spark, s"$outputPath/mappings_$runId", tableName)
  }

  /** External-table DDL + monitoring view over a written mapping
    * (05_prod_dev.py:872-876, 1252-1266). */
  def registerExternalTable(spark: SparkSession, path: String, tableName: String): Unit = {
    // Identifiers/paths are interpolated into DDL text: backtick-quote
    // each dot-separated part of the (possibly database-qualified) table
    // name, and backslash-escape quotes in the path (Spark's lexer uses
    // backslash escapes; SQL-standard '' doubling would silently
    // concatenate adjacent literals and mangle the location).
    def quoted(name: String): String =
      name.split('.').map(p => "`" + p.replace("`", "``") + "`").mkString(".")
    val tn = quoted(tableName)
    val p = path.replace("\\", "\\\\").replace("'", "\\'")
    spark.sql(s"DROP TABLE IF EXISTS $tn")
    spark.sql(s"CREATE TABLE $tn USING PARQUET LOCATION '$p'")
    // partitioned layout: populate the catalog's partition list
    spark.sql(s"MSCK REPAIR TABLE $tn")
    // the monitor view is temporary → always unqualified; flatten the
    // FULL qualified name into it (db1.mapping → db1_mapping_monitor) so
    // same-named tables in different databases don't clobber each
    // other's view
    val viewName = tableName.split('.').mkString("_")
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW `${viewName.replace("`", "``")}_monitor` AS
         |SELECT method, time1, COUNT(*) AS n_mappings, COUNT(DISTINCT key) AS n_keys
         |FROM $tn GROUP BY method, time1""".stripMargin)
  }
}
