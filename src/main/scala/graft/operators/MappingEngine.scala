package graft.operators

import graft.core.{MappingConfig, SeriesTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The engine's public API — Scala counterpart of
  * GenericMappingEngine.map_tables / map_tables_simple
  * (/root/reference/mapping_engine.py:425-591, 761-805).
  *
  * Differences from the reference, by design (SURVEY.md §7):
  *   - correlation is fully relational (no UDF) → whole-stage codegen;
  *   - auto mode computes the per-(key,lag) corr table ONCE and derives both
  *     the segment split and the correlation mapping from it — the reference
  *     recomputes its correlation UDF a second time
  *     (mapping_engine.py:689-690 then :602);
  *   - no manual `repartition(200)`: groupBy/mapGroups already shuffle by
  *     key, and AQE coalesces partitions.
  */
object MappingEngine {

  /** Map two canonical series tables (columns: key, period, value).
    * Returns mapping rows
    * (key, time1, value1, time2, value2, lag_offset, method, correlation?, dtw_cost?).
    */
  def mapSeries(t1: DataFrame, t2: DataFrame, cfg: MappingConfig): DataFrame = {
    val merged = SeriesTable.merge(t1, t2)
    cfg.method match {
      case "correlation" =>
        correlationMapping(merged, t1, t2, cfg)
      case "dtw" =>
        DtwMapping.mapping(merged, cfg)
      case "auto" =>
        autoMapping(merged, t1, t2, cfg)
    }
  }

  /** Raw-table convenience: canonicalize, then map — the Scala
    * `map_tables_simple` (mapping_engine.py:761-805). */
  def mapTables(
      table1: DataFrame,
      table2: DataFrame,
      keyCol: String,
      timeCol: String,
      value1Col: String,
      value2Col: String,
      cfg: MappingConfig = MappingConfig()): DataFrame = {
    val t1 = SeriesTable.canonicalize(table1, keyCol, timeCol, value1Col, cfg.periodUnit, "table1")
    val t2 = SeriesTable.canonicalize(table2, keyCol, timeCol, value2Col, cfg.periodUnit, "table2")
    mapSeries(t1, t2, cfg)
  }

  private def correlationMapping(
      merged: DataFrame,
      t1: DataFrame,
      t2: DataFrame,
      cfg: MappingConfig): DataFrame = {
    val best = LagCorrelation.bestLag(LagCorrelation.lagCorrTable(merged, cfg))
    LagCorrelation.mapping(t1, t2, best, cfg)
  }

  /** Auto mode: entities with best correlation >= 0.7 go down the
    * correlation path, the rest go to DTW (mapping_engine.py:679-746).
    * The split and the correlation mapping share ONE cached corr table
    * (one short row per entity; it stays cached for the session — callers
    * running many pairs in one long-lived driver should
    * `spark.catalog.clearCache()` between jobs). */
  def autoMapping(
      merged: DataFrame,
      t1: DataFrame,
      t2: DataFrame,
      cfg: MappingConfig,
      dtwSummaries: Option[DataFrame] = None,
      bestLag: Option[DataFrame] = None): DataFrame = {
    // callers that already staged the best-lag table (it feeds half the
    // query family) pass it in; otherwise compute-and-cache here
    val best = bestLag.getOrElse(
      LagCorrelation.bestLag(LagCorrelation.lagCorrTable(merged, cfg)).cache())
    val simpleKeys = best.filter(col("correlation") >= cfg.autoCorrThreshold).select(col("key"))
    // Keys whose best correlation is below the threshold — plus keys with NO
    // valid correlation at all (all-lag NaN / too-short): the reference's
    // UDF emits corr=-1 for those, landing them in the DTW segment.
    val complexKeys = merged
      .select(col("key")).distinct()
      .join(simpleKeys, Seq("key"), "left_anti")

    // per-entity key lists broadcast only under cfg.broadcastSummaries —
    // the same gate Pipeline.run routes through: at 1M+ entities a forced
    // broadcast of the segment key set is exactly what the gate prevents
    def gate(df: DataFrame): DataFrame = LagCorrelation.maybeBroadcast(df, cfg)
    val simpleBest = best.join(gate(simpleKeys), Seq("key"), "left_semi")
    val corrPart = LagCorrelation.mapping(t1, t2, simpleBest, cfg)
    // DTW is per-key independent, so precomputed full-table summaries
    // restricted to the complex segment are identical to running the
    // kernel on the restricted series — callers holding summaries (e.g.
    // from recommendation training) skip the second kernel run.
    val dtwPart = dtwSummaries match {
      case Some(s) =>
        DtwMapping.mappingFromSummaries(
          s.join(gate(complexKeys), Seq("key"), "left_semi"))
      case None =>
        DtwMapping.mapping(
          merged.join(gate(complexKeys), Seq("key"), "left_semi"), cfg)
    }
    // Schema union across method-specific columns (mapping_engine.py:746).
    corrPart.unionByName(dtwPart, allowMissingColumns = true)
  }

  /** Attach processing metadata (mapping_engine.py:566). Kept out of the
    * verified query outputs (non-deterministic). */
  def withMetadata(result: DataFrame, runId: String): DataFrame =
    result
      .withColumn("processed_at", current_timestamp())
      .withColumn("run_id", lit(runId))

  /** Run statistics, mirroring GenericMappingEngine.stats
    * (mapping_engine.py:582-589). */
  final case class MappingStats(
      totalMappings: Long,
      inputTable1Rows: Long,
      inputTable2Rows: Long,
      mergedRows: Long,
      processingTimeSeconds: Double,
      throughputRowsPerSec: Double)

  /** mapTables + materialization + stats. The canonical inputs are cached
    * for the duration (each feeds the mapping AND the stat counts) and
    * unpersisted before returning; the returned result stays cached —
    * the caller owns its lifecycle. */
  def mapTablesWithStats(
      table1: DataFrame,
      table2: DataFrame,
      keyCol: String,
      timeCol: String,
      value1Col: String,
      value2Col: String,
      cfg: MappingConfig = MappingConfig()): (DataFrame, MappingStats) = {
    val t0 = System.nanoTime()
    val t1 = SeriesTable.canonicalize(table1, keyCol, timeCol, value1Col, cfg.periodUnit, "table1").cache()
    val t2 = SeriesTable.canonicalize(table2, keyCol, timeCol, value2Col, cfg.periodUnit, "table2").cache()
    try {
      val result = mapSeries(t1, t2, cfg).cache()
      val total = result.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows1 = t1.count()
      val rows2 = t2.count()
      val mergedRows = SeriesTable.merge(t1, t2).count()
      (result, MappingStats(total, rows1, rows2, mergedRows, sec, total / math.max(sec, 1e-9)))
    } finally {
      t1.unpersist(blocking = false)
      t2.unpersist(blocking = false)
    }
  }
}
