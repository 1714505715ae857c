package graft.operators

import graft.core.{MappingConfig, PeriodUnit, SeriesTable}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lag-scan Pearson correlation — the reference's flagship method
  * (/root/reference/mapping_engine.py:117-160, 241-264), re-expressed 100%
  * relationally (SURVEY.md §2.4 A10a): no UDF, whole-stage-codegen'd, and
  * DuckDB-oracle-able.
  *
  * Shape: one window pass over the merged series (lead partners for
  * positions 0..maxLag), per-calendar-lag `corr` accumulator columns in a
  * single hash aggregate (no row blowup), then window-argmax the best lag
  * per key.
  *
  * Scale notes (100 TB): ONE shuffle of |merged| by key (the window),
  * partial-aggregated corr accumulators, and an argmax over the tiny
  * per-(key,lag) table (≤ maxLag+1 rows per entity). No driver-side
  * collection anywhere.
  */
object LagCorrelation {

  /** Per-(key, lag) correlation table: `(key, lag, correlation, n_overlap)`.
    *
    * Semantics preserved from the reference kernel: a lag is skipped unless
    * at least `minOverlap` (=2) aligned points exist
    * (mapping_engine.py:136-149), and zero-variance series (NaN corr) are
    * dropped (pearsonr-NaN guard, mapping_engine.py:153-156). Alignment is
    * calendar-based: v1(t) pairs with v2(t + lag), equivalent to the
    * reference's positional slicing on gap-free series (SURVEY.md §7.4).
    */
  def lagCorrTable(merged: DataFrame, cfg: MappingConfig): DataFrame = {
    graft.core.GraftSession.tune(merged.sparkSession)
    // Window formulation: ONE shuffle of `merged` by key (the window
    // partition), instead of self-joining the 7x lag-exploded table
    // (which shuffles both sides). For each row, look 0..maxLag POSITIONS
    // ahead with lead(struct(period, v2)); each partner's true calendar
    // lag is its period difference, and since periods are strictly
    // increasing, calendar-lag <= maxLag implies position-offset <= maxLag
    // — so scanning maxLag positions finds every calendar partner even
    // with gaps.
    //
    // No row blowup either: instead of exploding maxLag+1 partner rows
    // per input row, each calendar lag L gets its OWN aggregate column —
    // partner_L = the (unique) positional lead at calendar distance L
    // (coalesce over positions 0..L) — and `corr` skips null pairs, so
    // one pass with maxLag+1 corr accumulators replaces the exploded
    // aggregate. The per-key 7-column result unpivots at the end (tiny).
    // Semantics identical to the self-join on period+lag (locked by the
    // DuckDB oracle, which keeps the join formulation).
    val w = Window.partitionBy(col("key")).orderBy(col("period"))
    val unitDiff: (Column, Column) => Column = cfg.periodUnit match {
      case graft.core.PeriodUnit.Day   => (a, b) => datediff(a, b)
      case graft.core.PeriodUnit.Month => (a, b) => months_between(a, b).cast("int")
    }
    val lags = 0 to cfg.maxLag
    val withLeads = merged.select(
      col("key") +: col("period") +: col("v1") +:
        lags.map(l =>
          lead(struct(col("period").as("p"), col("v2").as("v")), l).over(w).as(s"pv$l")): _*)
    val withPartners = withLeads.select(
      col("key") +: col("v1") +:
        lags.map { calLag =>
          coalesce(
            (0 to calLag).map { pos =>
              val pv = col(s"pv$pos")
              when(pv.isNotNull && unitDiff(pv("p"), col("period")) === calLag, pv("v"))
            }: _*).as(s"partner$calLag")
        }: _*)
    val aggregated = withPartners
      .groupBy(col("key"))
      .agg(
        corr(col("v1"), col(s"partner${lags.head}")).as(s"corr${lags.head}"),
        lags.tail.map(l => corr(col("v1"), col(s"partner$l")).as(s"corr$l")) ++
          lags.map(l => count(col(s"partner$l")).as(s"cnt$l")): _*)
    aggregated
      .select(
        col("key"),
        explode(array(lags.map(l =>
          struct(lit(l).as("lag"), col(s"corr$l").as("correlation"), col(s"cnt$l").as("n_overlap"))): _*))
          .as("x"))
      .select(col("key"), col("x.lag").as("lag"), col("x.correlation").as("correlation"), col("x.n_overlap").as("n_overlap"))
      .filter(col("n_overlap") >= cfg.minOverlap)
      .filter(col("correlation").isNotNull && !isnan(col("correlation")))
  }

  /** Best lag per key via window argmax. Tie-break mirrors the reference's
    * strict `>` (keeps the earliest best lag, mapping_engine.py:154): order
    * corr DESC, lag ASC. Correlation is rounded to 6 decimals *before*
    * ranking so the choice is stable across engines (ulp-level corr
    * differences must not flip the argmax vs the DuckDB oracle). */
  def bestLag(corrTable: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("key"))
      .orderBy(round(col("correlation"), 6).desc, col("lag").asc)
    corrTable
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("key"),
        col("lag").as("optimal_lag"),
        round(col("correlation"), 6).as("correlation"),
        col("n_overlap"))
  }

  /** Per-entity summary matching the reference's correlation UDF output
    * (mapping_engine.py:232-239): optimal lag + correlation + series stats,
    * PLUS the nested `all_lags` array-of-struct the reference exposes for
    * later exploration (02_corr_mapping.p:25-29) — sorted by lag, each
    * element (lag, correlation, n_overlap).
    *
    * One groupBy pass builds the nested array AND derives the best lag
    * from it (array fold argmax — strict `>` over the lag-ascending array
    * keeps the earliest best, identical to [[bestLag]]'s window ranking),
    * so the per-(key,lag) table is aggregated once, not twice. */
  def summary(merged: DataFrame, cfg: MappingConfig): DataFrame = {
    val stats = merged
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("num_periods"),
        round(avg(col("v1")), 6).as("v1_mean"),
        round(avg(col("v2")), 6).as("v2_mean"))
    val perKey = lagCorrTable(merged, cfg)
      .select(
        col("key"),
        struct(
          col("lag"),
          round(col("correlation"), 6).as("correlation"),
          col("n_overlap")).as("lc"))
      .groupBy(col("key"))
      .agg(array_sort(collect_list(col("lc"))).as("all_lags"))
    val best = aggregate(
      slice(col("all_lags"), lit(2), size(col("all_lags")) - 1),
      element_at(col("all_lags"), 1),
      (acc, x) => when(x.getField("correlation") > acc.getField("correlation"), x).otherwise(acc))
    perKey
      .select(
        col("key"),
        best.getField("lag").as("optimal_lag"),
        best.getField("correlation").as("correlation"),
        best.getField("n_overlap").as("n_overlap"),
        col("all_lags"))
      .join(stats, Seq("key"))
  }

  /** Row-level mapping: join the *raw* (not merged) tables through the
    * per-entity optimal lag — preserving the reference quirk that mapping
    * rows may exist for periods absent from the merged set
    * (mapping_engine.py:616-637, SURVEY.md §7.3).
    *
    * `best` is one row per entity; both join-backs broadcast it when
    * `cfg.broadcastSummaries` (the reference's choice,
    * mapping_engine.py:617, 641) — at very high entity counts set it
    * false and AQE picks the strategy from runtime sizes. The lag-shifted
    * join is derive-then-equi-join: compute `period + optimal_lag` as a
    * column, then plain equi-join (no custom join operator needed).
    */
  def mapping(t1: DataFrame, t2: DataFrame, best: DataFrame, cfg: MappingConfig): DataFrame = {
    val valid = best.filter(col("correlation") >= cfg.minCorrelation)
    mappingWithLags(t1, t2, valid.select(col("key"), col("optimal_lag")), cfg)
      .join(maybeBroadcast(valid.select(col("key"), col("correlation")), cfg), Seq("key"), "left")
  }

  /** Broadcast per-entity summaries when the config says so (reference
    * default); otherwise leave the join strategy to Catalyst/AQE. Shared
    * by every operator that joins a one-row-per-entity table back to a
    * fact table (Pipeline segments through here too). */
  private[operators] def maybeBroadcast(df: DataFrame, cfg: MappingConfig): DataFrame =
    if (cfg.broadcastSummaries) broadcast(df) else df

  /** The shared lag-shifted join-back: map t1 rows to t2 rows at
    * period + optimal_lag, given per-entity lags (no score attached).
    * Also the production path's primitive (stored-model lags). */
  def mappingWithLags(t1: DataFrame, t2: DataFrame, lags: DataFrame, cfg: MappingConfig): DataFrame = {
    val withLag =
      t1.join(maybeBroadcast(lags.select(col("key"), col("optimal_lag")), cfg), Seq("key"), "inner")
    val right = t2.select(
      col("key").as("r_key"),
      col("period").as("r_period"),
      col("value").as("value2"))
    withLag
      .withColumn(
        "target_period",
        SeriesTable.shiftPeriod(col("period"), col("optimal_lag"), cfg.periodUnit))
      .join(right, col("key") === col("r_key") && col("target_period") === col("r_period"), "inner")
      .select(
        col("key"),
        date_format(col("period"), "yyyy-MM-dd").as("time1"),
        col("value").as("value1"),
        date_format(col("r_period"), "yyyy-MM-dd").as("time2"),
        col("value2"),
        col("optimal_lag").as("lag_offset"),
        lit("correlation").as("method"))
  }
}
