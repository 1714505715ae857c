package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Production SLA layer — Scala counterpart of the reference monitor's
  * check_sla + send_alert (/root/reference/05_prod_dev.py:670-745):
  * one PASS/ALERT row per SLA with the reference's severities, plus the
  * overall verdict row (its boolean return), so alerting systems consume
  * a table instead of log lines.
  *
  * Scale notes: two single-row aggregates (mapping stats, input key
  * count) crossed into a constant-size report — the only shuffles are the
  * two countDistincts, both partial-aggregated. `durationSec` is wall
  * clock measured by the caller (data cannot know it).
  */
object Sla {

  final case class SlaThresholds(
      minCoveragePct: Double = 80.0,  // 05_prod_dev.py:710
      maxDurationSec: Double = 1800.0 // 05_prod_dev.py:722
  )

  /** One row per check: (check, metric_value, threshold, status, severity).
    * status ∈ PASS | ALERT; severity mirrors the reference's alert levels
    * (coverage ERROR, duration WARNING, non-empty CRITICAL). The final
    * `sla_met` row is the conjunction (05_prod_dev.py:745). */
  def report(
      mapping: DataFrame,
      inputKeys: DataFrame,
      durationSec: Double,
      t: SlaThresholds = SlaThresholds()): DataFrame = {
    val stats = mapping.agg(
      countDistinct(col("key")).as("mapped_keys"),
      count(lit(1)).as("total_mappings"))
    val keys = inputKeys.agg(countDistinct(col("key")).as("total_keys"))
    val coverage = round(col("mapped_keys") * lit(100.0) / col("total_keys"), 6)
    val covOk = coverage >= t.minCoveragePct
    val durOk = lit(durationSec) <= t.maxDurationSec
    val nonEmptyOk = col("total_mappings") > 0
    def status(ok: org.apache.spark.sql.Column) = when(ok, "PASS").otherwise("ALERT")
    stats
      .crossJoin(keys)
      .select(
        explode(array(
          struct(
            lit("coverage_pct").as("check"),
            coverage.cast("double").as("metric_value"),
            lit(t.minCoveragePct).as("threshold"),
            status(covOk).as("status"),
            lit("ERROR").as("severity")),
          struct(
            lit("duration_sec").as("check"),
            lit(durationSec).cast("double").as("metric_value"),
            lit(t.maxDurationSec).as("threshold"),
            status(durOk).as("status"),
            lit("WARNING").as("severity")),
          struct(
            lit("total_mappings").as("check"),
            col("total_mappings").cast("double").as("metric_value"),
            lit(0.0).as("threshold"),
            status(nonEmptyOk).as("status"),
            lit("CRITICAL").as("severity")),
          struct(
            lit("sla_met").as("check"),
            (covOk && durOk && nonEmptyOk).cast("double").as("metric_value"),
            lit(1.0).as("threshold"),
            status(covOk && durOk && nonEmptyOk).as("status"),
            lit("SUMMARY").as("severity")))).as("c"))
      .select(
        col("c.check").as("check"),
        col("c.metric_value").as("metric_value"),
        col("c.threshold").as("threshold"),
        col("c.status").as("status"),
        col("c.severity").as("severity"))
  }
}
