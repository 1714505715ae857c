package graft.core

import org.apache.spark.sql.SparkSession

/** Session settings the engine's semantics depend on, applied idempotently
  * at every entry point (queries may run in a driver-owned session the
  * library did not build).
  *
  * NOTE these settings are SESSION-WIDE: loading any graft table switches
  * the session to classic (non-ANSI) evaluation until [[restore]] is
  * called, which also changes error semantics (e.g. div-by-zero → null)
  * for unrelated queries on the same session. Drivers that interleave
  * graft work with ANSI-dependent queries should call [[restore]] between
  * them (the prior values are recorded on first tune). Remember Spark
  * confs are read at EXECUTION time — restore only after the graft
  * DataFrames have been materialized.
  */
object GraftSession {

  private val tunedKeys =
    Seq("spark.sql.ansi.enabled", "spark.sql.legacy.parquet.nanosAsLong")

  // Weak keys: a stopped/discarded session's saved confs must not pin the
  // session object in a long-lived multi-session driver.
  private val saved =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Map[String, Option[String]]]())

  def tune(spark: SparkSession): Unit = {
    // Record the caller's values once, so restore() can undo us.
    saved.computeIfAbsent(
      spark,
      _ => tunedKeys.map(k => k -> spark.conf.getOption(k)).toMap)
    // Pearson corr / stddev over a zero-variance group must yield NaN and
    // be skipped (reference semantics, mapping_engine.py:153-156) — under
    // ANSI mode (Spark 4 default) the internal division throws
    // DIVIDE_BY_ZERO instead. Classic (non-ANSI) evaluation restores the
    // NaN path; the DuckDB oracle likewise yields NULL, filtered the same.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    // The harness events table stores TIMESTAMP(NANOS), rejected by the
    // parquet reader unless read as long (then rebuilt as micros).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  /** Put the session's tuned confs back to their pre-[[tune]] values
    * (unset keys are unset again). No-op if tune never ran here. */
  def restore(spark: SparkSession): Unit =
    Option(saved.remove(spark)).foreach(_.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    })
}
