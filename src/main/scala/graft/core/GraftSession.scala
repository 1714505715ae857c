package graft.core

import org.apache.spark.sql.SparkSession

/** Session settings the engine's semantics depend on, applied idempotently
  * at every entry point (queries may run in a driver-owned session the
  * library did not build). */
object GraftSession {
  def tune(spark: SparkSession): Unit = {
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
}
