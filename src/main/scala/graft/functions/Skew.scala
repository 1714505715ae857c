package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot-key aggregation.
  *
  * Algebraic aggregates (sum/count/avg/corr) need NO salting in this
  * engine: hash aggregation partial-aggregates map-side, so a hot key
  * reduces to one row per upstream partition before the shuffle. AQE
  * handles join skew. These helpers cover the remaining cases.
  */
object Skew {

  /** Exact distinct-count per key without a skewed single-reducer:
    * phase 1 dedupes (key, value) pairs — the shuffle spreads a hot key's
    * distinct values across reducers via the value hash — phase 2 counts
    * deduped rows per key (partial-aggregated). Equivalent to
    * `groupBy(key).agg(countDistinct(value))` with balanced shuffles. */
  def exactDistinctPerKey(df: DataFrame, key: String, value: String): DataFrame =
    df.select(col(key), col(value))
      .filter(col(value).isNotNull) // countDistinct ignores nulls; match it
      .distinct()
      .groupBy(col(key))
      .agg(count(lit(1)).as(s"distinct_$value"))

  /** Salted two-phase aggregation for non-algebraic per-key reductions
    * (e.g. building bounded samples of a hot key's rows): phase 1 groups
    * by (key, salt) limiting each salt bucket, phase 2 merges buckets per
    * key. `perSaltLimit` bounds memory per reducer deterministically.
    *
    * `rowId` MUST be a deterministic, high-cardinality per-row
    * expression (a primary key, an offset). It is required, not
    * defaulted, because both cheap defaults are wrong: hash(payload)
    * collapses a hot key's constant payload into ONE salt bucket
    * (single-reducer blowup — the very thing salting prevents), and a
    * nondeterministic salt (rand, monotonically_increasing_id) before
    * the shuffle corrupts the sample on task retry (recomputed map
    * tasks salt rows differently than the partitions reducers already
    * fetched). */
  def saltedSample(
      df: DataFrame,
      key: String,
      payload: Column,
      saltBuckets: Int,
      perSaltLimit: Int,
      rowId: Column): DataFrame =
    df.select(
      col(key),
      (abs(hash(rowId)) % saltBuckets).as("salt"),
      payload.as("payload"))
      .groupBy(col(key), col("salt"))
      .agg(slice(collect_list(col("payload")), 1, perSaltLimit).as("bucket"))
      .groupBy(col(key))
      .agg(flatten(collect_list(col("bucket"))).as("sample"))
}
