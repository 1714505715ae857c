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
    * `saltBy` MUST be a deterministic per-row expression (default:
    * hash of the payload). A nondeterministic salt (rand,
    * monotonically_increasing_id) before the shuffle is a correctness
    * hazard — task retries recompute different salts than the partitions
    * reducers already fetched. When the payload is constant or
    * low-cardinality for a hot key (so its hash collapses into one salt
    * bucket), pass a unique row attribute (primary key, offset) as
    * `saltBy` instead. */
  def saltedSample(
      df: DataFrame,
      key: String,
      payload: Column,
      saltBuckets: Int,
      perSaltLimit: Int,
      saltBy: Option[Column] = None): DataFrame =
    df.select(
      col(key),
      (abs(hash(saltBy.getOrElse(payload))) % saltBuckets).as("salt"),
      payload.as("payload"))
      .groupBy(col(key), col("salt"))
      .agg(slice(collect_list(col("payload")), 1, perSaltLimit).as("bucket"))
      .groupBy(col(key))
      .agg(flatten(collect_list(col("bucket"))).as("sample"))
}
