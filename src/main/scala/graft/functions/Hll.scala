package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet &
  * Meunier 2007 — public paper) built from the PORTABLE 60-bit
  * md5-prefix hash, so the register table AND the estimate derived from
  * it replay bit-for-bit in any engine with md5 — the q44 Count-Min
  * convention, completing the streaming-frequency toolbox: MG (q43)
  * finds the hot keys, CMS (q44) answers point frequencies, HLL answers
  * "how many distinct keys" in 256 bytes.
  *
  * Scale shape: one partial-aggregated groupBy — map-side combine caps
  * the shuffle at m rows per partition REGARDLESS of stream size, vs a
  * full shuffle of every distinct key for countDistinct. The register
  * table is mergeable (cell-wise MAX, [[merge]]), which is the
  * incremental / per-day / streaming maintenance path: union register
  * tables, never re-read raw keys.
  *
  * Bit-exactness: bucket and rank are integer functions of the portable
  * hash; the estimate's float work is pinned to one evaluation order —
  * the harmonic sum folds over buckets 0..m−1 ascending, each term an
  * EXACT power of two (1.0 / (1L << rank)), so the fold is the same
  * IEEE sequence in Spark and an oracle's ordered list_reduce. The
  * small-range linear-counting correction (which needs ln, an op with
  * no cross-engine bit contract) is deliberately omitted: [[estimate]]
  * is the raw estimator, accurate for cardinalities ≳ 3·m, and the
  * registered query's input sits far above that regime.
  */
object Hll {

  /** m = 256 registers (b = 8): the rank math below splits the 60-bit
    * portable hash into an 8-bit bucket and a 52-bit word. */
  val numBuckets = 256

  /** Per-bucket max-rank register table: bucket = low 8 hash bits,
    * rank = leading zeros of the 52-bit word + 1 (all-zero word → 53),
    * computed with integer ops only (bitlength via `bin`). Untouched
    * buckets are simply absent (rank 0). Defined as the grouped form
    * under a constant group so the pinned bit-replay (bucket, rank)
    * math lives in exactly ONE place — the q45/q49 cross-engine parity
    * contract cannot drift between the two surfaces. */
  def registers(df: DataFrame, key: Column): DataFrame =
    groupedRegisters(df, lit("_"), key).drop("grp")

  /** Merge register tables built from the SAME hash/geometry: cell-wise
    * MAX — HLL is a monoid, so per-batch sketches union losslessly. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("bucket"))
      .agg(max(col("max_rank")).as("max_rank"))

  /** Per-GROUP register tables — the production shape ("distinct users
    * per domain/day/experiment"): one partial-aggregated groupBy keyed
    * by (group, bucket), shuffle ≤ m rows per group per partition
    * regardless of cardinality (a grouped countDistinct shuffles every
    * distinct (group, key) pair). Output: (groupCol, bucket, max_rank);
    * merge across batches = MAX by (group, bucket). NULL groups carry
    * no group signal and are dropped (the CountMin/FrequentItems null
    * rule) — a grouped countDistinct would emit a NULL group row, but a
    * sketch keyed on "unknown group" answers no monitoring question and
    * a null key would poison every driver-side fold over the groups. */
  def groupedRegisters(df: DataFrame, group: Column, key: Column): DataFrame = {
    val h = TextFunctions.portableHash(key)
    df.select(group.as("grp"), h.as("h"))
      .filter(col("grp").isNotNull)
      .select(
        col("grp"),
        pmod(col("h"), lit(numBuckets)).cast("int").as("bucket"),
        shiftright(col("h"), 8).as("w"))
      .select(
        col("grp"),
        col("bucket"),
        when(col("w") === 0, lit(53))
          .otherwise(lit(53) - length(bin(col("w")))).cast("int").as("rank"))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rank")).as("max_rank"))
  }

  /** Per-group estimates from a grouped register table: a bounded
    * collect (≤ m rows per group — callers bring bounded group counts,
    * e.g. enumerable dimensions), each group folded in ascending-bucket
    * order exactly like [[estimate]]. Returns (grp, raw_est) rows. */
  def groupedEstimates(registerTable: DataFrame): Seq[(String, Double)] = {
    val byGroup = registerTable
      .select(col("grp").cast("string"), col("bucket").cast("int"), col("max_rank").cast("int"))
      // defensive twin of groupedRegisters' null-group drop: a register
      // table from another producer could still carry grp = NULL, which
      // would otherwise NPE the String sort below
      .filter(col("grp").isNotNull)
      .collect()
      .groupBy(_.getString(0))
    byGroup.toSeq.map { case (g, rows) =>
      g -> estimateFromRanks(rows.map(r => r.getInt(1) -> r.getInt(2)).toMap)
    }.sortBy(_._1)
  }

  /** The raw HLL estimate α_m·m²/Σ2^−rank from a register table: a
    * bounded ≤m-row collect, harmonic sum folded in ascending-bucket
    * order (absent buckets rank 0) — the pinned-order float contract
    * described in the object doc. */
  def estimate(registerTable: DataFrame): Double =
    estimateFromRanks(
      registerTable
        .select(col("bucket").cast("int"), col("max_rank").cast("int"))
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap)

  /** The pure kernel of [[estimate]] — also the property-test surface. */
  def estimateFromRanks(ranks: Map[Int, Int]): Double = {
    var s = 0.0
    var b = 0
    while (b < numBuckets) {
      s += 1.0 / (1L << ranks.getOrElse(b, 0))
      b += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / numBuckets.toDouble)
    alpha * numBuckets * numBuckets / s
  }
}
