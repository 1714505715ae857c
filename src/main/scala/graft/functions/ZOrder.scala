package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered layout: interleave the bits of
  * several dimension columns into one sort key so that sorting by it
  * co-locates rows that are close in EVERY dimension — the multi-
  * dimensional data-skipping layout (Delta/Iceberg `OPTIMIZE ZORDER BY`,
  * re-expressed on plain parquet).
  *
  * Why it matters at 100 TB: per-file (and per-row-group) min/max stats
  * are the first pruning layer of every columnar reader. A layout sorted
  * by ONE column prunes only that column's predicates; a z-ordered
  * layout bounds every interleaved dimension within each file, so a box
  * predicate on ANY subset of the dimensions skips most files — measured
  * in ZOrderSpec: a y-box over an x-sorted layout reads every file,
  * over the z-ordered layout a handful.
  *
  * The key is built from codegen'd builtin bit ops (no UDF): bit `i` of
  * dimension `j` lands at interleaved position `i*n + j` via
  * `(x & (1<<i)) << (i*(n-1) + j)` — one AND + one SHIFT per term, no
  * separate extract-then-place. Identical arithmetic runs in DuckDB for
  * the oracle (q31_zorder).
  */
object ZOrder {

  /** Morton key over `cols` (masked to `bits` low bits each; inputs must
    * be non-negative). `bits * cols.size` must fit a signed long. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, "z-order needs at least 2 dimensions")
    require(bits * n <= 63, s"$n dims x $bits bits overflow a long")
    val masked = cols.map(_.cast("long").bitwiseAND(lit((1L << bits) - 1)))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      masked.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(shiftleft(c.bitwiseAND(lit(1L << i)), i * (n - 1) + j))
      }
    }
  }

  /** The same interleave as ANSI SQL over column names — the oracle-side
    * twin of [[zValue]], kept adjacent so the formulas cannot drift. */
  def zValueSql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
      // BIGINT cast per term: on an INT32 column a shifted bit can pass
      // 2^31, which strict engines (DuckDB) reject as overflow
    } yield s"((CAST($c AS BIGINT) & ${1L << i}) << ${i * (n - 1) + j})"
    terms.mkString("(", " | ", ")")
  }

  /** Write `df` z-ordered by `zCols` into `nFiles` parquet files: range-
    * partition on the Morton key (each file covers a contiguous z-range,
    * so every dimension's per-file min/max is tight) and sort within
    * partitions (row-group-level stats get the same treatment). One
    * shuffle; at production scale this is the compaction/OPTIMIZE pass,
    * run once per partition of newly landed data. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      zCols: Seq[String],
      bits: Int = 16,
      nFiles: Int = 32): Unit = {
    val z = zValue(zCols.map(col), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file min/max envelopes for `statCols` — the data-skipping view a
    * parquet footer reader has of a directory. `couldSkip` applied to
    * this is exactly file-level pruning for a box predicate. */
  def fileEnvelopes(df: DataFrame, statCols: Seq[String]): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("n_rows"),
        statCols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)
}
