package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005, "An Improved Data
  * Stream Summary: The Count-Min Sketch and its Applications" — public
  * paper) as a relational counter table: `depth` independent hash rows ×
  * `width` columns. The point-query companion to [[FrequentItems]]'
  * Misra–Gries sketch — MG answers "WHICH keys are hot" within
  * ≤ capacity counters, CMS answers "how often is THIS key" for keys
  * chosen after the fact, with the guarantees
  *   est(k) ≥ true(k)  (always: counters only ever add), and
  *   est(k) ≤ true(k) + εN w.p. ≥ 1−δ at width ⌈e/ε⌉, depth ⌈ln(1/δ)⌉.
  *
  * Execution/scale shape (100 TB): building is a map-side explode of the
  * depth coordinates followed by ONE partial-aggregated groupBy over
  * (r, c) — per-partition state collapses to depth·width counters before
  * anything shuffles, so shuffle volume is depth·width·partitions
  * regardless of event count or key cardinality, where the exact groupBy
  * alternative shuffles every distinct key. The sketch is LINEAR:
  * merging two sketches — across partitions, batches, days, or engines —
  * is plain counter addition (which is exactly why the partial aggregate
  * is lossless). Coordinates come from ONE portable md5-prefix hash per
  * key expanded by Kirsch–Mitzenmacher double hashing, so the entire
  * sketch AND every estimate replays bit-for-bit in oracle SQL (q44). */
object CountMin {

  // Kirsch–Mitzenmacher double hashing (2006, "Less Hashing, Same
  // Performance" — public paper): all depth coordinates derive from ONE
  // portable hash value v — h1 the low 30 bits, h2 the high bits forced
  // odd — as c_r = (h1 + r·h2) mod width. Preserves the CMS bounds while
  // paying a SINGLE md5 per input row instead of depth of them (measured
  // 2.35× on the 50M-row build+probe; md5 dominated the per-row-salted
  // form). h1 < 2^30, h2 < 2^31, r < depth keep arithmetic inside int64.
  private def coordFromV(v: Column, r: Column, width: Int): Column = {
    val h1 = pmod(v, lit(1L << 30))
    val h2 = shiftright(v, 30) * 2 + 1
    pmod(h1 + r.cast("long") * h2, lit(width)).cast("int")
  }

  private def hashedKeys(df: DataFrame, key: Column, depth: Int): DataFrame =
    df.select(key.cast("string").as("k"))
      .filter(col("k").isNotNull)
      .select(col("k"), TextFunctions.portableHash(col("k")).as("v"))
      .select(col("k"), col("v"), explode(sequence(lit(0), lit(depth - 1))).as("r"))

  /** Build the counter table (r, c, cnt) over `key`. Null keys carry no
    * frequency signal and are dropped (the [[FrequentItems]] rule). */
  def build(df: DataFrame, key: Column, depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1, s"depth/width must be >= 1, got $depth/$width")
    hashedKeys(df, key, depth)
      .groupBy(col("r"), coordFromV(col("v"), col("r"), width).as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for the keys in `keys(keyCol)`: min over the depth
    * counters (an untouched cell means count 0). The sketch — at most
    * depth·width rows, independent of data size — is collected ONCE
    * (bounded by construction) and re-broadcast as a local table, so
    * the validation below costs no extra pass over the sketch's
    * lineage; the probe side never shuffles. Must be called with the
    * `depth`/`width` the sketch was built with: a mismatch computes
    * wrong coordinates and can silently UNDERESTIMATE (breaking
    * est ≥ true). The occupied coordinates are validated against the
    * probe geometry, which catches the common LARGER-build mistake
    * (built 4096-wide, probed 256-wide); a SMALLER build (256-wide
    * probed 4096-wide) is undetectable from coordinates alone — only
    * [[Sketch]], which carries its geometry, closes that direction. */
  def estimate(
      sketch: DataFrame,
      keys: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    val spark = sketch.sparkSession
    // one computation of the sketch lineage: a true counter table is
    // ≤ depth·width rows by construction. The limit caps what a MISUSED
    // call can pull to the driver — passing a non-sketch table (raw
    // keyed rows, an unaggregated union) fails on the row-count require
    // below instead of OOMing the driver mid-collect.
    val counters = sketch
      .select(col("r").cast("int"), col("c").cast("int"), col("cnt").cast("long"))
      .limit(depth * width + 1)
      .collect().map(row => (row.getInt(0), row.getInt(1), row.getLong(2)))
    require(counters.length <= depth * width,
      s"`sketch` holds more than depth·width = ${depth * width} rows — " +
        "not a counter table for this geometry (or not a counter table at all)")
    counters.foreach { case (r, c, _) =>
      // both bounds: a foreign table built with signed mod emits
      // NEGATIVE coordinates, which pass a `< depth/width` check alone
      // and then silently estimate 0 for every key (the join never hits)
      require(r >= 0 && r < depth && c >= 0 && c < width,
        s"sketch occupies coordinate (r=$r, c=$c) — outside the probe " +
          s"geometry (depth=$depth, width=$width); estimate() must use " +
          "the build-time parameters")
    }
    import spark.implicits._
    val local = counters.toSeq.toDF("r", "c", "cnt")
    hashedKeys(keys, col(keyCol), depth)
      .select(col("k"), col("r"), coordFromV(col("v"), col("r"), width).as("c"))
      .join(broadcast(local), Seq("r", "c"), "left")
      .groupBy(col("k"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Merge counter tables built with the SAME (depth, width): linear
    * sketches add cell-wise. The incremental-maintenance path: keep one
    * table per day/batch/source and union+sum on read, or fold new
    * batches into a running table — either way no raw key ever needs
    * re-reading. Geometry cannot be validated from bare tables (the
    * parameters aren't in the rows) — use [[Sketch.merge]] when the
    * sketches come from different code paths. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("r"), col("c"))
      .agg(sum(col("cnt")).as("cnt"))

  /** A counter table that CARRIES its build geometry, so estimates and
    * merges can never silently run with mismatched (depth, width). */
  case class Sketch(counters: DataFrame, depth: Int, width: Int) {
    def estimate(keys: DataFrame, keyCol: String): DataFrame =
      CountMin.estimate(counters, keys, keyCol, depth, width)
    def merge(other: Sketch): Sketch = {
      require(depth == other.depth && width == other.width,
        s"cannot merge CMS geometries ($depth×$width) and " +
          s"(${other.depth}×${other.width}) — estimates would be garbage")
      Sketch(CountMin.merge(counters, other.counters), depth, width)
    }
  }

  /** [[build]] wrapped with its geometry — the safe default entry. */
  def buildSketch(df: DataFrame, key: Column, depth: Int = 4, width: Int = 256): Sketch =
    Sketch(build(df, key, depth, width), depth, width)
}
