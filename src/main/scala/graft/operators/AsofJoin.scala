package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single right row with the nearest
  * timestamp at-or-before it (backward, the default) or at-or-after it
  * (forward), matching on equal keys — the standard time-series
  * alignment primitive (trades→quotes, event→latest-state).
  *
  * Spark has no built-in as-of join, and the naive formulation
  * (`l.join(r, keys && l.ts >= r.ts)` + per-left argmax) plans an
  * inequality join: for each key the matcher degenerates to an all-pairs
  * compare — O(|L_k|·|R_k|) per key and a broadcast-nested-loop or
  * cartesian under the hood. This implementation is the UNION-MARKER
  * scan instead: tag right rows 0 and left rows 1, sort each key's rows
  * once by (ts, side), and carry the most recent right payload forward
  * with a running `last(ignoreNulls)` window. ONE shuffle on the key,
  * O(|L_k| + |R_k| log …) per key, merge-join shape — survives a 100×
  * scale-up where the inequality join would not. Skewed keys partial-sort
  * inside Spark's window exec (spill-capable), never collect to one task.
  *
  * Semantics match DuckDB/pandas `ASOF JOIN` (backward, inclusive):
  * left rows with no eligible right row keep NULL payload columns
  * (left-outer). At equal timestamps the right row IS eligible
  * (inclusive). Right rows tied on (key, ts) resolve by `rightTieBreak`
  * descending-last (the LARGEST tie-break value wins, deterministically).
  */
object AsofJoin {

  /** @param left       driving rows; ALL its columns pass through.
    * @param right      lookup rows; its non-key columns are appended
    *                   (left-outer, NULL when no match).
    * @param keys       equality keys present on both sides.
    * @param leftTs     left timestamp column — any orderable type, but
    *                   NUMERIC (e.g. epoch millis) when `tolerance` is set
    *                   (the bound is enforced by subtraction).
    * @param rightTs    right timestamp column, same type as `leftTs`.
    *                   Appears in the output (the matched row's time).
    * @param tolerance  max allowed |leftTs − rightTs|; matches farther
    *                   away than this yield NULLs, as if absent.
    * @param forward    false = nearest right at-or-before (backward);
    *                   true = nearest right at-or-after.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Option[Long] = None,
      forward: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    require(payloadCols.contains(rightTs), s"rightTs '$rightTs' must be a non-key right column")
    val overlap = payloadCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty, s"right payload columns collide with left: ${overlap.mkString(", ")}")

    val leftStructT = org.apache.spark.sql.types.StructType(
      left.schema.fields.filterNot(f => keys.contains(f.name)))
    val rightStructT = org.apache.spark.sql.types.StructType(
      right.schema.fields.filter(f => payloadCols.contains(f.name)))

    val rSide = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        struct(payloadCols.map(col): _*).as("__r"),
        lit(null).cast(leftStructT).as("__l")): _*)
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast(rightStructT).as("__r"),
        struct(left.columns.filterNot(keys.contains).map(col).toSeq: _*).as("__l")): _*)

    // Ordering: right rows at a left row's exact ts must sort BEFORE it
    // (side 0 < 1 ⇒ inclusive match); ties among right rows resolve by
    // the payload struct (deterministic field-wise compare, last wins).
    val ts = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(ts, col("__side").asc, col("__r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedRaw = last(col("__r"), ignoreNulls = true).over(w)
    val matched = tolerance match {
      case None => matchedRaw
      case Some(tol) =>
        val gap =
          if (forward) matchedRaw.getField(rightTs) - col("__ts")
          else col("__ts") - matchedRaw.getField(rightTs)
        when(gap <= tol, matchedRaw) // NULL-safe: NULL gap ⇒ NULL match
    }

    val joined = rSide
      .unionByName(lSide)
      .withColumn("__m", matched)
      .filter(col("__side") === 1)
    val leftOut = (keys.map(col) ++
      leftStructT.fieldNames.toSeq.map(f => col("__l").getField(f).as(f)))
    val rightOut = payloadCols.map(f => col("__m").getField(f).as(f))
    joined.select(leftOut ++ rightOut: _*)
  }
}
