package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: match every point row whose date falls
  * inside an interval [start, end] (inclusive), on an optional equality
  * key. The relational formulation (`p.join(i, p.d >= i.s && p.d <= i.e)`)
  * is an inequality join — Spark plans broadcast-nested-loop or a
  * cartesian, O(|P|·|I|): the classic scale killer.
  *
  * This implementation BUCKETIZES instead (the standard interval-join
  * decomposition): each interval explodes to the days it covers, each
  * point derives its own day, and the match is a plain equi-join on the
  * day (+ key) — shuffle-partitioned, AQE-skew-handled, O(|P| + |I|·len).
  * A point's day hits at most one exploded row per interval, so no
  * dedup is needed. The fan-out is bounded by `maxDays`, the guard
  * against an unbounded interval silently exploding to millions of rows.
  */
object IntervalJoin {

  /** @param points    rows with a DATE column `pointDate`.
    * @param intervals rows with DATE columns `startCol`/`endCol`
    *                  (inclusive); all its columns pass through.
    * @param maxDays   upper bound on a single interval's covered days —
    *                  exceeded ⇒ analysis-time error via raise_error.
    * @return one row per (interval, matching point): interval columns
    *         then point columns (inner join).
    */
  def pointInInterval(
      points: DataFrame,
      pointDate: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      key: Option[String] = None,
      maxDays: Int = 366): DataFrame = {
    // the guard rides INSIDE the sequence bound so column pruning can
    // never optimize it away (a standalone dropped guard column would be)
    val guardedEnd = when(
      datediff(col(endCol), col(startCol)) >= maxDays,
      raise_error(concat(
        lit(s"interval longer than maxDays=$maxDays: "),
        col(startCol).cast("string"), lit(" .. "), col(endCol).cast("string"))).cast("date"))
      .otherwise(col(endCol))
    val exploded = intervals
      .withColumn("__day", explode(sequence(col(startCol), guardedEnd, expr("interval 1 day"))))
    val keyed = points.withColumn("__day", col(pointDate).cast("date"))
    val joinCols = "__day" +: key.toSeq
    exploded.join(keyed, joinCols).drop("__day")
  }
}
