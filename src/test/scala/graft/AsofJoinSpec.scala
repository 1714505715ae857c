package graft

import graft.operators.{AsofJoin, IntervalJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // deterministic fixture: keys with interleaved left/right rows, a key
  // with no right rows, a key with only right rows, equal-ts collisions
  private def fixture: (DataFrame, DataFrame) = {
    val left = Seq(
      ("a", 100L, "l1"), ("a", 205L, "l2"), ("a", 300L, "l3"),
      ("b", 50L, "l4"), ("b", 400L, "l5"),
      ("c", 10L, "l6"), // no right rows for c
      ("d", 200L, "l7") // equal-ts: right at exactly 200
    ).toDF("k", "lts", "lpayload")
    val right = Seq(
      ("a", 90L, 1.0), ("a", 200L, 2.0), ("a", 205L, 3.0), ("a", 299L, 4.0),
      ("b", 60L, 5.0), ("b", 399L, 6.0),
      ("d", 200L, 7.0), ("e", 1L, 8.0) // right-only key e never surfaces
    ).toDF("k", "rts", "rvalue")
    (left, right)
  }

  /** Reference implementation: the naive inequality join + per-left argmax
    * (what the operator must agree with, minus the plan shape). */
  private def naive(left: DataFrame, right: DataFrame, tol: Option[Long]): DataFrame = {
    val j = left.join(right, Seq("k"), "left")
      .filter(col("rts").isNull || (col("rts") <= col("lts") &&
        tol.map(t => col("lts") - col("rts") <= t).getOrElse(lit(true))))
    val w = Window.partitionBy(col("k"), col("lts"))
      .orderBy(col("rts").desc_nulls_last, col("rvalue").desc_nulls_last)
    // keep rows whose best match survives, re-attach all-left rows after
    val best = j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("k"), col("lts"), col("lpayload"), col("rts"), col("rvalue"))
    val matchedKeys = best.select(col("k"), col("lts"))
    val unmatched = left.join(matchedKeys, Seq("k", "lts"), "left_anti")
      .withColumn("rts", lit(null).cast("long"))
      .withColumn("rvalue", lit(null).cast("double"))
    best.unionByName(unmatched)
  }

  test("backward as-of matches the naive inequality-join formulation") {
    val (l, r) = fixture
    val got = AsofJoin.asof(l, r, Seq("k"), "lts", "rts")
      .select($"k", $"lts", $"lpayload", $"rts", $"rvalue")
    val want = naive(l, r, None)
    assert(got.count() == l.count()) // every left row survives
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("backward as-of: inclusive equal-ts match and no-match nulls") {
    val (l, r) = fixture
    val m = AsofJoin.asof(l, r, Seq("k"), "lts", "rts")
      .select($"k", $"lts", $"rts", $"rvalue")
      .as[(String, Long, Option[Long], Option[Double])].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(m(("d", 200L)) == (Some(200L), Some(7.0))) // inclusive
    assert(m(("c", 10L)) == (None, None)) // key with no right rows
    assert(m(("a", 205L)) == (Some(205L), Some(3.0))) // own-ts right beats 200
    assert(m(("a", 300L)) == (Some(299L), Some(4.0)))
    assert(m(("b", 50L)) == (None, None)) // right exists but only later
  }

  test("tolerance nulls out matches farther than the bound") {
    val (l, r) = fixture
    val m = AsofJoin.asof(l, r, Seq("k"), "lts", "rts", tolerance = Some(5L))
      .select($"k", $"lts", $"rts").as[(String, Long, Option[Long])].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(m(("a", 300L)) == Some(299L)) // gap 1 <= 5
    assert(m(("a", 100L)) == None) // nearest is 90, gap 10 > 5
    assert(m(("d", 200L)) == Some(200L)) // gap 0
  }

  test("forward as-of picks the earliest right at-or-after") {
    val (l, r) = fixture
    val m = AsofJoin.asof(l, r, Seq("k"), "lts", "rts", forward = true)
      .select($"k", $"lts", $"rts").as[(String, Long, Option[Long])].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(m(("b", 50L)) == Some(60L))
    assert(m(("a", 100L)) == Some(200L))
    assert(m(("a", 300L)) == None) // nothing at-or-after 300
    assert(m(("d", 200L)) == Some(200L)) // inclusive
  }

  test("equal-ts right duplicates resolve deterministically (largest payload wins)") {
    val l = Seq(("k", 100L, "x")).toDF("k", "lts", "lpayload")
    val r = Seq(("k", 100L, 1.0), ("k", 100L, 9.0), ("k", 100L, 4.0)).toDF("k", "rts", "rvalue")
    val rows = (1 to 5).map { _ =>
      AsofJoin.asof(l, r.repartition(4), Seq("k"), "lts", "rts")
        .select($"rvalue").as[Double].head()
    }
    assert(rows.forall(_ == 9.0), s"nondeterministic tie-break: $rows")
  }

  test("plan is the union-window scan: no nested-loop or cartesian join") {
    val (l, r) = fixture
    val plan = AsofJoin.asof(l, r, Seq("k"), "lts", "rts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("interval join matches the inequality-join reference and plans no cartesian") {
    val points = (1 to 200)
      .map(i => (java.sql.Date.valueOf(f"2024-01-${i % 28 + 1}%02d"), i.toLong))
      .toDF("d", "pid")
    val intervals = Seq(
      (java.sql.Date.valueOf("2024-01-05"), java.sql.Date.valueOf("2024-01-09"), "w1"),
      (java.sql.Date.valueOf("2024-01-09"), java.sql.Date.valueOf("2024-01-09"), "w2"), // 1 day
      (java.sql.Date.valueOf("2024-01-20"), java.sql.Date.valueOf("2024-01-31"), "w3")
    ).toDF("istart", "iend", "iname")
    val got = IntervalJoin.pointInInterval(points, "d", intervals, "istart", "iend")
      .select($"iname", $"pid")
    val want = intervals.join(
      points, points("d") >= intervals("istart") && points("d") <= intervals("iend"))
      .select($"iname", $"pid")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    assert(got.count() == want.count()) // no dup fan-out
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("interval join maxDays guard raises on an oversized interval") {
    val points = Seq((java.sql.Date.valueOf("2024-01-01"), 1L)).toDF("d", "pid")
    val intervals = Seq(
      (java.sql.Date.valueOf("2024-01-01"), java.sql.Date.valueOf("2030-01-01"), "huge")
    ).toDF("istart", "iend", "iname")
    val e = intercept[Exception] {
      IntervalJoin.pointInInterval(points, "d", intervals, "istart", "iend", maxDays = 30).count()
    }
    assert(e.getMessage != null)
  }
}
