package graft

import graft.functions.CountMin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min sketch: the paper guarantees that hold deterministically
  * (never-underestimate for EVERY key, cell-wise linearity of merge),
  * plus the null-key rule. The probabilistic εN bound is not asserted —
  * it holds per (random) hash family, and ours is one fixed portable
  * family; q44's overcount column reports the realized inflation. */
class CountMinSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val depth = 3
  private val width = 16 // deliberately tiny: forces collisions

  test("estimates never underestimate, for every key in the stream") {
    val events = (1 to 40).flatMap(i => Seq.fill(i % 7 + 1)(s"k$i")).toDF("k")
    val sketch = CountMin.build(events, col("k"), depth, width)
    val exact = events.groupBy(col("k")).agg(count(lit(1)).as("true_n"))
    val checked = CountMin.estimate(sketch, exact.select(col("k")), "k", depth, width)
      .join(exact, Seq("k"))
      .select(col("k"), col("est"), col("true_n"))
      .collect()
    assert(checked.length === 40)
    checked.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("true_n"),
        s"underestimate for ${r.getString(0)}: $r")
    }
  }

  test("linearity: sketch(A union B) == merge(sketch(A), sketch(B)) cell-for-cell") {
    val a = (1 to 30).map(i => s"k${i % 9}").toDF("k")
    val b = (1 to 20).map(i => s"k${i % 5}").toDF("k")
    val whole = CountMin.build(a.unionByName(b), col("k"), depth, width)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val merged = CountMin.merge(
      CountMin.build(a, col("k"), depth, width),
      CountMin.build(b, col("k"), depth, width))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(whole === merged)
  }

  test("geometry mismatches are rejected instead of silently underestimating") {
    val events = Seq("a", "b", "c").toDF("k")
    // the guarantee-breaking case: built wide, probed narrow — the min
    // would land on foreign cells and could read BELOW the true count
    val wide = CountMin.build(events, col("k"), depth, width = 4096)
    val ex = intercept[IllegalArgumentException] {
      CountMin.estimate(wide, Seq("a").toDF("k"), "k", depth, width = 256).collect()
    }
    assert(ex.getMessage.contains("outside the probe geometry"))
    // the carried-geometry wrapper can't mismatch, and refuses to merge
    // incompatible sketches
    val s1 = CountMin.buildSketch(events, col("k"), depth, width = 4096)
    assert(s1.estimate(Seq("a").toDF("k"), "k")
      .select(col("est")).as[Long].head() === 1L)
    val s2 = CountMin.buildSketch(events, col("k"), depth, width = 256)
    assert(intercept[IllegalArgumentException](s1.merge(s2))
      .getMessage.contains("cannot merge CMS geometries"))
    // matching-geometry merge through the wrapper still adds cell-wise
    val m = s1.merge(CountMin.buildSketch(events, col("k"), depth, width = 4096))
    assert(m.estimate(Seq("a").toDF("k"), "k")
      .select(col("est")).as[Long].head() === 2L)
  }

  test("negative coordinates (a signed-mod foreign table) are rejected loudly") {
    // a table built elsewhere with key.hashCode % width can carry
    // NEGATIVE c; the join would never hit and every estimate would
    // silently read 0 — below the true count, breaking est >= true
    val bogus = Seq((0, -3, 10L), (1, 5, 10L)).toDF("r", "c", "cnt")
    val ex = intercept[IllegalArgumentException] {
      CountMin.estimate(bogus, Seq("a").toDF("k"), "k", depth, 256).collect()
    }
    assert(ex.getMessage.contains("outside the probe geometry"))
  }

  test("null keys are dropped; unseen keys estimate 0 when their cells are empty") {
    val events = Seq(Some("a"), None, Some("a"), Some("b"), None).toDF("k")
    val sketch = CountMin.build(events, col("k"), depth, width = 4096)
    // total mass = 3 non-null events per row
    val mass = sketch.groupBy(col("r")).agg(sum(col("cnt")).as("m"))
      .select(col("m")).as[Long].collect()
    assert(mass.length === depth && mass.forall(_ === 3L))
    // a key whose cells nothing hashed into reads 0 (width 4096, 2 keys
    // -> collision odds negligible; the fixed portable family makes this
    // deterministic, not flaky)
    val est = CountMin.estimate(sketch, Seq("zzz-unseen").toDF("k"), "k", depth, 4096)
      .select(col("est")).as[Long].head()
    assert(est === 0L)
  }
}
