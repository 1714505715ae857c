package graft

import graft.functions.IncrementalAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalAggSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  /** 3 slices × 2 groups of skewed doubles; user ids overlap across
    * slices so the HLL union must actually de-duplicate. */
  private def sample() = Seq(
    ("2024-01-01", "a", 1.25, 1L), ("2024-01-01", "a", 2.50, 2L),
    ("2024-01-01", "b", -4.75, 1L),
    ("2024-01-02", "a", 10.00, 2L), ("2024-01-02", "b", 0.25, 3L),
    ("2024-01-02", "b", 7.75, 3L),
    ("2024-01-03", "a", -1.00, 1L), ("2024-01-03", "b", 3.25, 4L)
  ).toDF("day", "grp", "value", "uid")

  private def states(df: org.apache.spark.sql.DataFrame) =
    IncrementalAgg.partialStates(df, col("day"), Seq(col("grp")), col("value"), col("uid"))

  test("merged partial states equal the direct aggregate") {
    val df = sample()
    val merged = IncrementalAgg.mergeStates(states(df), Seq("grp"))
    val direct = df.groupBy($"grp").agg(
      count(lit(1)).as("d_n"),
      sum($"value".cast("decimal(18,2)")).cast("double").as("d_total"),
      min($"value").as("d_min"),
      max($"value").as("d_max"),
      countDistinct($"uid").as("d_users"))
    val got = merged.join(direct, Seq("grp")).collect()
    assert(got.length == 2)
    got.foreach { r =>
      assert(r.getAs[Long]("n_rows") == r.getAs[Long]("d_n"), r.toString)
      assert(r.getAs[Double]("total_value") == r.getAs[Double]("d_total"), r.toString)
      assert(r.getAs[Double]("min_value") == r.getAs[Double]("d_min"), r.toString)
      assert(r.getAs[Double]("max_value") == r.getAs[Double]("d_max"), r.toString)
      // tiny cardinalities: the HLL estimate (LongType) must be exact
      assert(r.getAs[Long]("distinct_est") == r.getAs[Long]("d_users"), r.toString)
    }
  }

  test("one new slice only rewrites its own partition; rollup reads merge it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_incr_agg").toString
    val df = sample()
    // days 1-2 are "history"
    IncrementalAgg.writeStates(states(df.filter($"day" < "2024-01-03")), dir)
    val before = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(before.exists(_.startsWith("slice=2024-01-01")) &&
      before.exists(_.startsWith("slice=2024-01-02")))
    val d1Files = new java.io.File(s"$dir/slice=2024-01-01").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    // day 3 arrives: write ONLY its slice
    IncrementalAgg.writeStates(states(df.filter($"day" === "2024-01-03")), dir)
    assert(new java.io.File(dir).listFiles().map(_.getName)
      .exists(_.startsWith("slice=2024-01-03")))
    // dynamic overwrite left other slices' files untouched
    val d1After = new java.io.File(s"$dir/slice=2024-01-01").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    assert(d1After == d1Files)
    // full rollup from the store == direct over all raw rows
    val rollup = IncrementalAgg.rollupFromStore(spark, dir, Seq("grp"))
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("total_value"))).toMap
    val direct = df.groupBy($"grp").agg(
      count(lit(1)), sum($"value".cast("decimal(18,2)")).cast("double"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rollup == direct)
  }

  test("windowed rollup partition-prunes the state table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_incr_win").toString
    IncrementalAgg.writeStates(states(sample()), dir)
    val win = IncrementalAgg.rollupFromStore(
      spark, dir, Seq("grp"), sliceFrom = Some("2024-01-02"), sliceTo = Some("2024-01-03"))
    val plan = win.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("slice"), plan)
    // and the window math is right: slice-1 rows excluded
    val got = win.collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("n_rows")).toMap
    assert(got == Map("a" -> 2L, "b" -> 3L))
  }

  test("merge is associative: merging pre-merged halves equals one merge") {
    val df = sample()
    val s1 = states(df.filter($"day" <= "2024-01-01"))
    val s2 = states(df.filter($"day" > "2024-01-01"))
    // re-state the halves' merges as mergeable inputs is NOT the contract
    // (mergeStates estimates the HLL); instead assert state-table union
    // order never matters for the exact fields
    val a = IncrementalAgg.mergeStates(s1.unionByName(s2), Seq("grp"))
    val b = IncrementalAgg.mergeStates(s2.unionByName(s1), Seq("grp"))
    val ka = a.orderBy("grp").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val kb = b.orderBy("grp").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(ka.sameElements(kb))
  }
}
