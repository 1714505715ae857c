package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression locks: the scale properties the engine
  * promises (pushdown, pruning, broadcasts, no accidental cartesians)
  * asserted against the executed plans of registered queries. */
class PlanSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q1: filter pushed to parquet and columns pruned") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), "column pruning lost: reads unneeded columns")
  }

  test("q5: top-k becomes TakeOrderedAndProject, not global sort") {
    val p = plan("q5_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("m5: per-entity tables broadcast; no cartesian product") {
    val p = plan("m5_corr_mapping")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("m3: lag scan is window + partial-aggregated corr, no join of exploded table") {
    val p = plan("m3_lag_corr")
    assert(p.contains("Window"), p)
    assert(p.contains("partial_corr") || p.contains("HashAggregate"), p)
    // the old formulation self-joined after the lag explode
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("d7: LSH candidates come from an equi-join, not a cross join") {
    val p = plan("d7_embed_lsh")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("d14: banded LSH candidates come from an equi-join on (band, bucket)") {
    val p = plan("d14_embed_lsh_bands")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("q23: describe is ONE aggregate pass (no per-column re-scan)") {
    val p = plan("q23_describe")
    // one scan of lineitem feeding one aggregate; a per-column union of
    // aggregates would show three scans
    assert(p.split("Scan parquet").length - 1 == 1, p)
  }

  test("no registered query plans a CartesianProduct") {
    // BroadcastNestedLoopJoin is allowed only where intentional (d6 brute
    // force, single-row stat crosses in m9/q8)
    SparkEntry.queries.keys.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
    }
  }
}
