package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hll

class HllSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("estimate lands within the 3-sigma band on a 10k-distinct stream") {
    // duplicated stream: distinctness, not volume, must drive the sketch
    val keys = spark.range(10000).select(concat(lit("k"), col("id")).as("k"))
    val stream = keys.unionByName(keys).unionByName(keys)
    val est = Hll.estimate(Hll.registers(stream, col("k")))
    // sigma ~ 1.04/sqrt(256) = 6.5%; 3 sigma ~ 19.5%
    assert(math.abs(est - 10000) / 10000 < 0.195, s"est=$est")
  }

  test("registers are a monoid: merge == registers of the union") {
    val a = spark.range(0, 3000).select(concat(lit("k"), col("id")).as("k"))
    val b = spark.range(2000, 6000).select(concat(lit("k"), col("id")).as("k"))
    val merged = Hll.merge(Hll.registers(a, col("k")), Hll.registers(b, col("k")))
      .orderBy("bucket").as[(Int, Int)].collect().toSeq
    val direct = Hll.registers(a.unionByName(b), col("k"))
      .orderBy("bucket").as[(Int, Int)].collect().toSeq
    assert(merged == direct)
    // and the estimate is identical through either path (the
    // incremental-maintenance contract: per-batch sketches, merged reads)
    assert(Hll.estimate(Hll.merge(Hll.registers(a, col("k")), Hll.registers(b, col("k"))))
      == Hll.estimate(Hll.registers(a.unionByName(b), col("k"))))
  }

  test("grouped registers equal per-group plain registers; estimates track truth") {
    val df = spark.range(30000).select(
      concat(lit("g"), pmod(col("id"), lit(3))).as("grp"),
      // group g0 sees 10k distinct keys, g1/g2 see the same 10k each —
      // per-group distinctness, not global, must drive each sketch
      concat(lit("k"), (col("id") / 3).cast("long")).as("k"))
    val grouped = Hll.groupedRegisters(df, col("grp"), col("k"))
    (0 until 3).foreach { g =>
      val direct = Hll.registers(df.filter(col("grp") === s"g$g"), col("k"))
        .as[(Int, Int)].collect().sortBy(_._1).toSeq
      val slice = grouped.filter(col("grp") === s"g$g")
        .select($"bucket", $"max_rank").as[(Int, Int)].collect().sortBy(_._1).toSeq
      assert(slice == direct, s"group g$g registers diverge from the ungrouped build")
    }
    Hll.groupedEstimates(grouped).foreach { case (g, est) =>
      assert(math.abs(est - 10000) / 10000 < 0.195, s"group $g est=$est")
    }
  }

  test("null groups are dropped, not sketched — and never NPE the fold") {
    val df = Seq(
      (Option("g0"), "a"), (Option("g0"), "b"),
      (Option.empty[String], "c"), (Option.empty[String], "d")
    ).toDF("grp", "k")
    val regs = Hll.groupedRegisters(df, col("grp"), col("k"))
    // null-group rows carry no group signal: only g0 appears
    assert(regs.select("grp").distinct().as[String].collect().toSeq == Seq("g0"))
    val ests = Hll.groupedEstimates(regs)
    assert(ests.map(_._1) == Seq("g0"))
    // and a register table from a FOREIGN producer that does carry a
    // null group is filtered, not crashed on (the defensive twin)
    val foreign = Seq((Option("g0"), 1, 3), (Option.empty[String], 2, 5))
      .toDF("grp", "bucket", "max_rank")
    assert(Hll.groupedEstimates(foreign).map(_._1) == Seq("g0"))
  }

  test("register table is bounded by m and ranks stay in [1, 53]") {
    val regs = Hll.registers(
      spark.range(100000).select(col("id").cast("string").as("k")), col("k"))
      .as[(Int, Int)].collect()
    assert(regs.length <= Hll.numBuckets)
    assert(regs.forall { case (b, r) => b >= 0 && b < 256 && r >= 1 && r <= 53 })
  }

  test("the shuffle is partial-aggregated (map-side combine before exchange)") {
    val plan = Hll.registers(
      spark.range(1000).select(col("id").cast("string").as("k")), col("k"))
      .queryExecution.executedPlan.toString()
    // partial max below the exchange, final max above: the m-rows-per-
    // partition shuffle contract
    assert(plan.contains("partial_max") || plan.contains("PartialAggregate"), plan)
  }
}
