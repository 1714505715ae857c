package graft

import graft.operators.GlobalOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GlobalOrderSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("distributed numbering equals the single-partition window") {
    // shuffled input: ids 0..9999 in hash order, numbered by a derived key
    val df = spark.range(10000)
      .select($"id", pmod(hash($"id"), lit(100000)).as("key"))
      .repartition(7, $"id")
    val got = GlobalOrder.withRowNumber(df, Seq($"key", $"id"))
      .select($"id", $"global_rn").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("global_rn",
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy($"key", $"id"))
          .cast("long"))
      .select($"id", $"global_rn").as[(Long, Long)].collect().toMap
    assert(got == want)
    // every rank appears exactly once
    assert(got.values.toSeq.sorted == (1L to 10000L))
  }

  test("plan has no single-partition window exchange") {
    val df = spark.range(1000).select($"id", ($"id" % 13).as("key"))
    val plan = GlobalOrder.withRowNumber(df, Seq($"key", $"id"))
      .queryExecution.executedPlan.toString
    // the naive form plans Exchange SinglePartition under the Window;
    // ours must not move everything to one partition
    assert(!plan.contains("SinglePartition"), plan)
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"), plan)
  }

  test("empty partitions and skewed keys still number densely") {
    // heavy ties on key (broken by id) + more partitions than rows
    val df = Seq.tabulate(40)(i => (i.toLong, (i % 3).toLong)).toDF("id", "key")
    val got = GlobalOrder
      .withRowNumber(df, Seq($"key", $"id"), numPartitions = Some(64))
      .select($"global_rn").as[Long].collect().sorted
    assert(got.toSeq == (1L to 40L))
  }
}
