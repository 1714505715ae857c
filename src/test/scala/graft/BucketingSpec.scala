package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Locks the scale property bucketing exists for: a join of two tables
  * bucketed on the join key plans with NO shuffle exchange on either
  * side (bucket-wise local join), where the same join on plain tables
  * shuffles both. */
class BucketingSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val a = (1 to 1000).map(i => (s"K${i % 100}", i.toLong, i * 1.5)).toDF("key", "seq", "v1")
    val b = (1 to 1000).map(i => (s"K${i % 100}", i.toLong, i * 0.5)).toDF("key", "seq", "v2")
    Bucketing.writeBucketed(a, "bkt_a", "key", 8)
    Bucketing.writeBucketed(b, "bkt_b", "key", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a real (non-broadcast) join so the exchange question is live
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = Bucketing.readBucketed(spark, "bkt_a")
        .groupBy("key").agg(sum($"v1").as("s1"))
        .join(
          Bucketing.readBucketed(spark, "bkt_b").groupBy("key").agg(sum($"v2").as("s2")),
          Seq("key"))
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange"),
        s"bucketed join/agg must not shuffle:\n$bucketedPlan")

      val plain = a.groupBy("key").agg(sum($"v1").as("s1"))
        .join(b.groupBy("key").agg(sum($"v2").as("s2")), Seq("key"))
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"), "control: plain join shuffles")

      // and the answers agree
      val x = bucketed.orderBy("key").collect().map(_.toString)
      val y = plain.orderBy("key").collect().map(_.toString)
      assert(x.sameElements(y))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
