package graft

import graft.functions.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("exactDistinctPerKey equals countDistinct") {
    val df = (1 to 5000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 50}", i % 700))
      .toDF("key", "value")
    val fast = Skew.exactDistinctPerKey(df, "key", "value")
      .as[(String, Long)].collect().toMap
    val ref = df.groupBy("key").agg(countDistinct($"value").as("d"))
      .as[(String, Long)].collect().toMap
    assert(fast == ref)
  }

  test("saltedSample bounds per-key sample size and keeps only that key's rows") {
    val df = (1 to 2000).map(i => ("hot", s"p$i")).toDF("key", "payload")
    val out = Skew.saltedSample(df, "key", $"payload", saltBuckets = 8, perSaltLimit = 10)
      .select($"key", size($"sample").as("n")).as[(String, Int)].head()
    assert(out._1 == "hot" && out._2 <= 80 && out._2 > 0)
  }
}
