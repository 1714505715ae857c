package graft

import graft.functions.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("exactDistinctPerKey equals countDistinct (nulls excluded)") {
    val df = (1 to 5000).map(i =>
      (if (i % 10 == 0) "hot" else s"k${i % 50}",
        if (i % 97 == 0) null.asInstanceOf[Integer] else Integer.valueOf(i % 700)))
      .toDF("key", "value")
    val fast = Skew.exactDistinctPerKey(df, "key", "value")
      .as[(String, Long)].collect().toMap
    val ref = df.groupBy("key").agg(countDistinct($"value").as("d"))
      .as[(String, Long)].collect().toMap
    assert(fast == ref)
  }

  test("approx_count_distinct tracks exact within its error bound (A2 scale option)") {
    val df = (1 to 20000).map(i => i % 3000).toDF("v")
    val exact = df.agg(countDistinct($"v")).as[Long].head()
    val approx = df.agg(approx_count_distinct($"v", 0.02)).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("csv and json source/sink roundtrip preserves the canonical series") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val series = (1 to 50).map(i => (s"K${i % 5}", f"2024-${i % 12 + 1}%02d-01", i * 1.5))
      .toDF("key", "period", "value")
    for (fmt <- Seq("csv", "json")) {
      val opts = if (fmt == "csv") Map("header" -> "true", "inferSchema" -> "true") else Map.empty[String, String]
      graft.sources.Tables.writeAs(series, s"$dir/$fmt", fmt, options = opts)
      val back = graft.sources.Tables.loadAs(spark, s"$dir/$fmt", fmt, opts)
        .select($"key", $"period".cast("string").as("period"), $"value".cast("double"))
      assert(back.count() == 50)
      assert(back.except(series).count() == 0 && series.except(back).count() == 0)
    }
  }

  test("saltedSample bounds per-key sample size and keeps only that key's rows") {
    val df = (1 to 2000).map(i => ("hot", i, s"p$i")).toDF("key", "id", "payload")
    val out = Skew.saltedSample(df, "key", $"payload", saltBuckets = 8, perSaltLimit = 10,
      rowId = $"id")
      .select($"key", size($"sample").as("n")).as[(String, Int)].head()
    assert(out._1 == "hot" && out._2 <= 80 && out._2 > 0)
  }

  test("saltedSample spreads a hot key with CONSTANT payload across salt buckets") {
    // the case a payload-hash salt would collapse into one bucket: the
    // row-id salt keeps every bucket bounded
    val df = (1 to 2000).map(i => ("hot", i, "same-payload")).toDF("key", "id", "payload")
    val out = Skew.saltedSample(df, "key", $"payload", saltBuckets = 8, perSaltLimit = 10,
      rowId = $"id")
      .select(size($"sample").as("n")).as[Int].head()
    assert(out > 10, s"expected multiple salt buckets to contribute, got $out rows")
    assert(out <= 80)
  }
}
