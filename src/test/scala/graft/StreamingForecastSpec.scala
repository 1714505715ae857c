package graft

import graft.operators.Forecast
import graft.streaming.StreamingForecast
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming Holt forecasting: in-order batches fold into exactly the
  * batch kernel's final state; late points are dropped; lone points
  * wait for a second observation before forecasting. */
class StreamingForecastSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def mkStream() = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    MemoryStream[(String, Int, Double)]
  }

  private def toSeries(df: org.apache.spark.sql.DataFrame) =
    df.toDF("key", "d", "value")
      .select($"key", date_add(lit("2024-01-01").cast("date"), $"d").as("period"), $"value")

  test("in-order batches reproduce the batch kernel's state bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fc").toString
    val in = mkStream()
    val q = StreamingForecast.start(
      toSeries(in.toDF()),
      statePath = s"$dir/state", outPath = s"$dir/out", checkpoint = s"$dir/ckpt")

    val rows = (0 until 20).map(d => ("K1", d, 10.0 + 3.0 * d + (if (d % 2 == 0) -1.0 else 1.0))) ++
      (0 until 8).map(d => ("K2", d, 100.0 - 2.0 * d))
    in.addData(rows.filter(_._2 < 7))
    q.processAllAvailable()
    in.addData(rows.filter(r => r._2 >= 7 && r._2 < 13))
    q.processAllAvailable()
    in.addData(rows.filter(_._2 >= 13))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(s"$dir/state")
      .select($"key", $"n", $"level", $"trend")
      .as[(String, Long, Double, Option[Double])].collect().sortBy(_._1)
    val batch = Forecast
      .holt(toSeries(rows.toDF("key", "d", "value")), 0.5, 0.5, horizon = 7)
      .collect().sortBy(_.key)
    assert(streamed.map(_._1).toSeq == batch.map(_.key).toSeq)
    streamed.zip(batch).foreach { case ((k, n, level, trend), b) =>
      assert(n == b.n, k)
      assert(level == b.level, s"$k level: streamed $level vs batch ${b.level}")
      assert(trend.contains(b.trend), s"$k trend: streamed $trend vs batch ${b.trend}")
    }
    // every touched key with a defined trend forecast in every batch
    val out = spark.read.parquet(s"$dir/out")
    assert(out.filter($"key" === "K1").count() == 3)
    assert(out.filter($"key" === "K2").count() == 2) // K2 absent from batch 2
  }

  test("late points are dropped; a lone first point emits no forecast") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fc2").toString
    val in = mkStream()
    val q = StreamingForecast.start(
      toSeries(in.toDF()),
      statePath = s"$dir/state", outPath = s"$dir/out", checkpoint = s"$dir/ckpt")

    in.addData(Seq(("K1", 5, 50.0))) // lone point: state n=1, no forecast
    q.processAllAvailable()
    val s1 = spark.read.parquet(s"$dir/state")
      .select($"n", $"trend".isNull).as[(Long, Boolean)].collect()
    assert(s1.toSeq == Seq((1L, true)))
    assert(
      !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/out")) ||
        spark.read.parquet(s"$dir/out").count() == 0)

    in.addData(Seq(("K1", 3, 999.0), ("K1", 6, 60.0))) // d=3 is late -> dropped
    q.processAllAvailable()
    q.stop()
    val s2 = spark.read.parquet(s"$dir/state")
      .select($"n", $"level", $"trend").as[(Long, Double, Option[Double])].collect()
    assert(s2.toSeq == Seq((2L, 60.0, Some(10.0)))) // trend from (50, 60), not 999
    val out = spark.read.parquet(s"$dir/out")
      .select($"forecast").as[Double].collect()
    assert(out.toSeq == Seq(60.0 + 7 * 10.0))
  }
}
