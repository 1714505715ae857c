package graft

import graft.streaming.StreamingShift
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming level-shift monitor: quiet history stays silent, a step
  * change alerts in the micro-batch whose day completes the window,
  * and the history state stays pruned to 2·w rows per key. */
class StreamingShiftSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def day(d: Int): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d))

  test("step change alerts within its batch; quiet batches stay silent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shift").toString

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Int, Double)]
    val q = StreamingShift.start(
      in.toDF().toDF("key", "d", "value")
        .select($"key", date_add(lit("2024-01-01").cast("date"), $"d").as("period"), $"value"),
      historyPath = s"$dir/hist", outPath = s"$dir/out", checkpoint = s"$dir/ckpt")

    // batch 0: 14 quiet days around 10 (alternating +/-0.5 noise)
    in.addData((0 until 14).map(d => ("K1", d, 10.0 + (if (d % 2 == 0) -0.5 else 0.5))))
    q.processAllAvailable()
    assert(
      !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/out")) ||
        spark.read.parquet(s"$dir/out").count() == 0,
      "quiet history must not alert")

    // batch 1: 7 days at the new level 30 — day 20 completes a recent
    // window fully post-step vs a prior window fully pre-step
    in.addData((14 until 21).map(d => ("K1", d, 30.0 + (if (d % 2 == 0) -0.5 else 0.5))))
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() > 0, "step change must alert")
    val alerts = out.select($"key", $"period".cast("string"), $"shift_z", $"batch_id")
      .as[(String, String, Double, Long)].collect()
    assert(alerts.forall(_._1 == "K1"))
    assert(alerts.forall(_._4 == 1L), "alerts must carry the batch that completed them")
    assert(alerts.exists(a => math.abs(a._3) > 3.0))
    // state stays bounded: at most 2*w rows per key
    assert(spark.read.parquet(s"$dir/hist").count() <= 14)
  }

  test("replayed (key, period) rows upsert: the batch value wins") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shift2").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Int, Double)]
    val q = StreamingShift.start(
      in.toDF().toDF("key", "d", "value")
        .select($"key", date_add(lit("2024-01-01").cast("date"), $"d").as("period"), $"value"),
      historyPath = s"$dir/hist", outPath = s"$dir/out", checkpoint = s"$dir/ckpt")
    in.addData(Seq(("K1", 0, 999.0)))
    q.processAllAvailable()
    in.addData(Seq(("K1", 0, 1.0))) // correction for the same day
    q.processAllAvailable()
    q.stop()
    val hist = spark.read.parquet(s"$dir/hist")
      .select($"period".cast("string"), $"value").as[(String, Double)].collect()
    assert(hist.toSeq == Seq(("2024-01-01", 1.0)))
  }
}
