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
    assert(StreamingShift.historySnapshot(spark, s"$dir/hist").count() <= 14)
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
    val hist = StreamingShift.historySnapshot(spark, s"$dir/hist")
      .select($"period".cast("string"), $"value").as[(String, Double)].collect()
    assert(hist.toSeq == Seq(("2024-01-01", 1.0)))
  }

  test("a torn history write (no _SUCCESS) is invisible; recovery commits over it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shift3").toString
    def run(rows: Seq[(String, Int, Double)], batchId: Long): Unit =
      StreamingShift.processBatch(
        rows.toDF("key", "d", "value")
          .select($"key", date_add(lit("2024-01-01").cast("date"), $"d").as("period"), $"value"),
        batchId, s"$dir/hist", s"$dir/out", 7, 3.0)
    run((0 until 5).map(d => ("K1", d, 10.0)), 0L)
    // crash mid-write of batch 1: version dir without the commit marker
    val torn = new java.io.File(s"$dir/hist", "v" + "%019d".format(1L))
    torn.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(torn.toString, "part-00000.parquet"), Array[Byte](1, 2, 3))
    assert(
      StreamingShift.historySnapshot(spark, s"$dir/hist").count() == 5,
      "torn version must not be read")
    // replay of batch 1 commits over the torn dir; the upsert keeps the
    // accumulated 5-day window plus the new day
    run(Seq(("K1", 5, 10.0)), 1L)
    val after = StreamingShift.historySnapshot(spark, s"$dir/hist")
      .select($"period".cast("string")).as[String].collect().sorted
    assert(after.length == 6 && after.head == "2024-01-01" && after.last == "2024-01-06")
    val versions = new java.io.File(s"$dir/hist").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(versions.length <= 2 && versions.max == "v" + "%019d".format(1L), versions.toSeq)
  }

  test("a replayed batch replaces its own alerts and history (idempotent)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shift4").toString
    def run(rows: Seq[(String, Int, Double)], batchId: Long): Unit =
      StreamingShift.processBatch(
        rows.toDF("key", "d", "value")
          .select($"key", date_add(lit("2024-01-01").cast("date"), $"d").as("period"), $"value"),
        batchId, s"$dir/hist", s"$dir/out", 7, 3.0)
    run((0 until 14).map(d => ("K1", d, 10.0 + (if (d % 2 == 0) -0.5 else 0.5))), 0L)
    val shifted = (14 until 21).map(d => ("K1", d, 30.0 + (if (d % 2 == 0) -0.5 else 0.5)))
    run(shifted, 1L)
    def alerts() = spark.read.parquet(s"$dir/out")
      .collect().map(_.toSeq).sortBy(_.toString)
    def hist() = StreamingShift.historySnapshot(spark, s"$dir/hist")
      .collect().map(_.toSeq).sortBy(_.toString)
    val alertsOnce = alerts()
    val histOnce = hist()
    assert(alertsOnce.nonEmpty, "the step must alert")
    run(shifted, 1L) // crash-window replay of the same batch id
    assert(alerts().sameElements(alertsOnce), "replay duplicated alerts")
    assert(hist().sameElements(histOnce), "replay changed the history")
  }
}
