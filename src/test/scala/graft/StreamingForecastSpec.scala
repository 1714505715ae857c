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

    val streamed = StreamingForecast.stateSnapshot(spark, s"$dir/state")
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

  test("a replayed batch re-emits identical forecasts (crash between output and state)") {
    // the failure window the write ordering defends: output written,
    // state NOT yet overwritten, batch retried. The replay re-folds from
    // the OLD state and dynamic-overwrites its own batch_id partition —
    // output and state must end exactly as a single clean run's.
    val dir = java.nio.file.Files.createTempDirectory("graft_fc3").toString
    def copyTree(from: String, to: String): Unit = {
      import scala.jdk.CollectionConverters._
      val src = java.nio.file.Paths.get(from)
      val walk = java.nio.file.Files.walk(src)
      val paths = try walk.iterator().asScala.toSeq finally walk.close()
      paths.foreach { p =>
        val t = java.nio.file.Paths.get(to).resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else {
          java.nio.file.Files.createDirectories(t.getParent)
          java.nio.file.Files.copy(p, t)
        }
      }
    }
    def rmTree(path: String): Unit = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        val paths = try walk.iterator().asScala.toSeq finally walk.close()
        paths.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    def run(rows: Seq[(String, Int, Double)], batchId: Long): Unit =
      StreamingForecast.processBatch(
        toSeries(rows.toDF("key", "d", "value")), batchId,
        s"$dir/state", s"$dir/out", 0.5, 0.5, 7)

    run(Seq(("K1", 0, 10.0), ("K1", 1, 12.0), ("K2", 0, 5.0)), 0L)
    copyTree(s"$dir/state", s"$dir/state_before_b1")
    run(Seq(("K1", 2, 14.0), ("K2", 1, 6.0)), 1L)
    def snap(path: String) = spark.read.parquet(path)
      .select($"key", $"n", $"level", $"trend", $"forecast", $"batch_id".cast("long"))
      .collect().map(_.toSeq).sortBy(_.toString)
    def snapState() = StreamingForecast.stateSnapshot(spark, s"$dir/state")
      .collect().map(_.toSeq).sortBy(_.toString)
    val outOnce = snap(s"$dir/out")
    val stateOnce = snapState()
    // crash simulation: b1's output survived, its state write did not
    rmTree(s"$dir/state")
    copyTree(s"$dir/state_before_b1", s"$dir/state")
    run(Seq(("K1", 2, 14.0), ("K2", 1, 6.0)), 1L) // the retry
    assert(snap(s"$dir/out").sameElements(outOnce), "replay changed the output table")
    assert(snapState().sameElements(stateOnce), "replay changed the folded state")
  }

  test("a torn state write (no _SUCCESS) is invisible; recovery commits over it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fc4").toString
    def run(rows: Seq[(String, Int, Double)], batchId: Long): Unit =
      StreamingForecast.processBatch(
        toSeries(rows.toDF("key", "d", "value")), batchId,
        s"$dir/state", s"$dir/out", 0.5, 0.5, 7)
    run(Seq(("K1", 0, 10.0), ("K1", 1, 12.0)), 0L)
    // simulate a crash mid-write of batch 1: the version dir exists with
    // partial data but never got its _SUCCESS commit marker
    val torn = new java.io.File(s"$dir/state", "v" + "%019d".format(1L))
    torn.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(torn.toString, "part-00000.parquet"), Array[Byte](1, 2, 3))
    val snap = StreamingForecast.stateSnapshot(spark, s"$dir/state")
      .select($"n", $"level").as[(Long, Double)].collect()
    assert(snap.toSeq == Seq((2L, 12.0)), "torn version must not be read")
    // the checkpoint replays batch 1: the fold reads the committed v0
    // state, overwrites the torn dir, and commits
    run(Seq(("K1", 2, 14.0)), 1L)
    val after = StreamingForecast.stateSnapshot(spark, s"$dir/state")
      .select($"n", $"level", $"trend").as[(Long, Double, Option[Double])].collect()
    assert(after.map(_._1).toSeq == Seq(3L))
    val versions = new java.io.File(s"$dir/state").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(versions.length <= 2 && versions.max == "v" + "%019d".format(1L), versions.toSeq)
  }

  test("late points are dropped; a lone first point emits no forecast") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fc2").toString
    val in = mkStream()
    val q = StreamingForecast.start(
      toSeries(in.toDF()),
      statePath = s"$dir/state", outPath = s"$dir/out", checkpoint = s"$dir/ckpt")

    in.addData(Seq(("K1", 5, 50.0))) // lone point: state n=1, no forecast
    q.processAllAvailable()
    val s1 = StreamingForecast.stateSnapshot(spark, s"$dir/state")
      .select($"n", $"trend".isNull).as[(Long, Boolean)].collect()
    assert(s1.toSeq == Seq((1L, true)))
    assert(
      !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/out")) ||
        spark.read.parquet(s"$dir/out").count() == 0)

    in.addData(Seq(("K1", 3, 999.0), ("K1", 6, 60.0))) // d=3 is late -> dropped
    q.processAllAvailable()
    q.stop()
    val s2 = StreamingForecast.stateSnapshot(spark, s"$dir/state")
      .select($"n", $"level", $"trend").as[(Long, Double, Option[Double])].collect()
    assert(s2.toSeq == Seq((2L, 60.0, Some(10.0)))) // trend from (50, 60), not 999
    val out = spark.read.parquet(s"$dir/out")
      .select($"forecast").as[Double].collect()
    assert(out.toSeq == Seq(60.0 + 7 * 10.0))
  }
}
