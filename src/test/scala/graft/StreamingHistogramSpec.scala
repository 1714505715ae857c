package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HistogramSketch
import graft.streaming.StreamingHistogram

/** Streaming histogram: additive stream fold equals the batch sketch
  * exactly (monoid parity), the batch_id stamp makes replays no-ops
  * (addition is NOT naturally idempotent — the stamp is load-bearing),
  * and torn state writes recover. */
class StreamingHistogramSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("stream fold equals the batch histogram of the concatenated stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shist").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Double]
    val (lo, hi, bins) = (0.0, 1000.0, 64)
    val q = StreamingHistogram.start(
      in.toDF().toDF("x"), col("x"),
      statePath = s"$dir/state", checkpoint = s"$dir/ckpt", lo = lo, hi = hi, bins = bins)
    val b1 = (0 until 4000).map(i => (i % 1000).toDouble)
    val b2 = (0 until 2000).map(i => (i % 500) + 500.0)
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    q.stop()

    val streamed = StreamingHistogram.snapshot(spark, s"$dir/state")
      .select($"bin", $"cnt").as[(Int, Long)].collect().sortBy(_._1).toSeq
    val batch = HistogramSketch
      .build((b1 ++ b2).toDF("x"), col("x"), lo, hi, bins)
      .as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(streamed == batch, "stream fold must equal the batch counters exactly")
    // running quantiles come straight off the stored counters
    val p = StreamingHistogram
      .quantiles(spark, s"$dir/state", lo, hi, bins, Seq(0.5)).head._2
    val width = (hi - lo) / bins
    // 6000 values, median of the mixture sits near 583: within a bin
    val exact = {
      val all = (b1 ++ b2).sorted
      all(all.length / 2)
    }
    assert(math.abs(p - exact) <= width, s"p50=$p exact=$exact")
  }

  test("replayed batch id does not double-count; empty state answers lo") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shist2").toString
    val state = s"$dir/state"
    assert(StreamingHistogram
      .quantiles(spark, state, 0.0, 100.0, 16, Seq(0.5)) == Seq(0.5 -> 0.0))
    StreamingHistogram.foldBatch(spark, state, Map(3 -> 10L), batchId = 0L)
    StreamingHistogram.foldBatch(spark, state, Map(3 -> 10L), batchId = 0L)
    val snap = StreamingHistogram.snapshot(spark, state)
      .select($"bin", $"cnt").as[(Int, Long)].collect().toMap
    assert(snap == Map(3 -> 10L), s"replay double-counted: $snap")
    StreamingHistogram.foldBatch(spark, state, Map(3 -> 5L, 7 -> 2L), batchId = 1L)
    val snap2 = StreamingHistogram.snapshot(spark, state)
      .select($"bin", $"cnt").as[(Int, Long)].collect().toMap
    assert(snap2 == Map(3 -> 15L, 7 -> 2L))
  }

  test("a torn state write (no _SUCCESS) is invisible; recovery commits over it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shist3").toString
    val state = s"$dir/state"
    StreamingHistogram.foldBatch(spark, state, Map(1 -> 4L), batchId = 0L)
    val torn = new java.io.File(state, "v" + "%019d".format(1L))
    torn.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(torn.toString, "part-00000.parquet"), Array[Byte](1))
    assert(StreamingHistogram.snapshot(spark, state)
      .select($"bin", $"cnt").as[(Int, Long)].collect().toMap == Map(1 -> 4L))
    StreamingHistogram.foldBatch(spark, state, Map(2 -> 6L), batchId = 1L)
    assert(StreamingHistogram.snapshot(spark, state)
      .select($"bin", $"cnt").as[(Int, Long)].collect().toMap == Map(1 -> 4L, 2 -> 6L))
  }

  test("out-of-range values clamp into the edge bins") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shist4").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Double]
    val q = StreamingHistogram.start(
      in.toDF().toDF("x"), col("x"),
      statePath = s"$dir/state", checkpoint = s"$dir/ckpt", lo = 0.0, hi = 10.0, bins = 10)
    in.addData(Seq(-50.0, -1.0, 5.5, 99.0, 1e9)); q.processAllAvailable()
    q.stop()
    val snap = StreamingHistogram.snapshot(spark, s"$dir/state")
      .select($"bin", $"cnt").as[(Int, Long)].collect().toMap
    assert(snap == Map(0 -> 2L, 5 -> 1L, 9 -> 2L), snap.toString)
  }
}
