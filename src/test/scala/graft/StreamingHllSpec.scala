package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hll
import graft.streaming.StreamingHll

/** Streaming HLL: the stream fold is EXACTLY the batch sketch (monoid
  * parity, not just an error bound), replays are no-ops, torn state
  * writes recover. */
class StreamingHllSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("stream fold equals the batch sketch of the concatenated stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shll").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[String]
    val q = StreamingHll.start(
      in.toDF().toDF("k"), col("k"),
      statePath = s"$dir/state", checkpoint = s"$dir/ckpt")
    val b1 = (0 until 3000).map(i => s"u$i")
    val b2 = (2000 until 5000).map(i => s"u$i") // overlaps b1: dedup matters
    val b3 = Seq.fill(500)("u1") // pure repeats: must not move anything
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    in.addData(b3); q.processAllAvailable()
    q.stop()

    val streamed = StreamingHll.snapshot(spark, s"$dir/state")
      .select($"bucket", $"max_rank").as[(Int, Int)].collect().sortBy(_._1).toSeq
    val batch = Hll.registers((b1 ++ b2 ++ b3).toDF("k"), col("k"))
      .as[(Int, Int)].collect().sortBy(_._1).toSeq
    assert(streamed == batch, "stream fold must equal the batch registers exactly")
    val est = StreamingHll.estimate(spark, s"$dir/state")
    assert(est == Hll.estimate(Hll.registers((b1 ++ b2 ++ b3).toDF("k"), col("k"))))
    assert(math.abs(est - 5000) / 5000 < 0.195, s"est=$est vs 5000 true")
  }

  test("replayed batch id is a no-op; empty state estimates 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shll2").toString
    val state = s"$dir/state"
    assert(StreamingHll.estimate(spark, state) == 0.0)
    StreamingHll.foldBatch(spark, state, Map(1 -> 5, 2 -> 3), batchId = 0L)
    val once = StreamingHll.snapshot(spark, state).collect().map(_.toSeq).sortBy(_.toString)
    StreamingHll.foldBatch(spark, state, Map(1 -> 5, 2 -> 3), batchId = 0L)
    val twice = StreamingHll.snapshot(spark, state).collect().map(_.toSeq).sortBy(_.toString)
    assert(once.sameElements(twice), "replay changed the state")
    // the next id folds by cell-wise MAX
    StreamingHll.foldBatch(spark, state, Map(2 -> 7, 9 -> 1), batchId = 1L)
    val snap = StreamingHll.snapshot(spark, state)
      .select($"bucket", $"max_rank").as[(Int, Int)].collect().toMap
    assert(snap == Map(1 -> 5, 2 -> 7, 9 -> 1))
  }

  test("a torn state write (no _SUCCESS) is invisible; recovery commits over it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shll3").toString
    val state = s"$dir/state"
    StreamingHll.foldBatch(spark, state, Map(1 -> 5), batchId = 0L)
    val torn = new java.io.File(state, "v" + "%019d".format(1L))
    torn.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(torn.toString, "part-00000.parquet"), Array[Byte](9, 9))
    // the torn v1 must not shadow the committed v0
    assert(StreamingHll.snapshot(spark, state)
      .select($"bucket", $"max_rank").as[(Int, Int)].collect().toMap == Map(1 -> 5))
    // checkpoint replays batch 1: fold reads v0, commits over the torn dir
    StreamingHll.foldBatch(spark, state, Map(3 -> 2), batchId = 1L)
    assert(StreamingHll.snapshot(spark, state)
      .select($"bucket", $"max_rank").as[(Int, Int)].collect().toMap == Map(1 -> 5, 3 -> 2))
  }
}
