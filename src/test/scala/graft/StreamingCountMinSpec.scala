package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CountMin
import graft.streaming.StreamingCountMin

/** Streaming Count-Min: the linear fold equals the batch sketch exactly,
  * replays are stamped no-ops, estimates keep the never-underestimate
  * guarantee at every point, torn writes recover. */
class StreamingCountMinSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("stream fold equals the batch sketch of the concatenated stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scm").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[String]
    val q = StreamingCountMin.start(
      in.toDF().toDF("k"), col("k"),
      statePath = s"$dir/state", checkpoint = s"$dir/ckpt")
    val b1 = Seq.fill(300)("hot") ++ (0 until 500).map(i => s"a$i")
    val b2 = Seq.fill(200)("hot") ++ (0 until 500).map(i => s"b$i")
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    q.stop()

    val streamed = StreamingCountMin.snapshot(spark, s"$dir/state")
      .select($"r", $"c", $"cnt").as[(Int, Int, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    val batch = CountMin.build((b1 ++ b2).toDF("k"), col("k"), 4, 256)
      .as[(Int, Int, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(streamed == batch, "linear fold must equal the batch counters exactly")

    // running estimate: never underestimates, exact-ish on the hot key
    val est = StreamingCountMin.estimates(
      spark, s"$dir/state", Seq("hot").toDF("k"), "k")
      .as[(String, Long)].collect().head._2
    assert(est >= 500L, s"underestimate: $est")
  }

  test("replayed batch id does not double-count; next id folds once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scm2").toString
    val state = s"$dir/state"
    StreamingCountMin.foldBatch(spark, state, Map((0, 5) -> 7L), batchId = 0L)
    StreamingCountMin.foldBatch(spark, state, Map((0, 5) -> 7L), batchId = 0L)
    val snap = StreamingCountMin.snapshot(spark, state)
      .select($"r", $"c", $"cnt").as[(Int, Int, Long)].collect().toSeq
    assert(snap == Seq((0, 5, 7L)), s"replay double-counted: $snap")
    StreamingCountMin.foldBatch(spark, state, Map((0, 5) -> 3L, (1, 9) -> 2L), batchId = 1L)
    val snap2 = StreamingCountMin.snapshot(spark, state)
      .select($"r", $"c", $"cnt").as[(Int, Int, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(snap2 == Seq((0, 5, 10L), (1, 9, 2L)))
  }

  test("a torn state write (no _SUCCESS) is invisible; recovery commits over it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scm3").toString
    val state = s"$dir/state"
    StreamingCountMin.foldBatch(spark, state, Map((2, 2) -> 1L), batchId = 0L)
    val torn = new java.io.File(state, "v" + "%019d".format(1L))
    torn.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(torn.toString, "part-00000.parquet"), Array[Byte](7))
    assert(StreamingCountMin.snapshot(spark, state)
      .select($"r", $"c", $"cnt").as[(Int, Int, Long)].collect().toSeq == Seq((2, 2, 1L)))
    StreamingCountMin.foldBatch(spark, state, Map((3, 3) -> 4L), batchId = 1L)
    assert(StreamingCountMin.snapshot(spark, state)
      .select($"r", $"c", $"cnt").as[(Int, Int, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
      == Seq((2, 2, 1L), (3, 3, 4L)))
  }
}
