package graft

import graft.streaming.StreamingTopK
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming Misra–Gries: the stream fold keeps the batch guarantees
  * (presence above n/(c+1), underestimate, error bound) at every point,
  * and replays are idempotent. */
class StreamingTopKSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("stream fold preserves MG guarantees across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stk").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[String]
    val c = 8
    val q = StreamingTopK.start(
      in.toDF().toDF("k"), col("k"),
      statePath = s"$dir/state", checkpoint = s"$dir/ckpt", capacity = c)

    // three batches: 2 heavy keys, 40 light ones
    val b1 = Seq.fill(60)("hot1") ++ (0 until 20).flatMap(i => Seq.fill(2)(s"a$i"))
    val b2 = Seq.fill(50)("hot2") ++ (0 until 20).flatMap(i => Seq.fill(2)(s"b$i"))
    val b3 = Seq.fill(40)("hot1") ++ Seq.fill(30)("hot2")
    val all = b1 ++ b2 ++ b3
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    in.addData(b3); q.processAllAvailable()
    q.stop()

    val state = StreamingTopK.snapshot(spark, s"$dir/state")
      .filter(col("item").isNotNull).collect()
    val n = state.head.getAs[Long]("n")
    assert(n === all.size.toLong)
    assert(state.length <= c)
    val est = state.map(r => r.getAs[String]("item") -> r.getAs[Long]("est")).toMap
    val exact = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    est.foreach { case (k, e) =>
      assert(e <= exact(k), s"overestimate for $k")
      assert(exact(k) - e <= n / (c + 1), s"bound breach for $k")
    }
    // hot1 (100) and hot2 (80) both exceed n/(c+1) = 250/9 = 27
    assert(est.contains("hot1") && est.contains("hot2"))
  }

  test("a replayed batch id does not double-count; the next id folds once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stk2").toString
    val state = s"$dir/state"
    graft.streaming.StreamingTopK.foldBatch(
      spark, state, capacity = 8, Map("x" -> 10L), batchN = 10L, batchId = 0L)
    // crash-window replay: same batch id re-delivered -> no-op
    graft.streaming.StreamingTopK.foldBatch(
      spark, state, capacity = 8, Map("x" -> 10L), batchN = 10L, batchId = 0L)
    val afterReplay = StreamingTopK.snapshot(spark, state)
      .filter(col("item").isNotNull).collect()
    assert(afterReplay.head.getAs[Long]("n") === 10L)
    assert(afterReplay.map(r => r.getString(0) -> r.getLong(1)).toMap === Map("x" -> 10L))
    // the next batch id folds exactly once
    graft.streaming.StreamingTopK.foldBatch(
      spark, state, capacity = 8, Map("y" -> 5L), batchN = 5L, batchId = 1L)
    val after = StreamingTopK.snapshot(spark, state)
      .filter(col("item").isNotNull).collect()
    assert(after.head.getAs[Long]("n") === 15L)
    assert(after.map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("x" -> 10L, "y" -> 5L))
  }

  test("a torn state write (no _SUCCESS) is invisible; recovery commits over it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stk3").toString
    val state = s"$dir/state"
    StreamingTopK.foldBatch(spark, state, capacity = 8, Map("x" -> 3L), 3L, batchId = 0L)
    StreamingTopK.foldBatch(spark, state, capacity = 8, Map("x" -> 2L), 2L, batchId = 1L)
    // simulate a crash mid-write of batch 2: the version dir exists with
    // partial data but never got its _SUCCESS commit marker
    val torn = new java.io.File(state, "v" + "%019d".format(2L))
    torn.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(torn.toString, "part-00000.parquet"), Array[Byte](1, 2, 3))
    val snap = StreamingTopK.snapshot(spark, state)
      .filter(col("item").isNotNull).collect()
    assert(snap.head.getAs[Long]("n") === 5L, "torn version must not be read")
    assert(snap.head.getAs[Long]("batch_id") === 1L)
    // the checkpoint replays batch 2: the fold overwrites the torn dir,
    // commits it, and prunes to (new version + one predecessor)
    StreamingTopK.foldBatch(spark, state, capacity = 8, Map("y" -> 1L), 1L, batchId = 2L)
    val after = StreamingTopK.snapshot(spark, state)
      .filter(col("item").isNotNull).collect()
    assert(after.head.getAs[Long]("n") === 6L)
    assert(after.head.getAs[Long]("batch_id") === 2L)
    val versions = new java.io.File(state).listFiles().filter(_.isDirectory).map(_.getName)
    assert(versions.length <= 2 && versions.max === "v" + "%019d".format(2L), versions.toSeq)
  }
}
