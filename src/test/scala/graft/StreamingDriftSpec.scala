package graft

import graft.streaming.StreamingDrift
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming drift monitor: an in-distribution batch stays quiet, a
  * drifted batch alerts within its own micro-batch. */
class StreamingDriftSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("a drifted batch raises the alert; an in-distribution one does not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    val ref = (1 to 50)
      .map(i => (i.toLong, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingDrift.start(
      in.toDF().toDF("doc_id", "text"), ref,
      outPath = s"$dir/out", checkpoint = s"$dir/ckpt", klAlert = 0.5)

    // batch 0: same distribution as the reference
    in.addData((100L, "the quick brown fox jumps over the lazy dog"))
    q.processAllAvailable()
    // batch 1: a completely different vocabulary
    in.addData((200L, "zzz qqq vvv kkk www yyy xxx uuu ttt sss"))
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(s"$dir/out")
      .select($"batch_id", $"kl_total", $"alert").as[(Long, Double, Boolean)]
      .collect().sortBy(_._1)
    assert(out.length == 2)
    assert(!out(0)._3, s"in-distribution batch alerted: kl=${out(0)._2}")
    assert(out(1)._3, s"drifted batch did not alert: kl=${out(1)._2}")
    assert(out(1)._2 > out(0)._2)
  }
}
