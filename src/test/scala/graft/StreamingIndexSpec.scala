package graft

import graft.functions.Retrieval
import graft.streaming.StreamingIndex
import org.scalatest.funsuite.AnyFunSuite

/** Batch parity for the streaming index: documents arriving over N
  * micro-batches must serve the EXACT ranking of the same corpus
  * indexed at once — the structural exactly-once of the batch-dir
  * layout, end-to-end through a real stream. */
class StreamingIndexSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("index fed over micro-batches equals the one-shot batch index exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sidx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sidx_ck").toString
    val b1 = Seq((1L, "spark hash join fast"), (2L, "hash hash hash table scan"))
    val b2 = Seq((3L, "slow table scan over rows"))
    val b3 = Seq((4L, "spark spark spark spark"), (5L, "merge sort join table"))
    val in = MemoryStream[(Long, String)]
    val q = StreamingIndex.start(
      in.toDF().toDF("doc_id", "text"), "text", "doc_id", root, ckpt)
    for (b <- Seq(b1, b2, b3)) { in.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val qs = Seq((1L, "hash table"), (2L, "spark join")).toDF("query_id", "query")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"doc_id", $"n_terms_matched", $"score", $"rank")
        .as[(Long, Long, Long, Double, Long)].collect().toSet
    val streamed = rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5))
    val oneShot = rows(Retrieval.bm25TopK(
      (b1 ++ b2 ++ b3).toDF("doc_id", "text"), "text", "doc_id",
      qs, "query_id", "query", 5))
    assert(streamed == oneShot, s"streamed=$streamed oneShot=$oneShot")
  }

  test("compactEvery keeps the dir count bounded under an active stream, serve unchanged") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sidx_ce").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sidx_ce_ck").toString
    val batches = (0 until 7).map(b => Seq((10L + b, s"doc$b spark hash table b$b")))
    val in = MemoryStream[(Long, String)]
    val q = StreamingIndex.start(
      in.toDF().toDF("doc_id", "text"), "text", "doc_id", root, ckpt,
      // grace 0 so the bounded-dir assertions below see the pure
      // one-generation sweep (the production default retains swept
      // generations for defaultInStreamGraceMs — reader-grace, not
      // unboundedness; CompactionStateSpec locks that behavior)
      compactEvery = Some(2), compactGraceMs = 0L)
    for (b <- batches) { in.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // every id still committed (replays skip); dirs bounded: one live
    // c-generation + its grace predecessor + the uncompacted tail, vs
    // 7 b-dirs without compaction
    import graft.streaming.StateStore
    assert(StateStore.committedBatchIds(spark, s"$root/postings") == (0L to 6L))
    def dirs(sub: String) = new java.io.File(s"$root/$sub").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    for (part <- Seq("postings", "stats", "df")) {
      assert(dirs(part).count(_.startsWith("c")) <= 2, s"$part: ${dirs(part)}")
      assert(dirs(part).count(_.startsWith("b")) <= 3, s"$part: ${dirs(part)}")
    }
    // serve parity with the one-shot index of the same docs
    val qs = Seq((1L, "spark hash")).toDF("query_id", "query")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"doc_id", $"score", $"rank")
        .as[(Long, Long, Double, Long)].collect().toSet
    assert(
      rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 10)) ==
        rows(Retrieval.bm25TopK(batches.flatten.toDF("doc_id", "text"),
          "text", "doc_id", qs, "query_id", "query", 10)))
  }
}
