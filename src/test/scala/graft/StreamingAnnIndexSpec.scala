package graft

import graft.functions.Similarity
import graft.sources.Tables
import graft.streaming.{StateStore, StreamingAnnIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch parity for the streaming ANN index: vectors arriving over N
  * micro-batches, routed and PQ-encoded under the frozen base-trained
  * model, must accumulate EXACTLY the rows the one-shot
  * [[Similarity.ivfPqIndexAppend]] produces for the same vectors —
  * per-row routing/encoding means the streaming and batch paths can
  * never diverge row-level (the d56 contract, end-to-end through a
  * real stream with the in-stream compaction cadence live). */
class StreamingAnnIndexSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.load(spark, dir, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    .cache()

  test("vectors fed over micro-batches equal the one-shot append exactly; compaction in-stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sann").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sann_ck").toString
    val base = emb.filter(col("vec_id") < 300)
    val fresh = emb.filter(col("vec_id") >= 300 && col("vec_id") < 420)
    val rows = fresh.as[(Long, Seq[Double])].collect().sortBy(_._1)
    val in = MemoryStream[(Long, Seq[Double])]
    val q = StreamingAnnIndex.start(
      in.toDF().toDF("vec_id", "embedding"), base, "vec_id", "embedding",
      root, ckpt, nLists = 8, nSub = 8, kSub = 16,
      compactEvery = Some(2), compactGraceMs = 0L)
    for (b <- rows.grouped(40)) { in.addData(b.toIndexedSeq: _*); q.processAllAvailable() }
    q.stop()
    val streamed = StreamingAnnIndex.codesAt(spark, root)
      .orderBy("id").collect().map(_.toSeq)
    // one-shot under the SAME frozen model (the stream's memo key)
    val oneShot = Similarity.ivfPqIndexAppend(
        base, fresh, "vec_id", "embedding", nLists = 8, nSub = 8, kSub = 16,
        cacheKey = Some(s"streaming_ann:$root"))
      .orderBy("id").collect().map(_.toSeq)
    assert(streamed.length == 120)
    assert(streamed.sameElements(oneShot),
      "streamed codes must be bit-identical to the one-shot append")
    // every id committed; the cadence (fired at batch 2, grace 0 for
    // the bounded-dir assertion) absorbed the pre-newest prefix
    assert(StateStore.committedBatchIds(spark, s"$root/codes") == (0L to 2L))
    def dirs() = new java.io.File(s"$root/codes").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs().count(_.startsWith("c")) == 1, dirs())
  }

  test("ivfPqTopKFromCodes over the stored table == in-query ivfPqTopK exactly") {
    val root = java.nio.file.Files.createTempDirectory("graft_sann_serve").toString
    val key = Some("sann-serve-spec")
    // whole corpus appended as three id-disjoint batches under the
    // whole-corpus model (the d80 staging), first two compacted
    (0 to 2).foreach { i =>
      val encoded = Similarity.ivfPqIndexAppend(
        emb, emb.filter(pmod(col("vec_id"), lit(3)) === i), "vec_id", "embedding",
        nLists = 8, nSub = 8, kSub = 16, cacheKey = key)
      StateStore.writeBatchDir(
        encoded.repartitionByRange(col("bucket"))
          .sortWithinPartitions(col("bucket"), col("id")),
        s"$root/codes", i.toLong)
    }
    StreamingAnnIndex.compactAnnIndex(spark, root)
    val queries = emb.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"corpus_id", $"cos_sim", $"rank")
        .as[(Long, Long, Double, Long)].collect().toSet
    val served = rows(Similarity.ivfPqTopKFromCodes(
      StreamingAnnIndex.codesAt(spark, root), emb, queries, "vec_id", "embedding", 5,
      nLists = 8, nSub = 8, kSub = 16, cacheKey = key))
    val inQuery = rows(Similarity.ivfPqTopK(
      emb, queries, "vec_id", "embedding", 5,
      nLists = 8, nSub = 8, kSub = 16, cacheKey = key))
    assert(served == inQuery, s"served=$served inQuery=$inQuery")
    assert(served.nonEmpty)
  }

  test("a replayed committed batch is skipped (committed files never rewritten)") {
    val root = java.nio.file.Files.createTempDirectory("graft_sann_rp").toString
    val base = emb.filter(col("vec_id") < 300)
    val b0 = emb.filter(col("vec_id") >= 300 && col("vec_id") < 340)
    StreamingAnnIndex.processBatch(b0, 0L, base, "vec_id", "embedding", root,
      nLists = 8, nSub = 8, kSub = 16, iters = 3, sampleN = 100000)
    val before = StreamingAnnIndex.codesAt(spark, root)
      .orderBy("id").collect().map(_.toSeq)
    // a replay carrying DIFFERENT data proves the skip (a real replay
    // carries the same data; the skip is what makes it irrelevant)
    val poison = emb.filter(col("vec_id") >= 340 && col("vec_id") < 380)
    StreamingAnnIndex.processBatch(poison, 0L, base, "vec_id", "embedding", root,
      nLists = 8, nSub = 8, kSub = 16, iters = 3, sampleN = 100000)
    assert(StreamingAnnIndex.codesAt(spark, root)
      .orderBy("id").collect().map(_.toSeq).sameElements(before))
    assert(before.length == 40)
  }
}
