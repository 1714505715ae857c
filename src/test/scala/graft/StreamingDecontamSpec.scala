package graft

import graft.functions.Retrieval
import graft.streaming.StreamingDecontam
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Streaming decontamination monitor: eval sentences are caught in the
  * micro-batch their document arrives in (batch-parity with the d70
  * phrase audit over the whole corpus), the accumulated positional
  * index serves ad-hoc triage, and replays/torn writes leave both
  * tables exactly as a single clean run's. */
class StreamingDecontamSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val evalPhrases = Seq(
    (1L, "the quick brown fox"),
    (2L, "hash table"),
    (3L, "neverseen sentinel")).toDF("phrase_id", "phrase")

  private val b1 = Seq(
    (1L, "intro text with the quick brown fox jumping"),
    (2L, "a clean document about joins"))
  private val b2 = Seq(
    (3L, "the hash table chapter and the hash table appendix"))
  private val b3 = Seq(
    (4L, "another clean document"),
    (5L, "ends with the quick brown fox"))

  private def hitSet(df: DataFrame) =
    df.select($"phrase_id", $"doc_id", $"n_occurrences", $"first_pos")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("hits over micro-batches equal the one-shot whole-corpus phrase audit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_decon").toString
    val in = MemoryStream[(Long, String)]
    val q = StreamingDecontam.start(
      in.toDF().toDF("doc_id", "text"), "text", "doc_id",
      evalPhrases, "phrase_id", "phrase",
      indexRoot = s"$dir/idx", outPath = s"$dir/out", checkpoint = s"$dir/ckpt")
    for (b <- Seq(b1, b2, b3)) { in.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val streamed = hitSet(spark.read.parquet(s"$dir/out"))
    val oneShot = hitSet(Retrieval.phraseSearch(
      (b1 ++ b2 ++ b3).toDF("doc_id", "text"), "text", "doc_id",
      evalPhrases, "phrase_id", "phrase"))
    assert(streamed == oneShot, s"streamed=$streamed oneShot=$oneShot")
    // the contaminated docs really alert; the sentinel phrase never does
    assert(streamed.map(_._2) == Set(1L, 3L, 5L))
    assert(!streamed.exists(_._1 == 3L))
    // hits carry the batch that admitted the doc
    val byBatch = spark.read.parquet(s"$dir/out")
      .select($"doc_id", $"batch_id").as[(Long, Long)].collect().toMap
    assert(byBatch == Map(1L -> 0L, 3L -> 1L, 5L -> 2L))
    // the accumulated index serves ad-hoc triage over ALL history
    assert(hitSet(Retrieval.phraseSearchFromIndex(
      spark, s"$dir/idx", evalPhrases, "phrase_id", "phrase")) == oneShot)
    val sn = Retrieval.snippetsFromIndex(
        spark, s"$dir/idx", evalPhrases, "phrase_id", "phrase", window = 1)
      .select($"doc_id", $"snippet").as[(Long, String)].collect().toMap
    assert(sn(1L) == "with the quick brown fox jumping")
  }

  private def run(rows: Seq[(Long, String)], batchId: Long, dir: String): Unit =
    StreamingDecontam.processBatch(
      rows.toDF("doc_id", "text"), batchId, "text", "doc_id",
      evalPhrases, "phrase_id", "phrase", s"$dir/idx", s"$dir/out",
      minOccurrences = 1)

  test("a replayed batch replaces its own hits and index dir (idempotent)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_decon2").toString
    run(b1, 0L, dir)
    run(b2, 1L, dir)
    def alerts() = spark.read.parquet(s"$dir/out").collect().map(_.toSeq).sortBy(_.toString)
    def idx() = Retrieval.phraseSearchFromIndex(
      spark, s"$dir/idx", evalPhrases, "phrase_id", "phrase")
      .collect().map(_.toSeq).sortBy(_.toString)
    val (alertsOnce, idxOnce) = (alerts(), idx())
    run(b2, 1L, dir) // crash-window replay of the same batch id
    assert(alerts().sameElements(alertsOnce), "replay duplicated hits")
    assert(idx().sameElements(idxOnce), "replay changed the index")
  }

  test("a crash BETWEEN the index append and the alert write replays cleanly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_decon3").toString
    run(b1, 0L, dir)
    // simulate the crash window: batch 1's index dir committed, but its
    // alert partition never written
    Retrieval.appendToPositionalIndex(b2.toDF("doc_id", "text"), "text", "doc_id",
      s"$dir/idx", 1L)
    assert(spark.read.parquet(s"$dir/out").where($"batch_id" === 1L).isEmpty,
      "no batch-1 alerts yet")
    // the replay skips the committed append (PhraseIndexSpec's no-op
    // contract), audits from the stored postings, writes the alerts
    run(b2, 1L, dir)
    val hits = hitSet(spark.read.parquet(s"$dir/out").where($"batch_id" === 1L))
    assert(hits == hitSet(Retrieval.phraseSearch(
      b2.toDF("doc_id", "text"), "text", "doc_id", evalPhrases, "phrase_id", "phrase")))
  }

  test("a replay that recomputes ZERO hits retracts the stale alert partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_decon5").toString
    run(b1, 0L, dir)
    run(b2, 1L, dir) // batch 1 alerts on "hash table"
    assert(!spark.read.parquet(s"$dir/out").where($"batch_id" === 1L).isEmpty)
    // the stream restarts with a CHANGED phrase list (the advertised
    // re-audit workflow) and replays batch 1 — now zero hits: the old
    // partition must not survive as stale alerts
    val newPhrases = Seq((9L, "neverseen sentinel")).toDF("phrase_id", "phrase")
    StreamingDecontam.processBatch(
      b2.toDF("doc_id", "text"), 1L, "text", "doc_id",
      newPhrases, "phrase_id", "phrase", s"$dir/idx", s"$dir/out",
      minOccurrences = 1)
    assert(spark.read.parquet(s"$dir/out").where($"batch_id" === 1L).isEmpty,
      "stale batch-1 alerts survived an empty-hit replay")
    // batch 0's partition is untouched
    assert(!spark.read.parquet(s"$dir/out").where($"batch_id" === 0L).isEmpty)
  }

  test("a torn index dir (no _SUCCESS) is invisible; the replay commits over it and alerts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_decon4").toString
    run(b1, 0L, dir)
    val torn = new java.io.File(s"$dir/idx/postings", "b" + "%019d".format(1L))
    torn.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(torn.toString, "part-x.parquet"), Array[Byte](1))
    assert(hitSet(Retrieval.phraseSearchFromIndex(
      spark, s"$dir/idx", evalPhrases, "phrase_id", "phrase")).map(_._2) == Set(1L))
    run(b2, 1L, dir)
    assert(hitSet(spark.read.parquet(s"$dir/out").where($"batch_id" === 1L))
      .contains((2L, 3L, 2L, 1L)))
  }

  test("anchorK maintains the anchor table in-stream: over-cap re-audit serves from the live root") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_decon5").toString
    val in = MemoryStream[(Long, String)]
    val q = StreamingDecontam.start(
      in.toDF().toDF("doc_id", "text"), "text", "doc_id",
      evalPhrases, "phrase_id", "phrase",
      indexRoot = s"$dir/idx", outPath = s"$dir/out", checkpoint = s"$dir/ckpt",
      compactEvery = Some(2), anchorK = Some(2))
    for (b <- Seq(b1, b2, b3)) { in.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // the anchor-probe re-audit over the live root (through the cadence
    // compaction at batch 2) equals the whole-corpus direct audit —
    // the over-cap triage workflow the anchorK option exists for
    val oneShot = hitSet(Retrieval.phraseSearch(
      (b1 ++ b2 ++ b3).toDF("doc_id", "text"), "text", "doc_id",
      evalPhrases, "phrase_id", "phrase"))
    assert(hitSet(Retrieval.phraseSearchViaAnchors(
      spark, s"$dir/idx", evalPhrases, "phrase_id", "phrase")) == oneShot)
    // a direct replay of the NEWEST committed batch (the only id a
    // restart can legally replay — the cadence never absorbs it) adds
    // no anchor rows
    val anchorsBefore = graft.streaming.StateStore
      .readCommittedBatchDirs(spark, s"$dir/idx/anchors").get.count()
    StreamingDecontam.processBatch(
      b3.toDF("doc_id", "text"), 2L, "text", "doc_id",
      evalPhrases, "phrase_id", "phrase", s"$dir/idx", s"$dir/out",
      minOccurrences = 1, anchorK = Some(2))
    assert(graft.streaming.StateStore
      .readCommittedBatchDirs(spark, s"$dir/idx/anchors").get.count() == anchorsBefore)
  }
}
