package graft

import graft.functions.Retrieval
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persistent BM25 index contract: build once, append batches, serve
  * from storage — append must equal full rebuild EXACTLY (per-batch
  * postings are doc-disjoint; the stats row is an additive integer
  * fold), and torn batch dirs must stay invisible (the StateStore
  * committed-append layout). */
class RetrievalIndexSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_bm25").toString

  private val base = Seq(
    (1L, "spark hash join fast"),
    (2L, "hash hash hash table scan"),
    (3L, "slow table scan over rows")).toDF("doc_id", "text")
  private val batch = Seq(
    (4L, "spark spark spark spark"),
    (5L, "merge sort join table")).toDF("doc_id", "text")
  private val qs = Seq((1L, "hash table"), (2L, "spark join")).toDF("query_id", "query")

  private def rows(df: DataFrame) =
    df.select($"query_id", $"doc_id", $"n_terms_matched", $"score", $"rank")
      .as[(Long, Long, Long, Double, Long)].collect().toSet

  test("index build + append serves the EXACT ranking of the unioned corpus") {
    val root = tmp()
    Retrieval.buildIndex(base, "text", "doc_id", root)
    Retrieval.appendToIndex(batch, "text", "doc_id", root, batchId = 1L)
    val fromIndex = rows(
      Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5))
    val direct = rows(
      Retrieval.bm25TopK(base.unionByName(batch), "text", "doc_id",
        qs, "query_id", "query", 5))
    assert(fromIndex == direct, s"index=$fromIndex direct=$direct")
    // df/avgdl really refreshed: doc 4 (pure 'spark') must appear for
    // query 2 only after the append
    assert(fromIndex.exists { case (q, d, _, _, _) => q == 2L && d == 4L })
  }

  test("a torn (uncommitted) batch dir is invisible to the serve path") {
    val root = tmp()
    Retrieval.buildIndex(base, "text", "doc_id", root)
    val before = rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5))
    // simulate a crash mid-append: batch dir exists, no _SUCCESS
    for (part <- Seq("postings", "stats")) {
      val torn = new java.io.File(s"$root/$part", "b" + "%019d".format(7L))
      torn.mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(torn.toString, "part-x.parquet"), Array[Byte](1))
    }
    val after = rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5))
    assert(after == before)
    // the replayed append commits over the torn dir and becomes visible
    Retrieval.appendToIndex(batch, "text", "doc_id", root, batchId = 7L)
    val replayed = rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5))
    assert(replayed == rows(Retrieval.bm25TopK(base.unionByName(batch), "text", "doc_id",
      qs, "query_id", "query", 5)))
  }

  test("a batch committed on only ONE side (postings without stats) is wholly invisible") {
    // a crash BETWEEN appendToIndex's two writes commits postings b1
    // but not stats b1 — the id-intersection read must not show a
    // half-applied view (postings scored against stats that don't
    // include them)
    val root = tmp()
    Retrieval.buildIndex(base, "text", "doc_id", root)
    val before = rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5))
    val (postings, _) = Retrieval.indexParts(batch, "text", "doc_id")
    graft.streaming.StateStore.writeBatchDir(postings, s"$root/postings", 1L)
    val after = rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5))
    assert(after == before)
    // the replay completes both sides and the batch becomes visible
    Retrieval.appendToIndex(batch, "text", "doc_id", root, batchId = 1L)
    assert(rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5)) ==
      rows(Retrieval.bm25TopK(base.unionByName(batch), "text", "doc_id",
        qs, "query_id", "query", 5)))
  }

  test("replaying a FULLY-committed batch id is a no-op (committed files never deleted)") {
    val root = tmp()
    Retrieval.buildIndex(base, "text", "doc_id", root)
    val before = rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5))
    // a replay carries the same data by contract; passing DIFFERENT
    // data under the committed id proves the skip (nothing rewritten)
    Retrieval.appendToIndex(batch, "text", "doc_id", root, batchId = 0L)
    val after = rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5))
    assert(after == before)
  }

  test("stored additive df table serves the EXACT scores of postings-derived df") {
    val root = tmp()
    Retrieval.buildIndex(base, "text", "doc_id", root)
    Retrieval.appendToIndex(batch, "text", "doc_id", root, batchId = 1L)
    // every batch committed its df dir → the serve path probes the df
    // table (one postings pass); the direct path derives df from the
    // postings scan — the integers must be identical
    val ids = graft.streaming.StateStore.committedBatchIds(spark, s"$root/df")
    assert(ids == Seq(0L, 1L), s"df dirs not committed per batch: $ids")
    val fromIndex = rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5))
    val direct = rows(Retrieval.bm25TopK(base.unionByName(batch), "text", "doc_id",
      qs, "query_id", "query", 5))
    assert(fromIndex == direct)
  }

  test("a torn df dir demotes the read to postings-derived df — scores unchanged") {
    // a crash AFTER postings+stats but BEFORE the df write: the batch
    // is visible (postings∩stats) and must score exactly — a partial
    // df fold would undercount df and inflate idf, so the whole read
    // falls back to the postings scan until the replay completes df
    val root = tmp()
    Retrieval.buildIndex(base, "text", "doc_id", root)
    val (postings, stats) = Retrieval.indexParts(batch, "text", "doc_id")
    graft.streaming.StateStore.writeBatchDir(postings, s"$root/postings", 1L)
    graft.streaming.StateStore.writeBatchDir(stats, s"$root/stats", 1L)
    val fromIndex = rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5))
    val direct = rows(Retrieval.bm25TopK(base.unionByName(batch), "text", "doc_id",
      qs, "query_id", "query", 5))
    assert(fromIndex == direct)
    // the replay completes the df dir and the probe path takes over,
    // still exact
    Retrieval.appendToIndex(batch, "text", "doc_id", root, batchId = 1L)
    assert(graft.streaming.StateStore.committedBatchIds(spark, s"$root/df") == Seq(0L, 1L))
    assert(rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5)) == direct)
  }

  test("serving an unbuilt index fails loudly") {
    val e = intercept[IllegalStateException] {
      Retrieval.bm25FromIndex(spark, tmp(), qs, "query_id", "query", 5).collect()
    }
    assert(e.getMessage.contains("buildIndex"))
  }
}
