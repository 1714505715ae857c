package graft

import graft.functions.Retrieval
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Persistent POSITIONAL index contract (the phrase/decontamination
  * serve path): build once, append doc-disjoint batches, serve both the
  * phrase audit and the snippet assembly from storage — append must
  * equal full rebuild EXACTLY (positional postings are per-doc rows, no
  * cross-batch state at all), torn batch dirs must stay invisible, and
  * a committed dir must never be rewritten by a replay (the StateStore
  * committed-append layout, same as RetrievalIndexSpec for BM25). */
class PhraseIndexSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_phrase").toString

  private val base = Seq(
    (1L, "the hash table holds the hash"),
    (2L, "a fast hash table scan"),
    (3L, "slow table scan over rows")).toDF("doc_id", "text")
  private val batch = Seq(
    (4L, "hash table hash table hash table"),
    (5L, "merge sort join table")).toDF("doc_id", "text")
  private val ph = Seq(
    (1L, "hash table"), (2L, "table scan"), (3L, "missingterm")).toDF("phrase_id", "phrase")

  private def hits(df: DataFrame) =
    df.select($"phrase_id", $"doc_id", $"n_occurrences", $"first_pos")
      .as[(Long, Long, Long, Long)].collect().toSet

  private def snips(df: DataFrame) =
    df.select($"phrase_id", $"doc_id", $"first_pos", $"snippet_start", $"snippet")
      .as[(Long, Long, Long, Long, String)].collect().toSet

  test("index build + append serves the EXACT phrase audit of the unioned corpus") {
    val root = tmp()
    Retrieval.buildPositionalIndex(base, "text", "doc_id", root)
    Retrieval.appendToPositionalIndex(batch, "text", "doc_id", root, batchId = 1L)
    val fromIndex = hits(
      Retrieval.phraseSearchFromIndex(spark, root, ph, "phrase_id", "phrase"))
    val direct = hits(
      Retrieval.phraseSearch(base.unionByName(batch), "text", "doc_id",
        ph, "phrase_id", "phrase"))
    assert(fromIndex == direct, s"index=$fromIndex direct=$direct")
    // the appended docs really serve: doc 4's triple occurrence
    assert(fromIndex.contains((1L, 4L, 3L, 0L)))
  }

  test("index-served snippets are bit-identical to the direct slice path") {
    val root = tmp()
    Retrieval.buildPositionalIndex(base, "text", "doc_id", root)
    Retrieval.appendToPositionalIndex(batch, "text", "doc_id", root, batchId = 1L)
    val fromIndex = snips(
      Retrieval.snippetsFromIndex(spark, root, ph, "phrase_id", "phrase", window = 2))
    val direct = snips(
      Retrieval.snippets(base.unionByName(batch), "text", "doc_id",
        ph, "phrase_id", "phrase", window = 2))
    assert(fromIndex == direct, s"index=$fromIndex direct=$direct")
    // reassembly really windows: doc 1's first 'hash table' starts at
    // pos 1, window 2 → snippet from pos 0 covering 'the hash table
    // holds the' (clamp at doc start)
    assert(fromIndex.contains((1L, 1L, 1L, 0L, "the hash table holds the")))
  }

  test("a torn (uncommitted) batch dir is invisible; the replayed append commits over it") {
    val root = tmp()
    Retrieval.buildPositionalIndex(base, "text", "doc_id", root)
    val before = hits(Retrieval.phraseSearchFromIndex(spark, root, ph, "phrase_id", "phrase"))
    val torn = new java.io.File(s"$root/postings", "b" + "%019d".format(7L))
    torn.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(torn.toString, "part-x.parquet"), Array[Byte](1))
    assert(hits(Retrieval.phraseSearchFromIndex(spark, root, ph, "phrase_id", "phrase")) == before)
    Retrieval.appendToPositionalIndex(batch, "text", "doc_id", root, batchId = 7L)
    assert(hits(Retrieval.phraseSearchFromIndex(spark, root, ph, "phrase_id", "phrase")) ==
      hits(Retrieval.phraseSearch(base.unionByName(batch), "text", "doc_id",
        ph, "phrase_id", "phrase")))
  }

  test("replaying a FULLY-committed batch id is a no-op (committed files never deleted)") {
    val root = tmp()
    Retrieval.buildPositionalIndex(base, "text", "doc_id", root)
    val before = hits(Retrieval.phraseSearchFromIndex(spark, root, ph, "phrase_id", "phrase"))
    // a replay carries the same data by contract; passing DIFFERENT
    // data under the committed id proves the skip (nothing rewritten)
    Retrieval.appendToPositionalIndex(batch, "text", "doc_id", root, batchId = 0L)
    assert(hits(Retrieval.phraseSearchFromIndex(spark, root, ph, "phrase_id", "phrase")) == before)
  }

  test("serving an unbuilt index fails loudly") {
    val e = intercept[IllegalStateException] {
      Retrieval.phraseSearchFromIndex(spark, tmp(), ph, "phrase_id", "phrase").collect()
    }
    assert(e.getMessage.contains("buildPositionalIndex"))
  }
}
