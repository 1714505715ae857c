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

  test("anchor-probe audit equals the classic index serve exactly (both phrase routes)") {
    val root = tmp()
    // doc 6 contains phrase 2's FIRST k-gram ("table scan") context:
    // "table" then a non-matching continuation — wait, with k=2 the
    // anchor IS the whole 2-token phrase; doc 7 gives the true partial-
    // match case for the 3-token phrase: its first 2-gram present, the
    // third token absent — a candidate the exact verify must kill
    val extra = Seq(
      (6L, "deep hash chain start"),
      (7L, "fast hash table without the scan word order")).toDF("doc_id", "text")
    val phrases = Seq(
      (1L, "hash table"), // 2 tokens → anchor route, multi-occurrence
      (2L, "table scan"), // anchor route
      (3L, "missingterm"), // 1 token → short route (k = 2)
      (4L, "hash table without the missingword"), // candidate via doc 7, verify kills
      (5L, "table")) // short route with hits
      .toDF("phrase_id", "phrase")
    val batches = Seq(base, batch, extra)
    batches.zipWithIndex.foreach { case (b, i) =>
      Retrieval.appendToPositionalIndex(b, "text", "doc_id", root, i.toLong)
      Retrieval.appendToAnchorIndex(b, "text", "doc_id", root, i.toLong, k = 2)
    }
    val viaAnchors = hits(Retrieval.phraseSearchViaAnchors(
      spark, root, phrases, "phrase_id", "phrase"))
    val classic = hits(Retrieval.phraseSearchFromIndex(
      spark, root, phrases, "phrase_id", "phrase"))
    assert(viaAnchors == classic, s"anchors=$viaAnchors classic=$classic")
    // the partial-match candidate was killed by the verify
    assert(!viaAnchors.exists(_._1 == 4L))
    // both routes actually produced rows
    assert(viaAnchors.exists(_._1 == 1L) && viaAnchors.exists(_._1 == 5L))
    // a k mismatch on append fails loudly; a probe without anchors too
    val e1 = intercept[IllegalArgumentException] {
      Retrieval.appendToAnchorIndex(extra, "text", "doc_id", root, 3L, k = 3)
    }
    assert(e1.getMessage.contains("k=2"))
    val root2 = tmp()
    Retrieval.buildPositionalIndex(base, "text", "doc_id", root2)
    val e2 = intercept[IllegalStateException] {
      Retrieval.phraseSearchViaAnchors(spark, root2, phrases, "phrase_id", "phrase")
    }
    assert(e2.getMessage.contains("no anchor index"))
  }

  test("anchor index compaction preserves the probe exactly") {
    val root = tmp()
    val batches = Seq(base, batch)
    batches.zipWithIndex.foreach { case (b, i) =>
      Retrieval.appendToPositionalIndex(b, "text", "doc_id", root, i.toLong)
      Retrieval.appendToAnchorIndex(b, "text", "doc_id", root, i.toLong, k = 2)
    }
    val extra2 = Seq((8L, "another hash table row")).toDF("doc_id", "text")
    Retrieval.appendToPositionalIndex(extra2, "text", "doc_id", root, 2L)
    Retrieval.appendToAnchorIndex(extra2, "text", "doc_id", root, 2L, k = 2)
    val before = hits(Retrieval.phraseSearchViaAnchors(spark, root, ph, "phrase_id", "phrase"))
    Retrieval.compactAnchorIndex(spark, root)
    Retrieval.compactPositionalIndex(spark, root)
    assert(hits(Retrieval.phraseSearchViaAnchors(
      spark, root, ph, "phrase_id", "phrase")) == before)
    assert(before.contains((1L, 8L, 1L, 1L)))
  }

  test("over-cap anchor candidates stay distributed and serve the identical audit") {
    val root = tmp()
    Seq(base, batch).zipWithIndex.foreach { case (b, i) =>
      Retrieval.appendToPositionalIndex(b, "text", "doc_id", root, i.toLong)
      Retrieval.appendToAnchorIndex(b, "text", "doc_id", root, i.toLong, k = 2)
    }
    val cap0 = Retrieval.anchorCandCap
    try {
      Retrieval.anchorCandCap = 1 // force the distributed (checkpointed) branch
      val viaAnchors = hits(Retrieval.phraseSearchViaAnchors(
        spark, root, ph, "phrase_id", "phrase"))
      val classic = hits(Retrieval.phraseSearchFromIndex(
        spark, root, ph, "phrase_id", "phrase"))
      assert(viaAnchors == classic, s"anchors=$viaAnchors classic=$classic")
      assert(viaAnchors.nonEmpty)
    } finally Retrieval.anchorCandCap = cap0
  }

  test("anchorRoutingStats reports the k-gram-floor split of an eval list") {
    val root = tmp()
    Retrieval.appendToPositionalIndex(base, "text", "doc_id", root, 0L)
    Retrieval.appendToAnchorIndex(base, "text", "doc_id", root, 0L, k = 2)
    // 2 long (>= 2 tokens), 2 short (1 token) → fraction 0.5
    val evalList = Seq(
      (1L, "hash table"), (2L, "table scan over"), (3L, "hash"), (4L, "scan"))
      .toDF("phrase_id", "phrase")
    assert(Retrieval.anchorRoutingStats(spark, root, evalList, "phrase") ==
      ((4L, 2L, 0.5)))
    // an all-long list reports zero short; an empty list divides safely
    assert(Retrieval.anchorRoutingStats(
      spark, root, evalList.filter($"phrase_id" <= 2), "phrase") == ((2L, 0L, 0.0)))
    assert(Retrieval.anchorRoutingStats(
      spark, root, evalList.limit(0), "phrase") == ((0L, 0L, 0.0)))
    // no anchor index → loud failure, same contract as the probe
    val root2 = tmp()
    Retrieval.buildPositionalIndex(base, "text", "doc_id", root2)
    intercept[IllegalStateException] {
      Retrieval.anchorRoutingStats(spark, root2, evalList, "phrase")
    }
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
