package graft

import graft.functions.Retrieval
import graft.streaming.{StateStore, StreamingDedup}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Batch-dir compaction contract: a long-lived stream lands one
  * committed dir per micro-batch forever; [[StateStore.compactBatchDirs]]
  * bounds the dir count while preserving every replay/read contract —
  * absorbed ids stay committed (atomically-renamed manifest), readers
  * see identical data, absorbed sources survive ONE GENERATION for
  * in-flight readers, torn compactions are invisible, subset reads and
  * frontier straddles fail loudly, and the wrappers never absorb the
  * newest batch (a replay window only the checkpoint knows about). */
class CompactionStateSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_compact").toString

  private def write(root: String, id: Long, values: Seq[Long]): Unit =
    StateStore.writeBatchDir(values.toDF("fp"), root, id)

  private def readAll(root: String, before: Option[Long] = None): Set[Long] =
    StateStore.readCommittedBatchDirs(spark, root, before)
      .map(_.as[Long].collect().toSet).getOrElse(Set.empty)

  private def dirs(root: String): Seq[String] =
    new java.io.File(root).listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq

  test("compaction preserves data, ids, and replay-skip; generations sweep sources") {
    val root = tmp()
    (0L to 4L).foreach(i => write(root, i, Seq(10 * i, 10 * i + 1)))
    val before = readAll(root)
    StateStore.compactBatchDirs(spark, root, ids = 0L to 4L)
    // grace: the absorbed b-dirs SURVIVE their own generation (an
    // in-flight reader that listed them pre-manifest keeps reading
    // live files) but readers that list now resolve to the c-dir
    assert(dirs(root).count(_.startsWith("c")) == 1)
    assert(dirs(root).count(_.startsWith("b")) == 5)
    assert(readAll(root) == before, "compaction must not change the data")
    assert(StateStore.committedBatchIds(spark, root) == (0L to 4L),
      "absorbed ids must stay committed so replayed writers skip")
    // further appends coexist; the next generation sweeps gen-1 sources
    write(root, 5L, Seq(50L))
    assert(readAll(root) == before + 50L)
    StateStore.compactBatchDirs(spark, root, ids = 0L to 5L)
    assert(dirs(root).count(_.startsWith("c")) == 2, "gen-1 c-dir is gen-2's grace copy")
    assert(dirs(root).count(_.startsWith("b")) == 1, "gen-1 b-dirs swept; gen-2's b5 is grace")
    assert(readAll(root) == before + 50L)
    assert(StateStore.committedBatchIds(spark, root) == (0L to 5L))
    // third generation: gen-2 leftovers go too
    write(root, 6L, Seq(60L))
    StateStore.compactBatchDirs(spark, root, ids = 0L to 6L)
    assert(readAll(root) == before + 50L + 60L)
    assert(dirs(root).count(_.startsWith("c")) == 2)
    assert(dirs(root).count(_.startsWith("b")) == 1)
  }

  test("an exact-retry is a no-op that still sweeps previous generations") {
    val root = tmp()
    (0L to 2L).foreach(i => write(root, i, Seq(i)))
    StateStore.compactBatchDirs(spark, root, ids = 0L to 2L)
    write(root, 3L, Seq(3L))
    StateStore.compactBatchDirs(spark, root, ids = 0L to 3L)
    val snapshot = readAll(root)
    // retry of the SAME compaction (crash-recovery path): no rewrite,
    // but the gen-1 leftovers still get swept
    StateStore.compactBatchDirs(spark, root, ids = 0L to 3L)
    assert(readAll(root) == snapshot)
    assert(dirs(root).count(_.startsWith("c")) == 2)
  }

  test("a torn compaction (parquet committed, no manifest) is invisible and later swept") {
    val root = tmp()
    (0L to 2L).foreach(i => write(root, i, Seq(i)))
    // crash window: compacted parquet fully written (_SUCCESS present)
    // but the manifest — the commit point — missing
    Seq(0L, 1L, 2L).toDF("fp").write.parquet(s"$root/c${"%019d".format(1L)}")
    assert(readAll(root) == Set(0L, 1L, 2L))
    assert(StateStore.committedBatchIds(spark, root) == (0L to 2L))
    // a leftover temp manifest must not count as committed either
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/c${"%019d".format(1L)}", "_merged_ids.tmp"),
      "0\n1\n".getBytes("UTF-8"))
    assert(StateStore.committedBatchIds(spark, root) == (0L to 2L))
    // the retried compaction commits at its own target; the torn dir
    // (older name) is swept
    StateStore.compactBatchDirs(spark, root, ids = 0L to 2L)
    assert(readAll(root) == Set(0L, 1L, 2L))
    assert(!dirs(root).contains("c" + "%019d".format(1L)), "torn c-dir must be swept")
  }

  test("a resurrected absorbed b-dir does not double-count (newest-wins)") {
    val root = tmp()
    (0L to 2L).foreach(i => write(root, i, Seq(i)))
    StateStore.compactBatchDirs(spark, root, ids = 0L to 2L)
    // a replayed absorbed writer may rewrite its dir (same data by the
    // replay contract) — readers must not read it twice
    write(root, 1L, Seq(1L))
    assert(readAll(root) == Set(0L, 1L, 2L))
    assert(StateStore.committedBatchIds(spark, root) == (0L to 2L))
  }

  test("compacting uncommitted ids or splitting an existing compaction fails loudly") {
    val root = tmp()
    (0L to 2L).foreach(i => write(root, i, Seq(i)))
    val e1 = intercept[IllegalArgumentException] {
      StateStore.compactBatchDirs(spark, root, ids = Seq(0L, 7L))
    }
    assert(e1.getMessage.contains("uncommitted"))
    StateStore.compactBatchDirs(spark, root, ids = 0L to 2L)
    write(root, 3L, Seq(3L))
    // requesting a subset of the existing compaction's ids throws at
    // the merged read (cannot subset-read a compacted dir)
    val e2 = intercept[IllegalStateException] {
      StateStore.compactBatchDirs(spark, root, ids = Seq(1L, 2L, 3L))
    }
    assert(e2.getMessage.contains("subset"))
    // same target name with a different id set is a collision, not an
    // overwrite of the dir being read
    val e3 = intercept[IllegalStateException] {
      StateStore.compactBatchDirs(spark, root, ids = Seq(1L, 2L))
    }
    assert(e3.getMessage.contains("include every id"))
  }

  test("subset-reading a compacted dir fails loudly") {
    val root = tmp()
    (0L to 2L).foreach(i => write(root, i, Seq(i)))
    StateStore.compactBatchDirs(spark, root, ids = 0L to 2L)
    val e = intercept[IllegalStateException] {
      StateStore.readBatchDirsById(spark, root, Seq(0L, 1L))
    }
    assert(e.getMessage.contains("subset"))
  }

  test("the beforeBatch-bounded streaming read works over compacted state and guards the frontier") {
    val root = tmp()
    (0L to 3L).foreach(i => write(root, i, Seq(i)))
    StateStore.compactBatchDirs(spark, root, ids = 0L to 2L)
    // a replay of batch 3 reads strictly-before state: the compacted
    // 0-2 plus nothing of b3's own crashed-attempt dir
    assert(readAll(root, before = Some(3L)) == Set(0L, 1L, 2L))
    // compacting ACROSS the replay frontier is rejected at read time
    StateStore.compactBatchDirs(spark, root, ids = 0L to 3L)
    val e = intercept[IllegalStateException] { readAll(root, before = Some(3L)) }
    assert(e.getMessage.contains("spans the replay bound"))
  }

  test("compactFpIndex never absorbs the newest batch: the dedup replay read keeps working") {
    val root = tmp()
    (0L to 4L).foreach(i => write(root, i, Seq(100 + i)))
    StreamingDedup.compactFpIndex(spark, root)
    // batch 4 (the possible replay window) stays in its own dir
    assert(StateStore.committedBatchIds(spark, root) == (0L to 4L))
    assert(dirs(root).contains("b" + "%019d".format(4L)))
    // the replayed batch 4 can still bound its read strictly before
    // itself — the exact call StreamingDedup.processBatch makes
    assert(readAll(root, before = Some(4L)) == Set(100L, 101L, 102L, 103L))
  }

  test("duplicate caller ids canonicalize: the manifest is distinct+sorted") {
    val root = tmp()
    (0L to 2L).foreach(i => write(root, i, Seq(i)))
    StateStore.compactBatchDirs(spark, root, ids = Seq(2L, 0L, 0L, 1L, 1L))
    val mf = java.nio.file.Paths.get(s"$root/c${"%019d".format(2L)}", "_merged_ids")
    assert(new String(java.nio.file.Files.readAllBytes(mf), "UTF-8") == "0\n1\n2\n")
    // a clean retry with the canonical ids is the no-op path
    StateStore.compactBatchDirs(spark, root, ids = 0L to 2L)
    assert(readAll(root) == Set(0L, 1L, 2L))
    assert(StateStore.committedBatchIds(spark, root) == (0L to 2L))
  }

  test("sweepGraceMs floors the reader grace in wall-clock time") {
    val root = tmp()
    (0L to 2L).foreach(i => write(root, i, Seq(i)))
    StateStore.compactBatchDirs(spark, root, ids = 0L to 2L)
    write(root, 3L, Seq(3L))
    // back-to-back second compaction with a long grace: gen-1's b-dirs
    // and c-dir must SURVIVE (a reader that listed paths just before
    // the new manifest landed may still be reading them)
    StateStore.compactBatchDirs(spark, root, ids = 0L to 3L,
      sweepGraceMs = 60 * 60 * 1000L)
    assert(dirs(root).count(_.startsWith("b")) == 4, "b-dirs within grace survive")
    assert(dirs(root).count(_.startsWith("c")) == 2)
    assert(readAll(root) == Set(0L, 1L, 2L, 3L))
    assert(StateStore.committedBatchIds(spark, root) == (0L to 3L))
    // once the grace elapses (here: 0) a retrying sweep clears gen-1's
    // b-dirs; b3 is the newest generation's own grace copy and stays
    StateStore.compactBatchDirs(spark, root, ids = 0L to 3L)
    assert(dirs(root).count(_.startsWith("b")) == 1)
    assert(dirs(root).count(_.startsWith("c")) == 2, "newest grace copy still kept")
    assert(readAll(root) == Set(0L, 1L, 2L, 3L))
  }

  test("the grace clock is per-id FIRST shadow: cumulative manifests don't reset it") {
    val root = tmp()
    (0L to 2L).foreach(i => write(root, i, Seq(i)))
    StateStore.compactBatchDirs(spark, root, ids = 0L to 2L) // gen 1, t0
    write(root, 3L, Seq(3L))
    Thread.sleep(1500)
    // gen 2's manifest re-lists ids 0-2 (cumulative, the wrapper
    // pattern). With a latest-shadow clock that would RESET the grace
    // and retain gen-1's dirs forever under an always-on cadence; the
    // per-id first-shadow clock (gen 1's manifest, 1.5 s old) has
    // elapsed, so the sweep proceeds
    StateStore.compactBatchDirs(spark, root, ids = 0L to 3L, sweepGraceMs = 1000L)
    assert(dirs(root).count(_.startsWith("b")) == 1, dirs(root)) // b3 = newest grace copy
    assert(readAll(root) == Set(0L, 1L, 2L, 3L))
    assert(StateStore.committedBatchIds(spark, root) == (0L to 3L))
  }

  test("an ad-hoc reader survives two back-to-back in-stream compactions under grace") {
    val root = tmp()
    (0L to 3L).foreach(i => write(root, i, Seq(i)))
    // the ad-hoc reader resolves its file listing NOW — exactly the
    // serve-while-streaming shape (bm25FromIndex / snippetsFromIndex
    // construct a frame over the dirs committed at call time)
    val reader = StateStore.readCommittedBatchDirs(spark, root).get
    val grace = 60 * 60 * 1000L
    // TWO cadence fires land while the read is notionally in flight —
    // without the grace floor the second generation would sweep the
    // first's b-dirs out from under the reader
    graft.streaming.StreamingDedup.compactFpIndex(spark, root, sweepGraceMs = grace)
    write(root, 4L, Seq(4L))
    graft.streaming.StreamingDedup.compactFpIndex(spark, root, sweepGraceMs = grace)
    assert(dirs(root).count(_.startsWith("b")) == 5, "all listed b-dirs survive the grace")
    assert(reader.as[Long].collect().toSet == Set(0L, 1L, 2L, 3L),
      "the in-flight read completes with the data it listed")
    // fresh readers resolve newest-wins as usual
    assert(readAll(root) == Set(0L, 1L, 2L, 3L, 4L))
    assert(StateStore.committedBatchIds(spark, root) == (0L to 4L))
  }

  test("a concurrent compactor's lease makes the loser skip cleanly, and a stale lease is stolen") {
    val root = tmp()
    (0L to 2L).foreach(i => write(root, i, Seq(i)))
    // another compactor (external maintenance job racing the in-stream
    // cadence) holds a FRESH lease on the same root
    val lease = java.nio.file.Paths.get(root, "_compact_lease")
    java.nio.file.Files.write(lease, "0".getBytes("UTF-8"))
    assert(!StateStore.compactBatchDirs(spark, root, ids = 0L to 2L),
      "the loser reports the skip")
    assert(dirs(root).count(_.startsWith("c")) == 0, "the loser must not compact")
    // the in-stream cadence path is the same skip — the stream survives
    // the race with no throw and no partial work
    graft.streaming.StreamingDedup.compactFpIndex(spark, root)
    assert(dirs(root).count(_.startsWith("c")) == 0)
    assert(readAll(root) == Set(0L, 1L, 2L))
    assert(StateStore.committedBatchIds(spark, root) == (0L to 2L))
    // a lease older than the TTL is a crashed compactor's: stolen, and
    // the compaction proceeds; the winner releases on completion
    assert(lease.toFile.setLastModified(System.currentTimeMillis() - 60000L))
    assert(StateStore.compactBatchDirs(spark, root, ids = 0L to 2L,
      leaseTtlMs = 30000L))
    assert(dirs(root).count(_.startsWith("c")) == 1)
    assert(!lease.toFile.exists, "lease released after the compaction")
    assert(readAll(root) == Set(0L, 1L, 2L))
  }

  test("BM25 index compaction: serve identical, newest batch preserved, replayed append skips") {
    val root = tmp()
    val base = Seq((1L, "spark hash join fast"), (2L, "hash hash table scan")).toDF("doc_id", "text")
    val b1 = Seq((3L, "slow table scan")).toDF("doc_id", "text")
    val b2 = Seq((4L, "spark spark spark")).toDF("doc_id", "text")
    val qs = Seq((1L, "hash table"), (2L, "spark join")).toDF("query_id", "query")
    def rows(df: DataFrame) =
      df.select($"query_id", $"doc_id", $"n_terms_matched", $"score", $"rank")
        .as[(Long, Long, Long, Double, Long)].collect().toSet
    Retrieval.buildIndex(base, "text", "doc_id", root)
    Retrieval.appendToIndex(b1, "text", "doc_id", root, batchId = 1L)
    Retrieval.appendToIndex(b2, "text", "doc_id", root, batchId = 2L)
    val before = rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5))
    Retrieval.compactIndex(spark, root)
    assert(rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5)) == before)
    for (part <- Seq("postings", "stats", "df")) {
      assert(StateStore.committedBatchIds(spark, s"$root/$part") == (0L to 2L))
      // batch 2 (newest) keeps its own dirs for the replay window
      assert(dirs(s"$root/$part").contains("b" + "%019d".format(2L)), part)
      assert(dirs(s"$root/$part").count(_.startsWith("c")) == 1, part)
    }
    // a replayed absorbed append is still a no-op (different data under
    // the committed id proves the skip)
    Retrieval.appendToIndex(base, "text", "doc_id", root, batchId = 1L)
    assert(rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5)) == before)
  }

  test("positional index compaction: phrase audit, snippets, and the decontam replay read survive") {
    val root = tmp()
    val batches = Seq(
      Seq((1L, "the hash table holds the hash")),
      Seq((2L, "hash table hash table")),
      Seq((3L, "a fast hash table scan")))
    batches.zipWithIndex.foreach { case (b, i) =>
      Retrieval.appendToPositionalIndex(b.toDF("doc_id", "text"), "text", "doc_id", root, i.toLong)
    }
    val ph = Seq((1L, "hash table")).toDF("phrase_id", "phrase")
    def hits() = Retrieval.phraseSearchFromIndex(spark, root, ph, "phrase_id", "phrase")
      .select($"doc_id", $"n_occurrences", $"first_pos")
      .as[(Long, Long, Long)].collect().toSet
    def snips() = Retrieval.snippetsFromIndex(spark, root, ph, "phrase_id", "phrase", 1)
      .select($"doc_id", $"snippet").as[(Long, String)].collect().toSet
    val (h0, s0) = (hits(), snips())
    Retrieval.compactPositionalIndex(spark, root)
    assert(hits() == h0 && snips() == s0)
    // the newest batch stays readable BY ID — StreamingDecontam's
    // replay audit reads exactly that dir
    val own = StateStore.readBatchDirsById(spark, s"$root/postings", Seq(2L))
    assert(own.isDefined && own.get.count() > 0)
  }
}
