package graft

import graft.functions.Retrieval
import graft.streaming.StateStore
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Batch-dir compaction contract: a long-lived stream lands one
  * committed dir per micro-batch forever; [[StateStore.compactBatchDirs]]
  * bounds the dir count while preserving every replay/read contract —
  * absorbed ids stay committed (manifest), readers see identical data,
  * torn compactions are invisible, subset reads of a compacted dir fail
  * loudly, and the beforeBatch-bounded streaming read still works. */
class CompactionStateSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_compact").toString

  private def write(root: String, id: Long, values: Seq[Long]): Unit =
    StateStore.writeBatchDir(values.toDF("fp"), root, id)

  private def readAll(root: String, before: Option[Long] = None): Set[Long] =
    StateStore.readCommittedBatchDirs(spark, root, before)
      .map(_.as[Long].collect().toSet).getOrElse(Set.empty)

  private def dirCount(root: String): Int =
    new java.io.File(root).listFiles().count(_.isDirectory)

  test("compaction preserves data, ids, and replay-skip; dir count drops to one") {
    val root = tmp()
    (0L to 4L).foreach(i => write(root, i, Seq(10 * i, 10 * i + 1)))
    val before = readAll(root)
    assert(dirCount(root) == 5)
    StateStore.compactBatchDirs(spark, root, upTo = 4L)
    assert(dirCount(root) == 1, "absorbed sources must be swept")
    assert(readAll(root) == before, "compaction must not change the data")
    assert(StateStore.committedBatchIds(spark, root) == (0L to 4L),
      "absorbed ids must stay committed so replayed writers skip")
    // further appends coexist with the compacted dir
    write(root, 5L, Seq(50L))
    assert(readAll(root) == before + 50L)
    assert(StateStore.committedBatchIds(spark, root) == (0L to 5L))
    // re-compaction absorbs the compacted dir + the new batch
    StateStore.compactBatchDirs(spark, root, upTo = 5L)
    assert(dirCount(root) == 1)
    assert(readAll(root) == before + 50L)
    // compacting an already-compact root is a no-op (must not delete
    // its own input via overwrite)
    StateStore.compactBatchDirs(spark, root, upTo = 5L)
    assert(readAll(root) == before + 50L)
  }

  test("a torn compaction (parquet committed, no manifest) is invisible; sources survive") {
    val root = tmp()
    (0L to 2L).foreach(i => write(root, i, Seq(i)))
    // simulate the crash window: compacted parquet fully written
    // (_SUCCESS present) but the manifest — the commit point — missing
    Seq(0L, 1L, 2L).toDF("fp").write.parquet(s"$root/c${"%019d".format(2L)}")
    assert(readAll(root) == Set(0L, 1L, 2L))
    assert(StateStore.committedBatchIds(spark, root) == (0L to 2L))
    // the retried compaction commits over it
    StateStore.compactBatchDirs(spark, root, upTo = 2L)
    assert(readAll(root) == Set(0L, 1L, 2L))
    assert(dirCount(root) == 1)
  }

  test("a crash mid-sweep (absorbed b-dir left behind) does not double-count") {
    val root = tmp()
    (0L to 2L).foreach(i => write(root, i, Seq(i)))
    StateStore.compactBatchDirs(spark, root, upTo = 2L)
    // resurrect an absorbed b-dir, as a crash between manifest write
    // and source deletion would leave it
    write(root, 1L, Seq(1L))
    assert(readAll(root) == Set(0L, 1L, 2L), "newest-wins: no duplicate rows")
    assert(StateStore.committedBatchIds(spark, root) == (0L to 2L))
    // the next compaction sweeps the leftover
    write(root, 3L, Seq(3L))
    StateStore.compactBatchDirs(spark, root, upTo = 3L)
    assert(dirCount(root) == 1)
    assert(readAll(root) == Set(0L, 1L, 2L, 3L))
  }

  test("subset-reading a compacted dir fails loudly") {
    val root = tmp()
    (0L to 2L).foreach(i => write(root, i, Seq(i)))
    StateStore.compactBatchDirs(spark, root, upTo = 2L)
    val e = intercept[IllegalStateException] {
      StateStore.readBatchDirsById(spark, root, Seq(0L, 1L))
    }
    assert(e.getMessage.contains("subset"))
  }

  test("the beforeBatch-bounded streaming read works over compacted state and guards the frontier") {
    val root = tmp()
    (0L to 3L).foreach(i => write(root, i, Seq(i)))
    StateStore.compactBatchDirs(spark, root, upTo = 2L)
    // a replay of batch 3 reads strictly-before state: the compacted
    // 0-2 plus nothing of b3's own crashed-attempt dir
    assert(readAll(root, before = Some(3L)) == Set(0L, 1L, 2L))
    // compacting ACROSS the replay frontier is rejected at read time
    StateStore.compactBatchDirs(spark, root, upTo = 3L)
    val e = intercept[IllegalStateException] { readAll(root, before = Some(3L)) }
    assert(e.getMessage.contains("spans the replay bound"))
  }

  test("BM25 index compaction: serve identical, df table folded, replayed append still skips") {
    val root = tmp()
    val base = Seq((1L, "spark hash join fast"), (2L, "hash hash table scan")).toDF("doc_id", "text")
    val batch = Seq((3L, "slow table scan"), (4L, "spark spark spark")).toDF("doc_id", "text")
    val qs = Seq((1L, "hash table"), (2L, "spark join")).toDF("query_id", "query")
    def rows(df: DataFrame) =
      df.select($"query_id", $"doc_id", $"n_terms_matched", $"score", $"rank")
        .as[(Long, Long, Long, Double, Long)].collect().toSet
    Retrieval.buildIndex(base, "text", "doc_id", root)
    Retrieval.appendToIndex(batch, "text", "doc_id", root, batchId = 1L)
    val before = rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5))
    Retrieval.compactIndex(spark, root)
    assert(rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5)) == before)
    for (part <- Seq("postings", "stats", "df"))
      assert(dirCount(s"$root/$part") == 1, s"$part not compacted")
    // a replayed absorbed append is still a no-op (different data under
    // the committed id proves the skip)
    Retrieval.appendToIndex(base, "text", "doc_id", root, batchId = 1L)
    assert(rows(Retrieval.bm25FromIndex(spark, root, qs, "query_id", "query", 5)) == before)
  }

  test("positional index compaction: phrase audit and snippets identical") {
    val root = tmp()
    val base = Seq((1L, "the hash table holds the hash")).toDF("doc_id", "text")
    val batch = Seq((2L, "hash table hash table")).toDF("doc_id", "text")
    val ph = Seq((1L, "hash table")).toDF("phrase_id", "phrase")
    Retrieval.buildPositionalIndex(base, "text", "doc_id", root)
    Retrieval.appendToPositionalIndex(batch, "text", "doc_id", root, batchId = 1L)
    def hits() = Retrieval.phraseSearchFromIndex(spark, root, ph, "phrase_id", "phrase")
      .select($"doc_id", $"n_occurrences", $"first_pos")
      .as[(Long, Long, Long)].collect().toSet
    def snips() = Retrieval.snippetsFromIndex(spark, root, ph, "phrase_id", "phrase", 1)
      .select($"doc_id", $"snippet").as[(Long, String)].collect().toSet
    val (h0, s0) = (hits(), snips())
    Retrieval.compactPositionalIndex(spark, root)
    assert(dirCount(s"$root/postings") == 1)
    assert(hits() == h0 && snips() == s0)
  }
}
