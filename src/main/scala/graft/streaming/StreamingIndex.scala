package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.Retrieval

/** Continuous full-text index ingestion: each micro-batch of documents
  * lands as one committed batch of the persistent BM25 index
  * ([[graft.functions.Retrieval.appendToIndex]]) — the always-on form
  * of the build/append workflow, for a corpus that arrives as a stream
  * (crawl output, curation pipeline tail). Queries serve from
  * [[graft.functions.Retrieval.bm25FromIndex]] at any time and see
  * exactly the fully-committed prefix of the stream.
  *
  * Durability is structural rather than stamped: the index IS a
  * batch-dir table, so exactly-once falls out of the layout — a
  * replayed micro-batch overwrites its own two dirs (idempotent), a
  * torn write has no `_SUCCESS`, and a crash BETWEEN the postings and
  * stats writes leaves that batch out of the serve path's id
  * intersection until the replay completes it (RetrievalIndexSpec).
  * No fold, no stamp, no version chain — per-batch postings are
  * doc-disjoint and the stats row is additive, so batches never touch
  * each other's state.
  *
  * Upstream contract: doc ids must be unique across the stream's
  * lifetime (each doc indexed once). Dedup is its own operator —
  * chain [[StreamingDedup]] in front when the stream can repeat
  * content.
  *
  * A long-lived stream lands one dir per micro-batch; `compactEvery`
  * runs [[graft.functions.Retrieval.compactIndex]] from inside
  * foreachBatch every N committed batches so the dir count is
  * self-maintaining — absorbed batch ids stay committed via the
  * compacted dir's manifest, so replays still skip and serve results
  * are identical. Leave None to schedule compaction externally.
  *
  * `compactGraceMs`: wall-clock sweep grace for those in-stream
  * compactions — the index serves ad-hoc queries WHILE the stream
  * runs, and two cadence fires inside one long read would otherwise
  * delete dirs under that reader. The default
  * ([[StateStore.defaultInStreamGraceMs]]) covers interactive reads;
  * raise it to ≥ the longest concurrent scan. */
object StreamingIndex {

  def start(
      docs: DataFrame,
      textCol: String,
      docIdCol: String,
      indexRoot: String,
      checkpoint: String,
      trigger: Option[Trigger] = None,
      compactEvery: Option[Int] = None,
      compactGraceMs: Long = StateStore.defaultInStreamGraceMs): StreamingQuery = {
    val outer = docs.sparkSession
    val writer = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // cache: the emptiness probe plus the postings and stats writes
        // are three actions — without this the source is re-read and
        // re-tokenized per action on the always-on path
        val cached = batch.persist()
        try {
          if (!cached.isEmpty) {
            Retrieval.appendToIndex(cached, textCol, docIdCol, indexRoot, batchId)
          }
        } finally cached.unpersist()
        // the wrapper compacts only the fully-visible prefix and never
        // the newest id, so an in-stream compaction cannot break a
        // replay of the batch that just committed
        if (compactEvery.exists(n => n > 0 && batchId > 0 && batchId % n == 0))
          Retrieval.compactIndex(outer, indexRoot, compactGraceMs)
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}
