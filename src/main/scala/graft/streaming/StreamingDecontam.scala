package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.Retrieval

/** Continuous decontamination monitoring: each micro-batch of crawled
  * documents is (1) appended to the persistent POSITIONAL index
  * ([[graft.functions.Retrieval.appendToPositionalIndex]]) and (2)
  * audited against a fixed eval-sentence list with the exact phrase
  * search — verbatim hits land in the alert table under the batch's
  * own partition. The always-on form of the d19/d48/d70 contamination
  * audits: the check a training pipeline actually SCHEDULES, catching
  * an eval sentence within one micro-batch of it entering the corpus
  * instead of at the next full-corpus sweep. The accumulated index
  * simultaneously serves ad-hoc triage at any time
  * ([[graft.functions.Retrieval.snippetsFromIndex]] for hit contexts,
  * or re-audits with a GROWN phrase list over all history).
  *
  * The batch is tokenized ONCE: the audit reads the batch's own
  * positional postings back from the committed index dir it just wrote
  * rather than re-running posexplode over the documents — the
  * write-once discipline the positional index exists for, applied even
  * inside a single micro-batch.
  *
  * Scale shape: per-batch cost is the batch's own postings probe —
  * phrase terms broadcast (the eval list is small by construction:
  * thousands of sentences), corpus side only the NEW docs — so the
  * monitor's cost is batch-proportional regardless of accumulated
  * corpus size, and nothing rescans history (a doc's contamination is
  * a per-doc property; history was audited when it arrived).
  *
  * Durability/replay: the index append is the committed batch-dir
  * layout (a replayed id is skipped, a torn dir is invisible —
  * PhraseIndexSpec), and alerts dynamic-overwrite their own batch_id
  * partition (the StreamingShift convention), so a replayed batch
  * replaces rather than duplicates its hits. A crash BETWEEN the index
  * write and the alert write replays cleanly: the append skips, the
  * audit re-reads the committed postings, the alert partition is
  * rewritten — both tables end as a single clean run's. */
object StreamingDecontam {

  /** `compactEvery`: run
    * [[graft.functions.Retrieval.compactPositionalIndex]] inside
    * foreachBatch every N committed batches so the always-on monitor's
    * dir count is self-maintaining (the wrapper never absorbs the
    * newest id — the per-batch audit's subset-read of its OWN dir and
    * any replay keep working). Leave None to schedule it externally.
    *
    * `compactGraceMs`: wall-clock sweep grace for those in-stream
    * compactions — the accumulated index is exactly what the triage
    * workflow reads ad hoc WHILE the stream runs
    * ([[graft.functions.Retrieval.snippetsFromIndex]], grown-list
    * re-audits), and two cadence fires inside one long read would
    * otherwise delete dirs under that reader. The default
    * ([[StateStore.defaultInStreamGraceMs]]) covers interactive reads;
    * raise it to ≥ the longest concurrent scan.
    *
    * `anchorK`: when set, each batch ALSO appends its k-gram anchor
    * fingerprints ([[graft.functions.Retrieval.appendToAnchorIndex]],
    * same root, same batch id, replay-skip included), and the cadence
    * compacts the anchor table alongside the postings — so the
    * OVER-CAP ad-hoc re-audit ([[
    * graft.functions.Retrieval.phraseSearchViaAnchors]], the 10⁵⁺-
    * sentence grown-list sweep) can run against the live root at any
    * time. The anchors re-tokenize the batch (one extra pass over the
    * BATCH, never history); leave None when over-cap re-audits are
    * not part of the deployment's triage. */
  def start(
      docs: DataFrame,
      textCol: String,
      docIdCol: String,
      phrases: DataFrame,
      phraseIdCol: String,
      phraseCol: String,
      indexRoot: String,
      outPath: String,
      checkpoint: String,
      minOccurrences: Int = 1,
      trigger: Option[Trigger] = None,
      compactEvery: Option[Int] = None,
      compactGraceMs: Long = StateStore.defaultInStreamGraceMs,
      anchorK: Option[Int] = None): StreamingQuery = {
    val outer = docs.sparkSession
    val writer = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, textCol, docIdCol,
          phrases, phraseIdCol, phraseCol, indexRoot, outPath, minOccurrences,
          anchorK)
        if (compactEvery.exists(n => n > 0 && batchId > 0 && batchId % n == 0)) {
          Retrieval.compactPositionalIndex(outer, indexRoot, compactGraceMs)
          if (anchorK.isDefined)
            Retrieval.compactAnchorIndex(outer, indexRoot, compactGraceMs)
        }
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  /** One micro-batch — package-private so StreamingDecontamSpec can
    * replay a batch directly and assert both tables end as a single
    * clean run's. */
  private[graft] def processBatch(
      batch: DataFrame,
      batchId: Long,
      textCol: String,
      docIdCol: String,
      phrases: DataFrame,
      phraseIdCol: String,
      phraseCol: String,
      indexRoot: String,
      outPath: String,
      minOccurrences: Int,
      anchorK: Option[Int] = None): Unit = {
    val spark = batch.sparkSession
    val sc = spark.sparkContext
    // snapshot so the per-batch transient caches (ours + the hits
    // localCheckpoint below) can be swept afterwards — an always-on
    // monitor would otherwise accumulate one pinned checkpoint block
    // per micro-batch for the stream's lifetime (the StreamingDedup
    // sweep convention)
    val persistedBefore = sc.getPersistentRDDs.keySet
    // cache: the emptiness probe and the index append are two actions
    // on the batch (the audit below reads the STORED postings, not the
    // batch) — without this the source is re-read per action
    val cached = batch.persist()
    try {
      if (!cached.isEmpty) {
        Retrieval.appendToPositionalIndex(cached, textCol, docIdCol, indexRoot, batchId)
        // the anchor table rides the same committed-batch contract (a
        // replayed id skips inside the append itself)
        anchorK.foreach(k =>
          Retrieval.appendToAnchorIndex(cached, textCol, docIdCol, indexRoot, batchId, k))
        // audit THIS batch's postings only — read back from the dir the
        // append just committed (or had already committed, on a replay)
        val batchPostings = StateStore
          .readBatchDirsById(spark, s"$indexRoot/postings", Seq(batchId))
          .getOrElse(throw new IllegalStateException(
            s"positional index batch $batchId missing at $indexRoot after append"))
        val hits = Retrieval
          .phraseSearchFromPostings(batchPostings, phrases,
            phraseIdCol, phraseCol, docIdCol, minOccurrences)
          .withColumn("batch_id", lit(batchId))
          .localCheckpoint(true)
        // empty guard: a clean batch must not leave a schema-less dir.
        // But a REPLAY that recomputes zero hits (legal when the stream
        // restarts with a changed/grown phrase list — the re-audit
        // workflow this operator advertises) must still RETRACT the
        // partition its earlier attempt wrote: dynamic overwrite only
        // replaces partitions present in the written frame, so an empty
        // frame would leave the stale alerts standing
        if (!hits.isEmpty)
          hits.write
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outPath)
        else {
          val stale = new org.apache.hadoop.fs.Path(outPath, s"batch_id=$batchId")
          val fs = stale.getFileSystem(spark.sessionState.newHadoopConf())
          if (fs.exists(stale)) fs.delete(stale, true)
        }
      }
    } finally {
      cached.unpersist()
      (sc.getPersistentRDDs.keySet -- persistedBefore)
        .foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    }
  }
}
