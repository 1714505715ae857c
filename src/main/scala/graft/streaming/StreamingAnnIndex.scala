package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.Similarity

/** Continuous ANN-index ingestion: each micro-batch of fresh embeddings
  * is routed and PQ-encoded under the FROZEN model (coarse centroids +
  * codebooks trained once on the base corpus — the d56
  * [[graft.functions.Similarity.ivfPqIndexAppend]] contract) and lands
  * as one committed batch of a persistent (id, bucket, codes) table —
  * the always-on form of the daily-ingest append, completing the
  * "every stored index has a streaming form" symmetry with
  * [[StreamingIndex]] (BM25) and [[StreamingDecontam]] (positional).
  *
  * Because routing and encoding are PER-ROW functions of the frozen
  * model, the accumulated table is bit-identical to a one-shot append
  * of the same rows (StreamingAnnIndexSpec locks this) — batches never
  * touch each other's state, so exactly-once falls out of the
  * batch-dir layout exactly as for [[StreamingIndex]]: a replayed id
  * is skipped, a torn dir has no `_SUCCESS` and is invisible. Model
  * STALENESS (when to retrain and re-encode) is the deployment's
  * cadence decision, same as the batch path.
  *
  * Scale shape: per-batch cost is the batch's own route+encode (two
  * broadcast-join scans of the batch — the kilobyte model broadcasts,
  * the corpus never does); the model trains ONCE on `base` and is
  * memoized under `root`-derived key, so restarts re-derive the same
  * frozen model from the same base instead of drifting. Batch dirs are
  * bucket-clustered (range + sort) so a serve path probing nProbe
  * buckets row-group-prunes the accumulated table.
  *
  * Upstream contract: embedding ids must be unique across the stream's
  * lifetime (each vector indexed once) — chain [[StreamingDedup]] or an
  * id-dedup in front when the stream can repeat.
  *
  * `compactEvery`/`compactGraceMs`: the [[StreamingIndex]] cadence
  * contract — [[compactAnnIndex]] runs inside foreachBatch every N
  * batches, never absorbing the newest id; the grace default
  * ([[StateStore.defaultInStreamGraceMs]]) protects concurrent ad-hoc
  * readers of the accumulated table. */
object StreamingAnnIndex {

  /** The accumulated committed (id, bucket, codes) table at `root` —
    * the corpus side a serve path joins against. Throws when nothing
    * has committed yet. */
  def codesAt(spark: SparkSession, root: String): DataFrame =
    StateStore.readCommittedBatchDirs(spark, s"$root/codes")
      .getOrElse(throw new IllegalStateException(
        s"no committed ANN-index batch at $root — start the stream or " +
          "append a batch first"))

  private def bucketClustered(df: DataFrame): DataFrame =
    df.repartitionByRange(col("bucket")).sortWithinPartitions(col("bucket"), col("id"))

  /** Compact the ANN table's batch dirs, bucket-re-clustered (never the
    * newest id — the replay-window rule). Grace as
    * [[graft.functions.Retrieval.compactIndex]]. */
  def compactAnnIndex(
      spark: SparkSession, root: String, sweepGraceMs: Long = 0L): Unit = {
    val ids = StateStore.committedBatchIds(spark, s"$root/codes")
      .sorted.dropRight(1)
    if (ids.length >= 2)
      StateStore.compactBatchDirs(spark, s"$root/codes", ids,
        bucketClustered, sweepGraceMs)
  }

  /** One micro-batch — package-private so the spec can replay a batch
    * directly. A fully-committed id is skipped (rewriting a committed
    * dir in place would transiently delete its files under a concurrent
    * reader — the appendToIndex convention). */
  private[graft] def processBatch(
      batch: DataFrame,
      batchId: Long,
      base: DataFrame,
      idCol: String,
      vecCol: String,
      root: String,
      nLists: Int,
      nSub: Int,
      kSub: Int,
      iters: Int,
      sampleN: Int): Unit = {
    // model memo key derived from the index root: every batch (and
    // every restart) re-derives the SAME frozen model from the same
    // base — encode drift across batches would corrupt ADC distances
    val modelKey = Some(s"streaming_ann:$root")
    val spark = base.sparkSession
    val done = StateStore.committedBatchIds(spark, s"$root/codes")
    if (!done.contains(batchId)) {
      val cached = batch.persist()
      try {
        if (!cached.isEmpty) {
          val encoded = Similarity.ivfPqIndexAppend(
            base, cached, idCol, vecCol, nLists, nSub, kSub, iters, sampleN,
            cacheKey = modelKey)
          StateStore.writeBatchDir(
            bucketClustered(encoded), s"$root/codes", batchId)
        }
      } finally cached.unpersist()
    }
  }

  def start(
      vecs: DataFrame,
      base: DataFrame,
      idCol: String,
      vecCol: String,
      indexRoot: String,
      checkpoint: String,
      nLists: Int = 32,
      nSub: Int = 16,
      kSub: Int = 32,
      iters: Int = 3,
      sampleN: Int = 100000,
      trigger: Option[Trigger] = None,
      compactEvery: Option[Int] = None,
      compactGraceMs: Long = StateStore.defaultInStreamGraceMs): StreamingQuery = {
    val outer = base.sparkSession
    val writer = vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, base, idCol, vecCol, indexRoot,
          nLists, nSub, kSub, iters, sampleN)
        if (compactEvery.exists(n => n > 0 && batchId > 0 && batchId % n == 0))
          compactAnnIndex(outer, indexRoot, compactGraceMs)
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}
