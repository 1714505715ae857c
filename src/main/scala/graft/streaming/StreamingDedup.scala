package graft.streaming

import java.io.ByteArrayInputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.IncrementalDedup

/** Continuous-crawl deduplication: a STREAM of new documents deduped
  * against a static corpus index AND against everything the stream has
  * already kept — the always-on form of [[IncrementalDedup]] (whose
  * batch shape is the reference's incremental slice,
  * /root/reference/05_prod_dev.py:1054-1101, upgraded from "re-filter a
  * date slice" to genuinely stateful streaming dedup).
  *
  * Semantics per micro-batch N: a doc is kept when < `dropAt` of its
  * shingle mass exists in (corpus ∪ kept docs of batches 1..N−1) —
  * bit-identical to running [[IncrementalDedup.passageDedupStats]] by
  * hand with that union as the index (locked by StreamingDedupSpec).
  * Docs WITHIN one micro-batch don't dedup against each other, matching
  * the batch operator; run [[graft.functions.Dedup]] inside the batch
  * first if that matters.
  *
  * Scale design (100 TB corpus, continuous batches):
  *   - The growing stream index is an APPEND-ONLY parquet table of
  *     distinct new fps — each batch appends only fingerprints it is the
  *     first to contribute (so the table stays near-minimal and the
  *     append is proportional to NOVEL content). Each batch's
  *     contribution lands in its own committed dir
  *     ([[StateStore.writeBatchDir]]) rather than `mode("append")`: a
  *     torn append could leave a truncated part-file that poisons every
  *     later read of the index, while a torn batch dir has no `_SUCCESS`
  *     and is invisible.
  *   - The bloom sketch is maintained INCREMENTALLY on the driver:
  *     batch partials are built distributed with the SAME geometry
  *     (`sizeFor = expectedTotalKeys`) and merged into the running
  *     sketch — never rebuilt from the full index between batches. On
  *     START it is seeded from corpus ∪ the COMMITTED stream index, so
  *     a restarted stream still screens against everything earlier runs
  *     kept (the bloom is a hard pre-filter before the exact join — a
  *     static-only seed would silently re-admit duplicates of
  *     previously-kept stream docs).
  *   - Exactly-once output: foreachBatch + checkpoint gives batch-id
  *     replay; both writes are replay-IDEMPOTENT — the decisions
  *     dynamic-overwrite their own batch_id partition, the fp
  *     contribution overwrites its own batch dir, and the index READ is
  *     bounded to batches strictly BEFORE the current id (a replayed
  *     batch whose fp dir committed before the crash must not find its
  *     own output in its input: it would flip its docs to duplicates
  *     and overwrite the dir with nothing).
  */
object StreamingDedup {

  /** Start the dedup stream. `docs` is a streaming DataFrame with
    * (`idCol`, `textCol`); decisions land in `outPath` (one row per doc:
    * id, n_shingles, n_dup_shingles, dup_fraction, keep, batch_id); new
    * fps append to `streamIdxPath`. */
  def start(
      docs: DataFrame,
      staticIndex: DataFrame,
      outPath: String,
      streamIdxPath: String,
      checkpoint: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 8,
      fpp: Double = 0.01,
      dropAt: Double = 0.5,
      expectedTotalKeys: Long = 10000000L,
      portable: Boolean = true,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val session = new Session(
      docs.sparkSession, staticIndex, outPath, streamIdxPath, textCol, idCol,
      shingleSize, fpp, dropAt, expectedTotalKeys, portable)
    val writer = docs.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        session.processBatch(batch, batchId)
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  /** The driver-side state and per-batch fold, extracted so the replay
    * and restart semantics are directly testable (StreamingDedupSpec
    * drives processBatch without a stream). Construction = restart:
    * the bloom seeds from corpus ∪ committed stream fps. */
  private[graft] final class Session(
      spark: org.apache.spark.sql.SparkSession,
      staticIndex: DataFrame,
      outPath: String,
      streamIdxPath: String,
      textCol: String,
      idCol: String,
      shingleSize: Int,
      fpp: Double,
      dropAt: Double,
      expectedTotalKeys: Long,
      portable: Boolean) {

    private val static = staticIndex.select(col("fp")).distinct().cache()

    // the running sketch over corpus ∪ kept stream fps; foreachBatch
    // runs batches sequentially, so plain mutation is safe. Seeded from
    // the COMMITTED index so restarts keep screening past stream keeps.
    private var bloom: BloomFilter = {
      val seedIdx = StateStore.readCommittedBatchDirs(spark, streamIdxPath)
        .map(s => static.unionByName(s.select(col("fp"))))
        .getOrElse(static)
      BloomFilter.readFrom(new ByteArrayInputStream(
        IncrementalDedup.buildBloom(seedIdx, fpp, sizeFor = Some(expectedTotalKeys))))
    }

    /** Whether `fp` might already be indexed — spec hook for the
      * restart-seeding contract. */
    private[graft] def mightContain(fp: Long): Boolean = bloom.mightContainLong(fp)

    private[graft] def processBatch(batch: DataFrame, batchId: Long): Unit = {
      val sc = spark.sparkContext
      val persistedBefore = sc.getPersistentRDDs.keySet
      // index as of batches < batchId: a replayed batch must not read
      // its own crashed attempt's committed dir
      val streamIdx = StateStore
        .readCommittedBatchDirs(spark, streamIdxPath, beforeBatch = Some(batchId))
        .getOrElse(spark.emptyDataFrame.select(lit(0L).as("fp")).limit(0))
      val idx = static.unionByName(streamIdx.select(col("fp")))
      val bloomBytes = { // serialize the CURRENT sketch for this batch
        val bos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(bos); bos.toByteArray
      }
      val stats = IncrementalDedup
        .passageDedupStats(batch, idx, textCol, idCol,
          shingleSize = shingleSize, fpp = fpp, dropAt = dropAt,
          portable = portable, prebuiltBloom = Some(bloomBytes))
        .withColumn("batch_id", lit(batchId))
        .cache()
      if (!stats.isEmpty)
        stats.write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
      // land the kept docs' NOVEL fps (anti-join: first-contributor
      // only) in this batch's own committed dir, and extend the
      // sketch with a geometry-compatible partial
      val keptFps = IncrementalDedup
        .shingleFps(
          batch.join(
            stats.filter(col("keep")).select(col("id").as(idCol)), Seq(idCol)),
          textCol, idCol, shingleSize, portable)
        .select(col("fp")).distinct()
        .join(idx, Seq("fp"), "left_anti")
        .cache()
      StateStore.writeBatchDir(keptFps, streamIdxPath, batchId)
      val newSketch = IncrementalDedup
        .buildBloom(keptFps, fpp, sizeFor = Some(expectedTotalKeys))
      bloom.mergeInPlace(BloomFilter.readFrom(new ByteArrayInputStream(newSketch)))
      // drop this batch's transient caches (ours + passageDedupStats'
      // internal ones) — the stream would otherwise accumulate one
      // cached shingle table per batch for its whole lifetime
      (sc.getPersistentRDDs.keySet -- persistedBefore)
        .foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    }
  }
}
