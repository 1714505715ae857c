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
  *   - Per-batch cost: the accumulated index is SCANNED exactly once
  *     per micro-batch (bloom-suspect batch fps broadcast against it to
  *     confirm true duplicates; the dup stats and the novel append both
  *     derive from that one confirmed set) and is never shuffled,
  *     distinct-ed, or cache-materialized — the ScaleBench `stream`
  *     gate measured the earlier shape (per-batch distinct + full
  *     shuffle anti-join) growing 2.2× over 100 batches. And the scan
  *     itself is ROW-GROUP-PRUNED: fp dirs are written fp-clustered
  *     ([[fpClustered]]) and the bounded suspect set is planted as a
  *     literal scan predicate, so parquet min/max skips everything but
  *     the suspect neighborhoods — per-batch IO tracks the batch's own
  *     suspect count, not the accumulated novel volume (what earlier
  *     rounds documented as the exact-confirm floor).
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

  /** Above this many bloom-suspect fps the per-batch literal scan
    * filter is skipped (the [[graft.functions.Retrieval.maxTermPushdown]]
    * pattern applied to fps): the confirm falls back to the broadcast
    * join alone, which still scans the index exactly once. Typical
    * suspect sets are true dups + fpp·|batch fps| — well under this. */
  val maxFpPushdown = 10000

  /** Above this many NOVEL fps a batch's sketch fold goes distributed
    * (full-geometry partial blooms + merge) instead of the bounded
    * collect + direct putLong — the cap bounds the driver transfer
    * (1M longs = 8 MB), the distributed form bounds nothing but also
    * ships full-geometry partials back per batch. `var` is a spec hook
    * (the parity test forces the distributed branch on a small batch). */
  private[graft] var bloomFoldCollectMax = 1000000

  /** The fp-clustered layout every fp-index write uses: RANGE-
    * partitioned and sorted, so files carry DISJOINT fp ranges and row
    * groups within each file carry narrow sub-ranges — a k-suspect
    * literal probe ([[maxFpPushdown]]) then touches ~k row groups in
    * the WHOLE index. (A hash repartition + sort would leave every
    * file spanning the full fp domain: the same k suspects would hit
    * up to k row groups PER FILE, and pruning would stop mattering as
    * soon as k exceeded one file's row-group count.) */
  private[graft] def fpClustered(df: org.apache.spark.sql.DataFrame) =
    df.repartitionByRange(col("fp")).sortWithinPartitions(col("fp"))

  /** Compact the accumulated fp index, never absorbing the NEWEST
    * committed batch: it may sit inside a replay window only the stream
    * checkpoint knows about, and its replay's strictly-before bounded
    * read ([[StateStore.readCommittedBatchDirs]] with `beforeBatch`)
    * must keep working across a restart. Run from a maintenance job;
    * absorbed ids stay committed, so the stream's exactly-once
    * contract is untouched. The merged dir is RE-CLUSTERED by fp so the
    * suspect pushdown keeps row-group-pruning after the merge.
    * `sweepGraceMs` floors the sweep in wall-clock time — set ≥ the
    * longest concurrent ad-hoc read of the index (the in-stream
    * cadence defaults it to [[StateStore.defaultInStreamGraceMs]]). */
  def compactFpIndex(
      spark: org.apache.spark.sql.SparkSession,
      streamIdxPath: String,
      sweepGraceMs: Long = 0L): Unit = {
    val ids = StateStore.committedBatchIds(spark, streamIdxPath).sorted.dropRight(1)
    if (ids.length >= 2)
      StateStore.compactBatchDirs(spark, streamIdxPath, ids, fpClustered, sweepGraceMs)
  }

  /** Start the dedup stream. `docs` is a streaming DataFrame with
    * (`idCol`, `textCol`); decisions land in `outPath` (one row per doc:
    * id, n_shingles, n_dup_shingles, dup_fraction, keep, batch_id); new
    * fps append to `streamIdxPath`.
    *
    * `compactEvery`: run [[compactFpIndex]] inside foreachBatch every N
    * committed batches, so the fp-dir count stays bounded without a
    * separate maintenance job — the wrapper never absorbs the newest
    * committed id, so the replay contract survives an in-stream
    * compaction. The compaction batch pays the merge cost (amortized:
    * O(index)/N per batch); leave None to schedule it externally.
    *
    * `compactGraceMs`: wall-clock sweep grace for those in-stream
    * compactions. The index is advertised for ad-hoc serving WHILE the
    * stream runs, and two cadence fires inside one long ad-hoc read
    * would otherwise delete dirs under that reader — the default
    * ([[StateStore.defaultInStreamGraceMs]]) covers interactive reads;
    * raise it to ≥ the longest concurrent scan. */
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
      trigger: Option[Trigger] = None,
      compactEvery: Option[Int] = None,
      compactGraceMs: Long = StateStore.defaultInStreamGraceMs): StreamingQuery = {
    val outer = docs.sparkSession
    val session = new Session(
      outer, staticIndex, outPath, streamIdxPath, textCol, idCol,
      shingleSize, fpp, dropAt, expectedTotalKeys, portable)
    val writer = docs.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        session.processBatch(batch, batchId)
        if (compactEvery.exists(n => n > 0 && batchId > 0 && batchId % n == 0))
          compactFpIndex(outer, streamIdxPath, compactGraceMs)
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

    /** The running sketch's serialized bytes — spec hook for the
      * collect-vs-distributed fold parity contract. */
    private[graft] def sketchBytes: Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos); bos.toByteArray
    }

    /** Spec hooks: when `capturePlans` is set, each batch records the
      * executed plan of its confirm join so tests can assert the
      * bounded suspect literal actually reaches the parquet scan as a
      * pushed filter. Off in production — extracting the plan string
      * costs a planning pass per batch. */
    private[graft] var capturePlans = false
    private[graft] var lastConfirmPlan = ""

    private[graft] def processBatch(batch: DataFrame, batchId: Long): Unit = {
      val sc = spark.sparkContext
      val persistedBefore = sc.getPersistentRDDs.keySet
      // index as of batches < batchId: a replayed batch must not read
      // its own crashed attempt's committed dir
      val streamIdx = StateStore
        .readCommittedBatchDirs(spark, streamIdxPath, beforeBatch = Some(batchId))
        .getOrElse(spark.emptyDataFrame.select(lit(0L).as("fp")).limit(0))
      val bloomBytes = { // serialize the CURRENT sketch for this batch
        val bos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(bos); bos.toByteArray
      }
      // register on the BATCH's session: inside foreachBatch the micro-
      // batch runs in the streaming query's cloned session, where the
      // outer session's function registry is not visible. The eq-
      // pushdown threshold likewise goes on BOTH sessions — the confirm
      // plan composes frames from each, and the executing session's
      // conf decides how the suspect literal translates at the reader
      graft.functions.expressions.BloomMightContain.register(batch.sparkSession)
      graft.functions.ScanPrune.ensureEqPushdown(batch.sparkSession)
      // the batch's (id, fp) shingle table — shared by the stats fold,
      // the kept-doc projection, and the novel append; ONE tokenize
      val batchFps = IncrementalDedup
        .shingleFps(batch, textCol, idCol, shingleSize, portable)
        .cache()
      // THE one accumulated-index pass of this micro-batch: the
      // bloom-suspect batch fps (small by construction — true dups +
      // fpp; a bloom NEGATIVE is definitely absent, the sketch covers
      // corpus ∪ all committed stream fps, a superset of the
      // beforeBatch-bounded read) broadcast against the index to
      // confirm which already exist. The per-doc dup counts AND the
      // first-contributor novelty both derive from this one confirmed
      // set, so the index is SCANNED once per batch and never shuffled
      // or materialized — the previous shape (a per-batch distinct +
      // cache inside passageDedupStats plus a full shuffle anti-join)
      // was the super-constant growth the ScaleBench `stream` gate
      // flagged.
      val suspects = batchFps.select(col("fp")).distinct().filter(
        call_function("bloom_might_contain", lit(bloomBytes), col("fp")))
      // Bounded suspect PUSHDOWN: the stored fp dirs are fp-clustered
      // ([[fpClustered]] — files range-disjoint, rows sorted), so
      // planting the suspect set as a literal scan predicate lets
      // parquet row-group min/max prune the accumulated-index scan to
      // ~|suspects| row groups — per-batch IO then tracks the batch's
      // own suspect count, not the accumulated novel volume (what
      // earlier rounds called the exact-confirm floor). Pruning is a
      // DENSITY game (ScaleBench `pushdown` measures the law): a
      // multi-chunk literal also costs per-row evaluation on every
      // SURVIVING row group, so it only engages when it can prune —
      // |suspects| within one cheap isin chunk, or at most the stored
      // side's estimated row-group count (committed fp files are below
      // one parquet block, so files ≈ row groups). Over-cap or
      // over-density suspect sets fall back to the unpruned single
      // scan; the literal-cap collect never pulls past maxFpPushdown+1.
      val suspectVals = {
        val rows = suspects.limit(maxFpPushdown + 1).collect()
        if (rows.length <= maxFpPushdown) Some(rows.map(_.getLong(0)).toSeq)
        else None
      }
      val rowGroupEst = graft.functions.ScanPrune.estimatedRowGroups(streamIdx)
      val probedStream = suspectVals match {
        case Some(fps) if fps.nonEmpty &&
            (fps.length <= graft.functions.ScanPrune.eqChunk ||
              fps.length <= rowGroupEst) =>
          graft.functions.ScanPrune.ensureEqPushdown(spark)
          streamIdx.filter(graft.functions.ScanPrune.inLiteral(col("fp"), fps))
        case _ => streamIdx
      }
      // the static corpus side is a memory-cached distinct table — the
      // broadcast-hash confirm probes it directly; only the parquet
      // stream side benefits from (and pays for) the literal
      val idx = static.unionByName(probedStream.select(col("fp")))
      // bounded suspect sets were just collected — reuse them as a
      // LOCAL relation on the broadcast side instead of recomputing the
      // bloom filter over the batch
      val suspectsSide = suspectVals match {
        case Some(fps) =>
          spark.createDataset(fps)(org.apache.spark.sql.Encoders.scalaLong).toDF("fp")
        case None => suspects
      }
      val existingBase = broadcast(suspectsSide).join(idx, Seq("fp"))
        .select(col("fp"))
      if (capturePlans)
        lastConfirmPlan = existingBase.queryExecution.executedPlan.toString
      // the confirmed-dup set feeds TWO consumers (the stats fold and
      // the novel-fp anti-join) but the index must be scanned ONCE per
      // batch. When bounded, materialize it as a LOCAL relation
      // (|existing| ≤ |suspects| ≤ maxFpPushdown — ≤80 KB of longs):
      // no cache entry at all. Only the over-cap fallback caches, and
      // then it is unpersisted through the DATASET handle — the 250-
      // batch gate run measured what a raw-RDD-level sweep of cached
      // frames does over hundreds of batches: the CacheManager keeps
      // the orphaned InMemoryRelations and Spark's cached-stage
      // machinery eventually dies with an INTERNAL_ERROR null-session
      // collect (batch ~218).
      val (existing, toUnpersist) = suspectVals match {
        case Some(_) =>
          val confirmed = existingBase.collect().map(_.getLong(0)).toSeq
          (spark.createDataset(confirmed)(org.apache.spark.sql.Encoders.scalaLong)
            .toDF("fp"), Seq.empty[DataFrame])
        case None =>
          val cached = existingBase.cache()
          (cached, Seq(cached))
      }
      try {
        val stats = IncrementalDedup
          .passageDedupStatsFromConfirmed(batchFps, existing, dropAt)
          .withColumn("batch_id", lit(batchId))
          .cache()
        try {
          if (!stats.isEmpty)
            stats.write
              .mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id")
              .parquet(outPath)
          // land the kept docs' NOVEL fps (first-contributor only) in
          // this batch's own committed dir, and extend the sketch with
          // a geometry-compatible partial
          val keptFps = batchFps
            .join(stats.filter(col("keep")).select(col("id")), Seq("id"), "left_semi")
            .select(col("fp")).distinct()
            .join(broadcast(existing), Seq("fp"), "left_anti")
            .cache()
          try {
            // fp-clustered so later batches' suspect pushdown row-
            // group-prunes this dir too
            StateStore.writeBatchDir(fpClustered(keptFps), streamIdxPath, batchId)
            // fold the novel fps into the sketch. Bounded-collect fast
            // path: putLong into the EXISTING filter sets bit-for-bit
            // the same bits as merging a same-geometry partial (merge
            // is bit-OR), and a typical batch's novel set is a few
            // hundred k longs (~MBs over the wire) — where the
            // distributed fold builds a FULL-GEOMETRY partial per
            // partition and ships them back (at a 100M-key sketch,
            // 8 × ~120 MB PER BATCH, measured as the dominant per-batch
            // cost of the 250×10000 dedup gate). Over the cap the
            // distributed fold stands — an adversarial all-novel burst
            // must not drag an unbounded collect to the driver.
            val novel = {
              val rows = keptFps.limit(bloomFoldCollectMax + 1).collect()
              if (rows.length <= bloomFoldCollectMax) Some(rows.map(_.getLong(0)))
              else None
            }
            novel match {
              case Some(fps) => fps.foreach(bloom.putLong)
              case None =>
                val newSketch = IncrementalDedup
                  .buildBloom(keptFps, fpp, sizeFor = Some(expectedTotalKeys))
                bloom.mergeInPlace(
                  BloomFilter.readFrom(new ByteArrayInputStream(newSketch)))
            }
          } finally keptFps.unpersist(false)
        } finally stats.unpersist(false)
      } finally {
        toUnpersist.foreach(_.unpersist(false))
        batchFps.unpersist(false)
        // belt-and-braces: any cache a HELPER might add in the future
        // still gets its storage dropped (the CacheManager entry is the
        // helper's to manage — per-batch helpers must not cache)
        (sc.getPersistentRDDs.keySet -- persistedBefore)
          .foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      }
    }
  }
}
