package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.expressions.BloomMightContain

/** Incremental deduplication: dedupe a NEW batch of documents against an
  * EXISTING corpus index — the recurring production operation in a
  * training-data pipeline ("drop from today's crawl every passage the
  * corpus already has"), as opposed to the one-shot whole-corpus dedup of
  * [[Dedup]].
  *
  * Scale design (100 TB corpus, ~0.1% daily batch):
  *   - The corpus side is represented by its FINGERPRINT INDEX (distinct
  *     shingle fps) — built once, reused every batch; never re-scan the
  *     corpus text.
  *   - A driver-built bloom filter over the index (public
  *     `DataFrameStatFunctions.bloomFilter`; ~1.2 MB per million keys at
  *     1% fpp) prefilters the batch as a pure SCAN — the overwhelmingly
  *     common "genuinely new" shingle is settled by a codegen'd probe
  *     ([[BloomMightContain]]) with NO join and NO shuffle.
  *   - Only bloom-positive shingles (true dups + fpp false positives)
  *     enter the exact semi-join against the index, so the shuffled
  *     volume is proportional to the DUPLICATED content, not the batch.
  *     Results are exact regardless of fpp: blooms have no false
  *     negatives, and the semi-join removes the false positives.
  *   - Beyond ~100M index keys (~120 MB sketch) a single plan-embedded
  *     bloom stops being reasonable: shard the fp space (one bloom per
  *     fp range, probed behind a range dispatch) or skip the bloom and
  *     rely on a BUCKETED index table ([[graft.sources.Bucketing]]) so
  *     the semi-join co-locates with zero shuffle on the index side.
  */
object IncrementalDedup {

  /** One row per shingle OCCURRENCE: (id, fp). Multiplicities are kept —
    * the dup fraction should weigh a passage by how often the doc repeats
    * it. `portable = true` fingerprints with the 60-bit md5-derived long
    * (bit-identical in a DuckDB oracle); `portable = false` uses
    * codegen'd xxhash64 — the production choice, ~10× cheaper than the
    * md5→hex→conv chain (measured in ScaleBench `incr`). Index and batch
    * must agree on the flag. */
  def shingleFps(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      portable: Boolean = true): DataFrame =
    df.select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(
        col("id"),
        explode(TextFunctions.allShinglesOf(col("__toks"), n)).as("s"))
      .select(
        col("id"),
        (if (portable) TextFunctions.portableHash(col("s")) else xxhash64(col("s"))).as("fp"))

  /** Serialize a driver-side bloom over the distinct `fp` column of
    * `index`. Two actions (count to size the sketch, then a
    * treeAggregate build) — this is the write-once index build, not the
    * per-batch query path.
    *
    * Built directly with `BloomFilter.create` + treeAggregate rather
    * than `stat.bloomFilter`: Spark 4's stat path caps the sketch at
    * 2^26 bits (the runtime-filter default), which saturates anything
    * past ~7M keys into a filter that passes everything (measured in
    * ScaleBench `incr`: a 33M-key index got 8 MB instead of 40 MB and
    * the prune stopped pruning). Raw `putLong` semantics, matching the
    * [[BloomMightContain]] probe.
    *
    * `sizeFor` fixes the sketch geometry independently of this build's
    * key count: two blooms merge only when their bit size and hash count
    * match, so an INCREMENTALLY GROWN bloom ([[graft.streaming.StreamingDedup]]
    * extends the corpus sketch with each batch's kept fps) must size every
    * partial for the expected EVENTUAL total. Overshooting the estimate
    * degrades fpp gracefully (more join work, still exact results). */
  def buildBloom(index: DataFrame, fpp: Double, sizeFor: Option[Long] = None): Array[Byte] = {
    import org.apache.spark.util.sketch.BloomFilter
    val expected = sizeFor.getOrElse(math.max(index.count(), 1L))
    val spark = index.sparkSession
    import spark.implicits._
    // per-partition local blooms merged on the driver — NOT treeAggregate,
    // which ships the multi-MB zero sketch to every task and shuffles one
    // full-size sketch per partition through the aggregate machinery
    // (measured 100 s for a 40 MB sketch over 32 partitions; this path is
    // ~8 s). coalesce(8) bounds the number of full-size partials in
    // flight; inserts are cheap, so the lost parallelism is irrelevant.
    val partials = index
      .select(col("fp")).as[Long].rdd
      .coalesce(8)
      .mapPartitions { it =>
        val b = BloomFilter.create(expected, fpp)
        it.foreach(b.putLong)
        val bos = new ByteArrayOutputStream()
        b.writeTo(bos)
        Iterator(bos.toByteArray)
      }
      .collect()
    val merged =
      if (partials.isEmpty) BloomFilter.create(expected, fpp) // 0-partition input
      else partials
        .map(bytes => BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))
        .reduceLeft { (a, b) => a.mergeInPlace(b); a }
    val bos = new ByteArrayOutputStream()
    merged.writeTo(bos)
    bos.toByteArray
  }

  /** Per-doc dup stats from a PRECOMPUTED confirmed-dup fp table — the
    * one-index-scan streaming path: the caller computes `existingFps` =
    * (bloom-suspect batch fps ⋈ index) ONCE and derives both these
    * stats and the first-contributor novel append from that same small
    * set, so the accumulated index is scanned a single time per
    * micro-batch. Bit-identical to [[passageDedupStats]] when
    * `existingFps` is exactly the batch∩index fp set (the bloom only
    * prunes fps that are definitely absent) — locked by
    * StreamingDedupSpec's parity against the batch operator. */
  def passageDedupStatsFromConfirmed(
      batchFps: DataFrame,
      existingFps: DataFrame,
      dropAt: Double): DataFrame = {
    val dup = batchFps
      .join(broadcast(existingFps.select(col("fp"))), Seq("fp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_dup_shingles"))
    batchFps
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"))
      .join(dup, Seq("id"), "left")
      .select(
        col("id"),
        col("n_shingles"),
        coalesce(col("n_dup_shingles"), lit(0L)).as("n_dup_shingles"))
      .withColumn(
        "dup_fraction",
        round(col("n_dup_shingles").cast("double") / col("n_shingles"), 6))
      .withColumn("keep", col("dup_fraction") < dropAt)
  }

  /** Per-new-doc passage-dup stats against the corpus: (id, n_shingles,
    * n_dup_shingles, dup_fraction, keep). A doc is kept when less than
    * `dropAt` of its shingle mass already exists in the corpus.
    *
    * `corpusIndex` must have a long `fp` column (from [[shingleFps]] —
    * distinct is applied here). Exact semantics; the bloom is purely the
    * scan-side prune. Streaming callers use
    * [[passageDedupStatsFromConfirmed]] instead — its one-index-scan
    * shape avoids re-shuffling the accumulated index per micro-batch. */
  def passageDedupStats(
      newDocs: DataFrame,
      corpusIndex: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 8,
      fpp: Double = 0.01,
      dropAt: Double = 0.5,
      useBloom: Boolean = true,
      portable: Boolean = true,
      prebuiltBloom: Option[Array[Byte]] = None): DataFrame = {
    val spark = newDocs.sparkSession
    BloomMightContain.register(spark)
    // the index is read up to three times (bloom sizing, bloom build,
    // semi-join) — cached like the LSH signature tables; in production
    // it is a stored parquet table and this cache is the read of that
    // table
    val idx = corpusIndex.select(col("fp")).distinct().cache()

    // cached: the (id, fp) table is read twice (per-doc totals + the
    // probe/verify branch) and the narrow post-projection rows are ~16
    // bytes — regenerating the shingle strings per branch dominated the
    // per-batch cost in ScaleBench `incr` before this
    val batch = shingleFps(newDocs, textCol, idCol, shingleSize, portable).cache()
    // bloom path: only positives (true dups + fpp) reach the semi-join;
    // `useBloom = false` is the A/B control that shuffles every batch
    // shingle into the join (ScaleBench `incr` measures the difference).
    // Production passes `prebuiltBloom` — the sketch is part of the
    // write-once index, not a per-batch cost.
    // Bloom path: the candidate set is SMALL by construction (true dups
    // + fpp), so broadcast it against the index SCAN — the index, the
    // big side, is never shuffled or sorted, and AQE can't collapse the
    // post-shuffle side into one giant partition (it did: a 33M-row
    // index ended up sorted by a single task when the left-semi shuffle
    // saw a ~100k-row probe side). Inner join ≡ semi here because idx
    // is distinct. The no-bloom control keeps the semi-join shape —
    // broadcasting the whole un-pruned batch would be the wrong plan.
    val confirmed = (
      if (useBloom) {
        val bloomBytes = prebuiltBloom.getOrElse(buildBloom(idx, fpp))
        broadcast(
          batch.filter(
            call_function("bloom_might_contain", lit(bloomBytes), col("fp"))))
          .join(idx, Seq("fp"))
      } else batch.join(idx, Seq("fp"), "left_semi"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_dup_shingles"))
    batch
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"))
      .join(confirmed, Seq("id"), "left")
      .select(
        col("id"),
        col("n_shingles"),
        coalesce(col("n_dup_shingles"), lit(0L)).as("n_dup_shingles"))
      .withColumn(
        "dup_fraction",
        round(col("n_dup_shingles").cast("double") / col("n_shingles"), 6))
      .withColumn("keep", col("dup_fraction") < dropAt)
  }
}
