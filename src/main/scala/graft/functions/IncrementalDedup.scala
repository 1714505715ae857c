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
    * it. fp is the portable 60-bit md5-derived long, so a DuckDB oracle
    * computes bit-identical keys. */
  def shingleFps(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(
        col(idCol).as("id"),
        explode(TextFunctions.allShingles(col(textCol), n)).as("s"))
      .select(col("id"), TextFunctions.portableHash(col("s")).as("fp"))

  /** Serialize a driver-side bloom over the distinct `fp` column of
    * `index`. Two actions (count to size the sketch, then the aggregate
    * build) — this is the write-once index build, not the per-batch
    * query path. */
  def buildBloom(index: DataFrame, fpp: Double): Array[Byte] = {
    val expected = math.max(index.count(), 1L)
    val bloom = index.stat.bloomFilter("fp", expected, fpp)
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** Per-new-doc passage-dup stats against the corpus: (id, n_shingles,
    * n_dup_shingles, dup_fraction, keep). A doc is kept when less than
    * `dropAt` of its shingle mass already exists in the corpus.
    *
    * `corpusIndex` must have a long `fp` column (from [[shingleFps]] —
    * distinct is applied here). Exact semantics; the bloom is purely the
    * scan-side prune. */
  def passageDedupStats(
      newDocs: DataFrame,
      corpusIndex: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 8,
      fpp: Double = 0.01,
      dropAt: Double = 0.5): DataFrame = {
    val spark = newDocs.sparkSession
    BloomMightContain.register(spark)
    // the index is read three times (count, bloom build, semi-join) —
    // cached like the LSH signature tables; in production it is a stored
    // parquet table and this cache is the read of that table
    val idx = corpusIndex.select(col("fp")).distinct().cache()
    val bloomBytes = buildBloom(idx, fpp)

    val batch = shingleFps(newDocs, textCol, idCol, shingleSize)
    val probed = batch.withColumn(
      "maybe_dup",
      call_function("bloom_might_contain", lit(bloomBytes), col("fp")))
    // exact verification ONLY for bloom positives; negatives are proven new
    val confirmed = probed
      .filter(col("maybe_dup"))
      .join(idx, Seq("fp"), "left_semi")
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
