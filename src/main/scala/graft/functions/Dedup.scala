package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design (100 TB):
  *   - exact dedup is one hash aggregate on the fingerprint — fully
  *     partial-aggregated, no skew risk beyond genuinely hot documents;
  *   - MinHash LSH avoids the O(n²) all-pairs comparison: signatures are
  *     computed per row (map-side), candidates come from an equi-join on
  *     (band_id, band_hash) buckets, and exact Jaccard verification runs
  *     only on candidates;
  *   - SimHash reduces each doc to a 60-bit value; near-dup = equal bucket
  *     (or small Hamming distance) — again an equi-join, not a cross join;
  *   - plain n-gram Jaccard is exposed for *bucketed* pair generation
  *     only (never unbucketed all-pairs).
  */
object Dedup {

  /** Exact dedup: one row per distinct fingerprint, keeping the lowest id
    * as the canonical document, with the duplicate count. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextFunctions.fingerprint(col(textCol)).as("fingerprint"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"),
        (count(lit(1)) - 1).as("n_duplicates"))

  /** Per-row MinHash signature: for each of `numHashes` seeds, the min
    * portable-hash of `seed:shingle`. Column type: array<bigint>. */
  def minhashSignature(textCol: String, shingleSize: Int, numHashes: Int) = {
    val sh = TextFunctions.shingles(col(textCol), shingleSize)
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i =>
        array_min(
          transform(sh, s => TextFunctions.portableHash(concat(i.cast("string"), lit(":"), s)))))
  }

  /** MinHash-LSH candidate pairs: band the signature, bucket-join on
    * (band index, band hash), emit distinct (id_a < id_b) pairs with their
    * estimated Jaccard (fraction of matching signature positions).
    *
    * rowsPerBand=2, numHashes=16 → 8 bands: pairs with Jaccard ~>0.3 are
    * likely candidates. */
  def minhashLshPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 2): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val sigs = df.select(
      col(idCol).as("id"),
      minhashSignature(textCol, shingleSize, numHashes).as("sig"))
    val banded = sigs.select(
      col("id"),
      col("sig"),
      explode(
        transform(
          sequence(lit(0), lit(numBands - 1)),
          b =>
            struct(
              b.as("band"),
              TextFunctions
                .portableHash(
                  array_join(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), "_"))
                .as("bucket")))).as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .select(
        col("id_a"),
        col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), m => m))
          .cast("double") / size(col("sig_a"))).as("est_jaccard"))
  }

  /** SimHash: majority vote over token-hash bits, packed into a 60-bit
    * long. Near-duplicates share the value (or differ in few bits —
    * compare with bit_count(a ^ b)). */
  def simhash(textCol: String, bits: Int = 60): Column = {
    val hashes = transform(TextFunctions.tokens(col(textCol)), t => TextFunctions.portableHash(t))
    val n = size(hashes)
    // 2^b as long (exact: powers of two are exactly representable doubles;
    // the Scala DSL's shiftleft only accepts a literal Int shift)
    def bit(b: Column): Column = pow(lit(2.0), b.cast("double")).cast("long")
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, b) =>
        acc + when(size(filter(hashes, h => h.bitwiseAND(bit(b)) =!= 0)) * 2 > n, bit(b))
          .otherwise(0L))
  }

  /** Exact n-gram Jaccard for candidate pairs within a bucket column
    * (e.g. same source, same LSH bucket): |A ∩ B| / |A ∪ B| over distinct
    * shingles. Bucketed by design — never call on an unbucketed table. */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      bucketCol: String,
      shingleSize: Int = 3): DataFrame = {
    val sh = df.select(
      col(bucketCol).as("bucket"),
      col(idCol).as("id"),
      TextFunctions.shingles(col(textCol), shingleSize).as("sh"))
    val a = sh.select(col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(
        col("bucket"),
        col("id_a"),
        col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }
}
