package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning: pre-filter the BIG side of a
  * selective join on approximate membership in the small side's key
  * set, BEFORE the shuffle — the standard 100 TB pattern when the key
  * set is too large to broadcast as a hash table but its bits fit
  * comfortably (1B keys ≈ 1.2 GB at 10 bits/key vs tens of GB as a
  * set). False positives pass the pre-filter and are removed by the
  * real join, so results are EXACT — the bloom only cuts shuffle
  * volume, by (1 − selectivity) · (1 − fpp) of the big side.
  *
  * Built from the portable 60-bit md5-prefix hash expanded by
  * Kirsch–Mitzenmacher double hashing (the [[CountMin]] recipe), so
  * the filter is DETERMINISTIC — same keys, same bits, any engine.
  * Membership probes are pure codegen'd bit arithmetic over a
  * broadcast literal word array (element_at + shiftright + mask):
  * no UDF, the probe stays inside whole-stage codegen at the scan.
  *
  * Spark's own runtime row-level filtering can inject a similar bloom
  * under AQE; this form is for when the build side is an arbitrary
  * computed DataFrame (not a join child the optimizer can see through)
  * and for engines/configs where the injection doesn't fire. */
object BloomPrune {

  /** Number of hash functions; with bitsPerKey = 10 the theoretical
    * fpp is ~0.9% (k = 7 is optimal; 6 keeps the probe cheap at
    * near-identical fpp). */
  val numHashes = 6

  private def coords(key: Column, nBits: Long): Seq[Column] = {
    val v = TextFunctions.portableHash(key.cast("string"))
    val h1 = pmod(v, lit(1073741824L))
    val h2 = (v / lit(1073741824L)) * 2 + 1
    (0 until numHashes).map(i => pmod(h1 + lit(i.toLong) * h2, lit(nBits)))
  }

  /** The dense word array of the small side's key bloom: one
    * partial-aggregated pass (explode k coordinates per key, group by
    * word, OR the masks), collected bounded by nBits/64 longs. */
  def build(small: DataFrame, key: Column, nBits: Long): Array[Long] = {
    require(nBits >= 64 && nBits % 64 == 0, s"nBits must be a positive multiple of 64: $nBits")
    // shiftleft/shiftright take literal counts in the Scala API; the
    // SQL functions accept column counts — call_function routes there
    val words = small
      .select(array(coords(key, nBits): _*).as("cs"))
      .select(explode(col("cs")).as("c"))
      .groupBy((col("c") / 64).cast("int").as("w"))
      .agg(call_function("bit_or",
        call_function("shiftleft", lit(1L), (col("c") % 64).cast("int"))).as("bits"))
      .collect()
    val arr = new Array[Long]((nBits / 64).toInt)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** `big` filtered to rows whose `key` might be in the bloom — all
    * true members pass (no false negatives), plus ~fpp of non-members.
    * The word array ships as a literal column (broadcast with the
    * plan); the probe is k unrolled bit tests, codegen'd. */
  def prune(big: DataFrame, key: Column, words: Array[Long]): DataFrame = {
    val nBits = words.length.toLong * 64
    val arr = typedLit(words.toSeq)
    val hit = coords(key, nBits)
      .map(c =>
        (call_function("shiftright",
          element_at(arr, (c / 64).cast("int") + 1), (c % 64).cast("int"))
          .bitwiseAND(lit(1L))) === 1L)
      .reduce(_ && _)
    big.filter(hit)
  }

  /** Sized build: ~`bitsPerKey` bits per distinct key (rounded up to a
    * word), counted with one exact pass over the small side. */
  def buildSized(small: DataFrame, key: Column, bitsPerKey: Int = 10): Array[Long] = {
    val n = math.max(1L, small.select(key).distinct().count())
    val nBits = ((n * bitsPerKey + 63) / 64) * 64
    build(small, key, nBits)
  }
}
