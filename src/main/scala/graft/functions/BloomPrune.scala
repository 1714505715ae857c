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
  * Built from one index-salted xxhash64 per probe position (see the
  * note on `coords` for why neither the portable md5 prefix nor a
  * Kirsch–Mitzenmacher expansion). Membership probes are pure
  * codegen'd bit arithmetic over a broadcast literal word array
  * (element_at + shiftright + mask): no UDF, the probe stays inside
  * whole-stage codegen at the scan.
  *
  * Spark's own runtime row-level filtering can inject a similar bloom
  * under AQE; this form is for when the build side is an arbitrary
  * computed DataFrame (not a join child the optimizer can see through)
  * and for engines/configs where the injection doesn't fire.
  *
  * Relationship to [[IncrementalDedup.buildBloom]]/`BloomMightContain`:
  * that pair serializes Spark's `util.sketch.BloomFilter` bytes for the
  * dedup family's SHINGLE-fp screens, where the sketch must also merge
  * with driver-held filters ([[graft.streaming.StreamingDedup]]'s
  * incremental bloom). This utility exists for JOIN pruning with two
  * probe regimes (plan-literal word array ↔ broadcast) and an
  * explicitly-sized dense layout; unifying the two would churn proven
  * operators for little — but they are deliberately NOT interchangeable
  * (different hash families), so never mix their filters. */
object BloomPrune {

  /** Number of hash functions; with bitsPerKey = 10 the theoretical
    * fpp is ~0.9% (k = 7 is optimal; 6 keeps the probe cheap at
    * near-identical fpp). */
  val numHashes = 6

  // xxhash64, not the portable md5-prefix hash: nothing replays the
  // bloom cross-engine (the oracle of a pruned join is the PLAIN join),
  // and the probe runs once per big-side row — md5 at 50M rows/s is the
  // dominant cost (the CountMin round-7 lesson), xxhash64 is codegen'd
  // native. One INDEPENDENT hash per probe index (the index salted into
  // the hash input) instead of Kirsch–Mitzenmacher expansion: KM from
  // one 64-bit value needs h1/h2 sub-ranges, and any sub-range cap
  // breaks coordinate uniformity once nBits exceeds it (a 2^30 cap
  // reviewed as saturating the first 2^30 bits of a billion-key bloom),
  // while widening h1/h2 makes h1 + i·h2 overflow — which ANSI mode
  // turns into a runtime error. Six xxhash64 calls per row are still
  // ~20× cheaper than one md5.
  private def coords(key: Column, nBits: Long): Seq[Column] =
    (0 until numHashes).map(i => pmod(xxhash64(key, lit(i)), lit(nBits)))

  /** xxhash64 hashes each TYPE differently (an INT 7 and a BIGINT 7
    * produce different digests), so a dimension built from an
    * int-inferred schema probed with a bigint fact key would compute
    * different bit positions for the SAME value — every true member
    * silently filtered out BEFORE the join. Normalize the widths that
    * can silently diverge across schemas: integral types widen to
    * long, scale-0 decimals (the JDBC/Hive bigint-inference shape,
    * e.g. decimal(20,0) vs bigint for the same column) ALSO go to long
    * — a scale-0 value beyond long range fails the cast loudly under
    * ANSI mode rather than silently probing wrong bits — and float
    * widens to double. String-vs-numeric divergence is NOT normalized
    * (no canonical textual form to pick); align those schemas before
    * building. */
  private def normalizeKey(df: DataFrame, key: Column): Column = {
    import org.apache.spark.sql.types._
    df.select(key).schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType => key.cast("long")
      case d: DecimalType if d.scale == 0 => key.cast("long")
      case FloatType | DoubleType => key.cast("double")
      case _ => key
    }
  }

  /** The dense word array of the small side's key bloom: one
    * partial-aggregated pass (explode k coordinates per key, group by
    * word, OR the masks), fetched partition-at-a-time into the flat
    * array (toLocalIterator — a collect() would hold one boxed row per
    * NON-ZERO WORD simultaneously, ~10× the bit array itself at the
    * billion-key scale the header advertises). */
  def build(small: DataFrame, key: Column, nBits: Long): Array[Long] = {
    require(nBits >= 64 && nBits % 64 == 0, s"nBits must be a positive multiple of 64: $nBits")
    // shiftleft/shiftright take literal counts in the Scala API; the
    // SQL functions accept column counts — call_function routes there
    val words = small
      .select(array(coords(normalizeKey(small, key), nBits): _*).as("cs"))
      .select(explode(col("cs")).as("c"))
      .groupBy((col("c") / 64).cast("int").as("w"))
      .agg(call_function("bit_or",
        call_function("shiftleft", lit(1L), (col("c") % 64).cast("int"))).as("bits"))
    val arr = new Array[Long]((nBits / 64).toInt)
    if (arr.length <= maxLiteralWords) {
      // small bloom (the literal-probe regime): one collect = ONE job.
      // toLocalIterator schedules a job PER PARTITION — measured as the
      // dominant build cost on multi-core local masters — and its
      // memory argument only bites above the literal cap anyway
      // (boxed rows here are bounded by maxLiteralWords).
      words.collect().foreach(r => arr(r.getInt(0)) = r.getLong(1))
    } else {
      val it = words.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        arr(r.getInt(0)) = r.getLong(1)
      }
    }
    arr
  }

  /** `big` filtered to rows whose `key` might be in the bloom — all
    * true members pass (no false negatives), plus ~fpp of non-members.
    * The word array ships as a literal column (broadcast with the
    * plan); the probe is k unrolled bit tests, codegen'd. */
  def prune(big: DataFrame, key: Column, words: Array[Long]): DataFrame = {
    val nBits = words.length.toLong * 64
    val arr = typedLit(words.toSeq)
    val hit = coords(normalizeKey(big, key), nBits)
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

  /** [[prune]] for LARGE blooms: the word array ships as a BROADCAST
    * variable instead of a plan literal. A literal array embeds in the
    * serialized plan and Java-deserializes per task as boxed objects —
    * measured OOM at 781k words (a 5M-key bloom); a broadcast is sent
    * once per executor in compact form. The price is one probe function
    * call per row (a scalar UDF over the codegen'd `xxhash64` column —
    * ~6 array reads, no allocation); use [[prune]]'s fully-codegen'd
    * form below [[maxLiteralWords]] words, this form above it.
    * Same hash family, same bits: the two forms admit identical rows.
    *
    * Broadcast ownership: the word-array broadcast lives until the
    * driver GCs its handle (Spark's ContextCleaner reclaims the
    * executor blocks then) — a long-lived driver pruning MANY distinct
    * large blooms should hold the result only as long as needed, or
    * manage the lifecycle itself via the broadcast it can recreate. */
  def pruneBroadcast(big: DataFrame, key: Column, words: Array[Long]): DataFrame = {
    val bc = big.sparkSession.sparkContext.broadcast(words)
    val nBits = words.length.toLong * 64
    // the coordinates are the SAME codegen'd columns as the literal
    // path (structural parity, spec-gated); the scalar function only
    // does the k bit probes against the broadcast word array
    val probe = udf { (cs: Seq[Long]) =>
      val ws = bc.value
      cs.forall(c => ((ws((c / 64).toInt) >> (c % 64).toInt) & 1L) == 1L)
    }
    big.filter(probe(array(coords(normalizeKey(big, key), nBits): _*)))
  }

  /** Above this word count, [[prune]]'s plan-literal array starts to
    * dominate task deserialization — switch to [[pruneBroadcast]]. */
  val maxLiteralWords = 65536

  /** Regime-picking entry: literal codegen'd probe for small blooms,
    * broadcast probe for large ones. */
  def pruneAuto(big: DataFrame, key: Column, words: Array[Long]): DataFrame =
    if (words.length <= maxLiteralWords) prune(big, key, words)
    else pruneBroadcast(big, key, words)
}
