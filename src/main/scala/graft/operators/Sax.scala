package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SAX — Symbolic Aggregate approXimation (Lin, Keogh, Lonardi & Chiu
  * 2003, "A Symbolic Representation of Time Series" — public paper):
  * each key's observed value sequence is piecewise-aggregate-averaged
  * into `w` frames, z-normalized against the key's own mean/std, and
  * discretized through the standard Gaussian breakpoints into a short
  * word over a 4-letter alphabet. Two keys whose series have the same
  * SHAPE get the same word, so a word equi-join is a sub-quadratic
  * candidate screen for co-moving pairs — the third member of the
  * screen family beside the exact period-join (`Temporal
  * .pairCorrelations`, reference `02_corr_mapping.p:175-210`'s
  * correlation scan generalized to pairs) and the sign-LSH bands
  * (`pairCorrelationsBanded`). Where the sign-LSH sketch needs a dense
  * calendar slot grid (and refuses sparse series — the m35 lesson),
  * SAX frames divide each key's own observation sequence, so gaps cost
  * nothing: it is the screen for sparse, irregularly-sampled keys.
  *
  * Scale shape: one shuffle on `key` (a single window exchange serves
  * the position, count, and moment columns), one partial-aggregated
  * frame groupBy riding that key partitioning, and the screen joins
  * words to words on the word value — bucket sizes are bounded by the
  * alphabet^w vocabulary exactly like an LSH band join, so the exact
  * correlation verify touches candidate pairs only, never |keys|².
  *
  * Bit-exactness: values are quantized to integer CENTI-units
  * (`round(value·100)` — two decimals, strictly coarser than the
  * round-6 series contract, so cross-engine sums agree), and every
  * downstream sum (frame sums, Σu, Σu²) is an exact int64 fold —
  * order-free. Σu² fits comfortably: |u| ≤ ~1e7 for daily sums up to
  * 1e5, so u² ≤ 1e14 leaves 4 orders of headroom at 10k observations
  * per key. The only float ops — mean, PAA mean, variance, sqrt, one
  * z-score subtraction/division per frame — are correctly-rounded IEEE
  * ops evaluated in ONE textually-pinned order mirrored by the DuckDB
  * oracle, so the letters (comparisons of identical doubles against
  * `::DOUBLE` breakpoint literals) are bit-stable by construction.
  */
object Sax {

  /** Standard SAX breakpoints for alphabet size 4: the N(0,1) quartile
    * boundaries. Letter = # breakpoints at or below z (a z exactly ON a
    * breakpoint takes the HIGHER letter — the code's `<` compares test
    * z < bp, so equality falls through to the next branch; this is what
    * makes the flat series' z = 0 read 'c'). */
  val breakpoints4: Seq[Double] = Seq(-0.6745, 0.0, 0.6745)

  /** Per-key SAX word table: (key, n, word) for every key with at
    * least `minLen` observations (frames of a shorter series would
    * alias; minLen ≥ w keeps every frame non-empty). Flat series
    * (zero variance after centi-quantization) read as all-'c' — the
    * z=0 letter under the strict breakpoint compares — rather than
    * NaN. */
  def saxWords(series: DataFrame, w: Int, minLen: Int): DataFrame = {
    require(w >= 2, s"SAX needs at least 2 frames, got $w")
    require(minLen >= w, s"minLen ($minLen) must be >= w ($w) so no frame is empty")
    // tie-break duplicate periods on u: row_number over period alone
    // would assign frame membership arbitrarily when a key carries two
    // rows for one period (fine for the canonical deduped series, but
    // this operator is public) — and two rows with equal (period, u)
    // are interchangeable, so this order is a deterministic total
    // order OF THE SUMS even when rows tie
    val wOrd = Window.partitionBy(col("key")).orderBy(col("period"), col("u"))
    val wAll = Window.partitionBy(col("key"))
    // integer centi-units; pos/n/moments all ride ONE key exchange
    val posed = series
      .select(col("key"), col("period"),
        round(col("value") * lit(100), 0).cast("long").as("u"))
      .withColumn("pos", (row_number().over(wOrd) - 1).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("s1", sum(col("u")).over(wAll))
      .withColumn("s2", sum(col("u") * col("u")).over(wAll))
      .filter(col("n") >= minLen)
      .withColumn("frame", expr(s"(pos * $w) div n"))
    // n/s1/s2 are functionally dependent on key: they ride the grouping
    // (the d66 dl convention) instead of paying a second join
    val frames = posed
      .groupBy(col("key"), col("n"), col("s1"), col("s2"), col("frame"))
      .agg(sum(col("u")).as("su"), count(lit(1)).as("c"))
    // pinned float order (mirrored textually in the oracle):
    // mean = s1/n; var = s2/n − mean·mean; std = sqrt(var);
    // z = (su/c − mean)/std — each op correctly rounded on identical
    // operands in both engines
    val lettered = frames
      .withColumn("mean", col("s1").cast("double") / col("n"))
      .withColumn("varu",
        col("s2").cast("double") / col("n") - col("mean") * col("mean"))
      .withColumn("z",
        when(col("varu") <= 0, lit(0.0))
          .otherwise((col("su").cast("double") / col("c") - col("mean")) / sqrt(col("varu"))))
      .withColumn("letter",
        when(col("z") < breakpoints4(0), lit("a"))
          .when(col("z") < breakpoints4(1), lit("b"))
          .when(col("z") < breakpoints4(2), lit("c"))
          .otherwise(lit("d")))
    lettered
      .groupBy(col("key"), col("n"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("frame"), col("letter")))),
          x => x.getField("letter")), "").as("word"))
      .select(col("key"), col("n"), col("word"))
  }

  /** Word-bucket candidate screen → exact correlation verify: pairs of
    * keys sharing a SAX word are joined back to the series on aligned
    * periods and scored with the exact Pearson correlation — the same
    * screen-then-verify contract as `pairCorrelationsBanded`, with the
    * word table as the sketch. Output matches `pairCorrelations`
    * (key_a, key_b, correlation, n_overlap) plus the shared word.
    *
    * `maxBucket > 0` drops words shared by more than that many keys
    * BEFORE the self-join — the d50 "hot tokens never become join
    * keys" rule applied to words. Near-mean noise concentrates in
    * b/c-heavy words (a PAA frame of IID values sits near the key's
    * own mean), so mega-buckets are shape-DEGENERATE: their members
    * match on "roughly flat", not on a distinctive trajectory, and
    * the pairs they admit are precisely the ones the exact-corr
    * verify would reject. The cap is a priced tradeoff, measured at
    * 50k keys (ScaleBench sax): cap 64 cuts wall 3.9× (70.3 → 18.1 s)
    * and keeps 0.82 of planted pairs with DISTINCTIVE seasonal shapes
    * but only 0.38 of planted pairs that are IID noise — genuinely
    * correlated, yet shapeless at PAA granularity, so their words
    * carry no evidence and they pool in the hot buckets. Uncapped
    * recall is 1.0 for both kinds. Size the cap by what the
    * deployment hunts: trending/seasonal co-movement tolerates a tight
    * cap; sub-frame-granularity correlation needs the uncapped screen
    * (or the m35 sign-LSH bands when the series are dense). 0 disables
    * (the registered m39 form, so its oracle replays cap-free); the
    * capped regime is registered as m41 with its own exact replay —
    * the cap is pure integer bucket counting, so both forms are
    * oracle-gated, and capped candidate pairs ⊆ uncapped by
    * construction (asserted in SaxSpec). */
  def saxScreen(
      series: DataFrame,
      w: Int,
      minLen: Int,
      minOverlap: Int,
      topK: Int,
      maxBucket: Int = 0): DataFrame = {
    val allWords = saxWords(series, w, minLen)
    val words =
      if (maxBucket <= 0) allWords
      else {
        // one partial-aggregated count over the word table, broadcast
        // back as a semi-join filter — hot buckets never reach the join
        val small = allWords.groupBy(col("word"))
          .agg(count(lit(1)).as("bucket")).filter(col("bucket") <= maxBucket)
          .select(col("word"))
        allWords.join(broadcast(small), Seq("word"), "left_semi")
      }
    val cands = words.select(col("key").as("key_a"), col("word"))
      .join(words.select(col("key").as("key_b"), col("word")), Seq("word"))
      .filter(col("key_a") < col("key_b"))
    // duplicate (key, period) rows are AVERAGED before the verify join —
    // without this, duplicates fan out the a⋈b join quadratically and
    // bias both the correlation and n_overlap, while saxWords above
    // deliberately tolerates them (tie-broken total order). On the
    // canonical deduped series avg is the identity (one row per group),
    // so the bit-exact contract is untouched; with real duplicates the
    // verify becomes a well-defined per-period-mean correlation.
    val dedup = series.groupBy(col("key"), col("period"))
      .agg(avg(col("value")).as("v"))
    val a = dedup.select(col("key").as("key_a"), col("period"), col("v").as("va"))
    val b = dedup.select(col("key").as("key_b"), col("period"), col("v").as("vb"))
    cands
      .join(a, Seq("key_a"))
      .join(b, Seq("key_b", "period"))
      .groupBy(col("key_a"), col("key_b"), col("word"))
      .agg(corr(col("va"), col("vb")).as("correlation"), count(lit(1)).as("n_overlap"))
      .filter(
        col("n_overlap") >= minOverlap &&
          col("correlation").isNotNull && !isnan(col("correlation")))
      .withColumn("correlation", round(col("correlation"), 6))
      .orderBy(abs(col("correlation")).desc, col("key_a").asc, col("key_b").asc)
      .limit(topK)
      .select(col("key_a"), col("key_b"), col("word"), col("correlation"), col("n_overlap"))
  }
}
