package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal re-aggregation and screening over the canonical
  * (key, period, value) series: OHLC bars, time-weighted averages, gap
  * reports, exponentially weighted means, OLS trend fits, per-key
  * feature vectors, and the cross-entity co-movement screens.
  *
  * The reference resamples its daily series only by zero-fill before
  * correlating (mapping_engine.py:96-115); these are the standard
  * downsampling/summary forms its users apply to the same series before
  * or after mapping. The per-key operators are single-exchange plans:
  * one hash aggregate (bars, twap, trend, features) or one window sort
  * (gaps, ewma) per key — no joins, no UDFs, nothing leaves whole-stage
  * codegen, so each survives a 100 TB fact table at the cost of exactly
  * one shuffle on `key`. The pair screens are the intrinsically
  * quadratic exception; see [[pairCorrelationsBanded]] for the
  * candidate-generation scale path.
  */
object Temporal {

  /** Weekly OHLC bars per key: open/close = value at the first/last
    * observed day of the ISO week, high/low = extremes, volume = sum,
    * n_obs = count. One hash aggregate on (key, week) — `min_by`/`max_by`
    * keep open/close inside the same partial-aggregated pass (no
    * first/last window join-back). Periods within a key are unique, so
    * the argmin/argmax are deterministic. */
  def ohlcBars(series: DataFrame): DataFrame =
    series
      .groupBy(col("key"), date_trunc("week", col("period")).cast("date").as("week"))
      .agg(
        min_by(col("value"), col("period")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("period")).as("close"),
        sum(col("value")).as("volume"),
        count(lit(1)).as("n_obs"))

  /** Monthly time-weighted average: each observation holds until the next
    * one (step interpolation), so its weight is the calendar distance to
    * the key's next observation, clipped to the month boundary; the
    * month's last observation carries to the first day of the next month.
    * TWAP = Σ value·dt / Σ dt.
    *
    * One window (lead over the key's own sort — gap-aware by
    * construction) feeding one hash aggregate; both reuse the same
    * exchange on `key`. The irregular-series form of [[ohlcBars]]'
    * volume/n average: a mean that a sparse key cannot bias toward its
    * burst days. */
  def twap(series: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("period"))
    val monthEndExcl = add_months(date_trunc("month", col("period")).cast("date"), 1)
    val holdUntil = least(coalesce(lead(col("period"), 1).over(w), monthEndExcl), monthEndExcl)
    series
      .withColumn("dt", datediff(holdUntil, col("period")).cast("double"))
      .groupBy(col("key"), date_trunc("month", col("period")).cast("date").as("month"))
      .agg(
        (sum(col("value") * col("dt")) / sum(col("dt"))).as("twap"),
        sum(col("dt")).as("covered_days"),
        count(lit(1)).as("n_obs"))
  }

  /** Missing-run report: one row per maximal run of absent days inside a
    * key's observed range — (key, gap_start, gap_end, gap_days). A single
    * lead scan (consecutive observations more than one day apart bracket
    * exactly one run); no dense grid is materialized, so the plan costs
    * one exchange regardless of how sparse the series is — the dual of
    * [[graft.core.SeriesTable.resample]], which pays |range| rows to
    * zero-fill what this reports. */
  def gapReport(series: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("period"))
    series
      .select(col("key"), col("period"), lead(col("period"), 1).over(w).as("next_period"))
      .filter(col("next_period").isNotNull && datediff(col("next_period"), col("period")) > 1)
      .select(
        col("key"),
        date_add(col("period"), 1).as("gap_start"),
        date_sub(col("next_period"), 1).as("gap_end"),
        (datediff(col("next_period"), col("period")) - 1).cast("long").as("gap_days"))
  }

  /** Per-key ordinary-least-squares trend: slope/intercept of value on
    * epoch-day, fit quality (r² = corr², nulled for degenerate variance
    * exactly like the lag-corr NaN guard), and the straight-line
    * projection `horizonDays` past the key's last observation.
    *
    * One partial-aggregated hash aggregate — OLS over a billion-row key
    * costs the same shuffle as a count. The moment-based formulation
    * (covar_pop / var_pop) keeps every term an aggregate column, so no
    * second pass and no join-back. */
  def trendFit(series: DataFrame, epoch: String, horizonDays: Int = 7): DataFrame = {
    // x = days since a caller-chosen epoch NEAR the data: the moments are
    // exact-algebra identical for any origin, but a far origin (1970)
    // puts 4 extra digits into mx/xmax and burns float precision in the
    // intercept's my − slope·mx cancellation.
    val x = datediff(col("period"), to_date(lit(epoch))).cast("double")
    val v = col("value").cast("double")
    val slope = col("__cov") / col("__varx")
    val icept = col("__my") - slope * col("__mx")
    val r = col("__r")
    series
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n"),
        covar_pop(x, v).as("__cov"),
        var_pop(x).as("__varx"),
        avg(x).as("__mx"),
        avg(v).as("__my"),
        corr(x, v).as("__r"),
        max(x).as("__xmax"))
      .filter(col("n") >= 3 && col("__varx") > 0)
      .select(
        col("key"),
        col("n"),
        slope.as("slope"),
        icept.as("intercept"),
        when(r.isNotNull && !isnan(r), r * r).as("r2"),
        (icept + slope * (col("__xmax") + horizonDays)).as("forecast"))
  }

  /** Co-movement screen: the `topK` most-correlated entity PAIRS over
    * calendar-aligned values — which series move together, the
    * cross-entity complement of [[LagCorrelation]]'s within-entity scan.
    *
    * Pair generation is a self-equi-join on `period` (never a cross
    * join), one hash aggregate with corr accumulators, then a top-k that
    * plans as TakeOrderedAndProject. Intrinsically O(active-keys²) per
    * period — at 100 TB, bound the fan-out by pre-bucketing candidates
    * (sign-LSH over per-key weekly sketches, the [[graft.functions.
    * Similarity]] banding) or DIMSUM sampling before the exact corr;
    * this exact form is the verifier those candidate generators are
    * measured against. Correlation is rounded to 6 decimals BEFORE
    * ranking (the [[LagCorrelation.bestLag]] stability rule) with a
    * (key_a, key_b) tie-break, so the top-k frontier is engine-stable. */
  def pairCorrelations(series: DataFrame, minOverlap: Int, topK: Int): DataFrame = {
    val a = series.select(col("key").as("key_a"), col("period"), col("value").as("va"))
    val b = series.select(col("key").as("key_b"), col("period"), col("value").as("vb"))
    a.join(b, Seq("period"))
      .filter(col("key_a") < col("key_b"))
      // repartition the joined rows by PAIR before the aggregate: the
      // groupBy's distribution is then already satisfied, so partial agg
      // runs ABOVE the exchange — one hash state per pair total. Without
      // this, every map partition of the period join holds partial corr
      // state for up to ALL |pairs| (M × |pairs| partial rows: measured
      // 249 MB shuffled and 41-103 s of task time for a top-50 answer at
      // sf0.1; the raw joined rows are 221 MB and 1.4-1.9 s wall — and on
      // a cluster M ≫ periods-per-pair makes the duplicated-partial form
      // grow with cluster size while this one stays Σ n_p². Rounded
      // output verified identical (exceptAll = 0 both directions; the
      // oracle gate re-proves at every SF).
      .repartition(col("key_a"), col("key_b"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(corr(col("va"), col("vb")).as("correlation"), count(lit(1)).as("n_overlap"))
      .filter(
        col("n_overlap") >= minOverlap &&
          col("correlation").isNotNull && !isnan(col("correlation")))
      .withColumn("correlation", round(col("correlation"), 6))
      .orderBy(abs(col("correlation")).desc, col("key_a").asc, col("key_b").asc)
      .limit(topK)
  }

  /** Scale path for [[pairCorrelations]]: banded sign-LSH candidate
    * generation over per-key shape sketches, then the EXACT correlation
    * only on candidate pairs — the [[graft.functions.Similarity]]
    * recall-hardening pattern applied to series co-movement.
    *
    * Why the sketch works: Pearson correlation is the cosine of the
    * CENTERED series, so two correlated keys agree on which calendar
    * slots sit above vs below their own mean. Each key gets a dense
    * `nBits·nBands`-slot vector of (slot mean − key mean), missing
    * slots centered to 0, and [[graft.functions.Similarity
    * .signBandBuckets]] band-hashes the sign pattern: a pair is a
    * candidate if ANY band matches (OR-amplification), so the exact
    * corr join touches |candidates| pairs instead of |active-keys|² —
    * the difference between a day and never at 100 TB. Recall vs the
    * exact screen is locked by PairCorrRecallSpec.
    *
    * SIZING IS THE CONTRACT: bits per band must scale with log₂(keys)
    * (canonical space is 2^(nBits−1); aim for ~O(1) keys per bucket).
    * Under-sized bands make the candidate join COSTLIER than the exact
    * screen — measured both ways in PERF.md (3-bit bands at 5k keys:
    * 12× slower than exact; 18-bit at 50k keys: 20 s vs ~2 h). At
    * harness scale (150–1500 keys, 30-day series) the exact screen is
    * simply the right tool; this operator's registration there exists
    * to oracle-verify the banding arithmetic, and its speed case lives
    * in `ScaleBench paircorr`. */
  def pairCorrelationsBanded(
      series: DataFrame,
      epoch: String,
      slotDays: Int,
      nBits: Int,
      nBands: Int,
      minOverlap: Int,
      topK: Int): DataFrame = {
    val dim = nBits * nBands
    // floor division, matching SQL's `//`: double-divide + cast(int)
    // truncates toward zero, so a period one day BEFORE the epoch would
    // land in slot 0 instead of slot -1 (dropped) — divergent sketches
    // for pre-epoch data
    val slotOf = floor(datediff(col("period"), to_date(lit(epoch))) / slotDays).cast("int")
    val slots = series
      .select(col("key"), slotOf.as("slot"), col("value"))
      .filter(col("slot") >= 0 && col("slot") < dim)
      .groupBy(col("key"), col("slot"))
      .agg(avg(col("value")).as("sv"))
    val centered = slots
      .groupBy(col("key"))
      .agg(
        avg(col("sv")).as("km"),
        map_from_entries(collect_list(struct(col("slot"), col("sv")))).as("mp"))
      .select(
        col("key"),
        transform(
          sequence(lit(0), lit(dim - 1)),
          s => coalesce(element_at(col("mp"), s), col("km")) - col("km")).as("vec"))
    // canonical bucket = min(pattern, complement): the exact screen ranks
    // by |corr|, and an ANTI-correlated pair has the MIRRORED sign
    // pattern — folding each bucket with its bit-complement makes both
    // co-movement directions collide
    val full = (1L << nBits) - 1L
    val buckets = centered
      .select(
        col("key"),
        explode(graft.functions.Similarity.signBandBuckets(col("vec"), nBits, nBands))
          .as("bb"))
      .select(
        col("key"),
        col("bb.band").as("band"),
        least(col("bb.bucket"), lit(full).bitwiseXOR(col("bb.bucket"))).as("bucket"))
    // multi-probe (Hamming-1): one side also joins under each one-bit
    // flip of its canonical bucket — a pair whose sign patterns disagree
    // on a single slot of a band still collides. Flipping is symmetric,
    // so probing the x side alone covers both directions; the y side
    // stays canonical and the match is still ONE equi-join.
    val canonProbe = (b: Column) =>
      least(b, lit(full).bitwiseXOR(b))
    val probed = buckets.select(
      col("key"),
      col("band"),
      explode(
        array_distinct(concat(
          array(col("bucket")),
          transform(
            sequence(lit(0), lit(nBits - 1)),
            i => canonProbe(col("bucket").bitwiseXOR(
              pow(lit(2.0), i.cast("double")).cast("long"))))))).as("bucket"))
    val cands = probed.alias("x")
      .join(
        buckets.alias("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.key") < col("y.key"))
      .select(col("x.key").as("key_a"), col("y.key").as("key_b"))
      .distinct()
    val a = series.select(col("key").as("key_a"), col("period"), col("value").as("va"))
    val b = series.select(col("key").as("key_b"), col("period"), col("value").as("vb"))
    cands
      .join(a, Seq("key_a"))
      .join(b, Seq("key_b", "period"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(corr(col("va"), col("vb")).as("correlation"), count(lit(1)).as("n_overlap"))
      .filter(
        col("n_overlap") >= minOverlap &&
          col("correlation").isNotNull && !isnan(col("correlation")))
      .withColumn("correlation", round(col("correlation"), 6))
      .orderBy(abs(col("correlation")).desc, col("key_a").asc, col("key_b").asc)
      .limit(topK)
  }

  /** The banded screen's sizing rule, shared with `ScaleBench paircorr`:
    * bits per band scale with log₂(keys) so the canonical bucket space
    * (2^(nBits−1)) keeps ~O(1) keys per bucket; bands fill whatever day
    * span remains, floored at 2 for OR-amplification. ceil(log₂ n) is
    * computed from the BIT LENGTH of n−1, not floating log — a float
    * log₂ of an exact power of two can land at 10.0000000000002 and
    * ceil one bit high, and the DuckDB oracle (LENGTH(BIN(n−1)))
    * must agree bit-for-bit. */
  def bandSizing(nKeys: Long, nDays: Int, maxBits: Int = 18): (Int, Int) = {
    require(nKeys >= 2 && nDays >= 1, s"bandSizing($nKeys, $nDays)")
    val ceilLog2 = 64 - java.lang.Long.numberOfLeadingZeros(nKeys - 1)
    val nBits = math.max(2, math.min(maxBits, ceilLog2 + 2))
    val nBands = math.max(2, math.min(5, nDays / nBits))
    (nBits, nBands)
  }

  /** [[pairCorrelationsBanded]] with the band geometry derived from the
    * corpus itself. A fixed small-corpus band width inverts the win at
    * scale (PERF.md: 3-bit bands at 5k keys run 12× SLOWER than the
    * exact screen; 18-bit at 50k keys, 20 s vs ~2 h), so the bits must
    * follow the corpus. Always banded — see [[pairCorrelationsAuto]]
    * for the form that also decides WHETHER banding can work. */
  def pairCorrelationsBandedAuto(
      series: DataFrame,
      epoch: String,
      slotDays: Int,
      minOverlap: Int,
      topK: Int): DataFrame = {
    val row = series
      .agg(
        countDistinct(col("key")).as("nk"),
        datediff(max(col("period")), to_date(lit(epoch))).as("span"))
      .head()
    val (nBits, nBands) =
      bandSizing(row.getLong(0), (row.getInt(1) + 1) / slotDays)
    pairCorrelationsBanded(series, epoch, slotDays, nBits, nBands, minOverlap, topK)
  }

  /** The deployable co-movement screen: sizes the band geometry from the
    * corpus AND decides whether the banded screen can work at all — the
    * form to register. Three integer scalars from one pre-pass drive
    * both decisions (|keys|, day span, observation count):
    *
    *   - geometry: [[bandSizing]] — bits follow log₂|keys|;
    *   - regime: banded only if the AVERAGE per-key support fills the
    *     slot grid (`present/|keys| ≥ nBits·nBands`). The sign sketch
    *     reads one bit per calendar slot, so a corpus whose keys are
    *     observed on a fraction of the grid has too little sign
    *     information to discriminate at the selectivity |keys| demands —
    *     measured: auto-sized bands on the sparse harness series
    *     (~10-15 observed days of 31) recover 4% of the exact top-50,
    *     while on dense series banding is the 50k-key win (PERF.md,
    *     20 s vs ~2 h exact, recall 1.0). Sparse corpora get the exact
    *     period-equi-join screen, which only pays for SHARED support.
    *
    * Every decision input is exact integer arithmetic so the DuckDB
    * oracle replays the identical choice — no floating log, no
    * estimator drift. At 100 TB the three scalars can come from
    * `approx_count_distinct`/sampled counts instead; the decision only
    * needs magnitudes. */
  def pairCorrelationsAuto(
      series: DataFrame,
      epoch: String,
      slotDays: Int,
      minOverlap: Int,
      topK: Int): DataFrame = {
    // the three decision scalars are a pure function of (series plan,
    // epoch) — memoized per session (the d65 nrows convention) so a
    // repeated serve doesn't re-run the pre-pass action
    val row = graft.sources.ModelCache.getOrElseUpdate(
      series.sparkSession,
      s"paircorrAuto:$epoch:plan=${series.queryExecution.analyzed.semanticHash()}") {
      series
        .agg(
          countDistinct(col("key")).as("nk"),
          datediff(max(col("period")), to_date(lit(epoch))).as("span"),
          count(lit(1)).as("present"))
        .head()
    }
    val nKeys = row.getLong(0)
    // degenerate corpora (zero or one key) have no pairs; the exact
    // screen returns empty without tripping bandSizing's preconditions
    if (nKeys < 2 || row.isNullAt(1))
      return pairCorrelations(series, minOverlap, topK)
    val nDays = (row.getInt(1) + 1) / slotDays
    if (nDays < 1) return pairCorrelations(series, minOverlap, topK)
    val (nBits, nBands) = bandSizing(nKeys, nDays)
    val avgSupport = row.getLong(2) / nKeys
    if (avgSupport >= nBits.toLong * nBands)
      pairCorrelationsBanded(series, epoch, slotDays, nBits, nBands, minOverlap, topK)
    else
      pairCorrelations(series, minOverlap, topK)
  }

  /** Per-key time-series feature vector — the bridge from the series
    * family to the ML/clustering family (catch22-lite): count, mean,
    * sample std, coefficient of variation, OLS slope, lag-1
    * autocorrelation, zero fraction, peak-over-mean. Downstream these
    * rows feed the embedding operators (cluster keys by behavior, ANN
    * over series shapes).
    *
    * One window sort by key (the lead partner for acf1) feeding one hash
    * aggregate on the SAME key partitioning — Spark plans no second
    * exchange, so the whole extraction costs one shuffle. */
  def features(series: DataFrame, epoch: String): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("period"))
    val v = col("value").cast("double")
    val x = datediff(col("period"), to_date(lit(epoch))).cast("double")
    series
      .select(col("key"), v.as("v"), x.as("x"), lead(v, 1).over(w).as("v_next"))
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n"),
        avg(col("v")).as("mean"),
        stddev_samp(col("v")).as("std"),
        (covar_pop(col("x"), col("v")) / var_pop(col("x"))).as("slope"),
        corr(col("v"), col("v_next")).as("acf1"),
        (count(when(col("v") === 0.0, 1)).cast("double") / count(lit(1))).as("zero_frac"),
        max(col("v")).as("vmax"),
        var_pop(col("x")).as("__varx"))
      .filter(col("n") >= 3 && col("__varx") > 0)
      .select(
        col("key"),
        col("n"),
        col("mean"),
        col("std"),
        when(col("mean") =!= 0.0, col("std") / col("mean")).as("cv"),
        col("slope"),
        when(col("acf1").isNotNull && !isnan(col("acf1")), col("acf1")).as("acf1"),
        col("zero_frac"),
        when(col("mean") =!= 0.0, col("vmax") / col("mean")).as("peak_over_mean"))
  }

  /** Exponentially weighted moving average over the trailing `span` rows:
    * ewma(t) = Σ_k α^k·x(t−k) / Σ_k α^k over the observations present in
    * the frame (the leading edge renormalizes over what exists — the
    * standard adjusted form). Run it on a DENSE series (resample first)
    * so row distance is calendar distance.
    *
    * Position-dependent weights are outside what a frame aggregate can
    * express, so the kernel materializes `span` lag columns over ONE
    * window sort (the [[LagCorrelation.lagCorrTable]] lead-scan idiom in
    * reverse) and folds them in-row: still a single exchange + sort per
    * key, everything codegen'd, no self-join of the fact table. `span` is
    * a config-sized constant (plan width grows with it, data does not). */
  def ewma(series: DataFrame, alpha: Double, span: Int): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(span >= 1, s"span must be >= 1, got $span")
    val w = Window.partitionBy(col("key")).orderBy(col("period"))
    val ks = 0 until span
    val lagged = series.select(
      col("key") :: col("period") :: col("value") ::
        ks.toList.map(k => lag(col("value"), k).over(w).as(s"x$k")): _*)
    val num = ks.map(k => when(col(s"x$k").isNotNull, col(s"x$k") * math.pow(alpha, k)))
      .reduce[Column]((a, b) => coalesce(a, lit(0.0)) + coalesce(b, lit(0.0)))
    val den = ks.map(k => when(col(s"x$k").isNotNull, lit(math.pow(alpha, k))))
      .reduce[Column]((a, b) => coalesce(a, lit(0.0)) + coalesce(b, lit(0.0)))
    lagged.select(col("key"), col("period"), col("value"), (num / den).as("ewma"))
  }
}
