package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (higher-order array functions — `transform`/`filter`/`aggregate` — no
  * UDFs), so plans stay inside whole-stage codegen and every operator is
  * DuckDB-oracle-able.
  *
  * Portable hash: `bigint(first 15 hex chars of md5)` — identical in Spark
  * (`conv(substr(md5(x),1,15),16,10)`) and DuckDB (`('0x'||...)::BIGINT`),
  * so MinHash/SimHash results can be verified cross-engine.
  */
object TextFunctions {

  /** Lower-cased whitespace tokenization. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Lexical diversity: distinct tokens / total tokens. */
  def distinctTokenRatio(text: Column): Column = {
    val t = tokens(text)
    size(array_distinct(t)).cast("double") / size(t)
  }

  /** Small deterministic stopword lists per language (public-knowledge
    * function-word sets) — enough signal for a coarse stopword-based
    * language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "in", "to", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "un", "pas", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "un", "no", "por", "para"))

  /** Count of tokens found in `words`, over a pre-tokenized column.
    * Take the tokenized column (projected ONCE), not raw text: expressions
    * that re-derive `tokens(text)` multiple times per row are re-evaluated
    * per reference inside lambda bodies. */
  def stopwordHitsOf(toks: Column, words: Seq[String]): Column =
    size(filter(toks, tok => tok.isin(words: _*)))

  def stopwordHits(text: Column, words: Seq[String]): Column =
    stopwordHitsOf(tokens(text), words)

  /** Fraction of tokens found in `words`. */
  def stopwordRatioOf(toks: Column, words: Seq[String]): Column =
    stopwordHitsOf(toks, words).cast("double") / size(toks)

  def stopwordRatio(text: Column, words: Seq[String]): Column =
    stopwordRatioOf(tokens(text), words)

  /** Heuristic quality score in [0,1]:
    * 0.4·length saturation (tokens/100 capped) + 0.3·lexical diversity +
    * 0.3·stopword presence (capped at 10x the hit ratio). */
  def qualityScoreOf(toks: Column): Column = {
    val n = size(toks).cast("double")
    round(
      lit(0.4) * least(lit(1.0), n / 100.0) +
        lit(0.3) * (size(array_distinct(toks)).cast("double") / n) +
        lit(0.3) * least(lit(1.0), stopwordRatioOf(toks, stopwords("en")) * 10.0),
      6)
  }

  def qualityScore(text: Column): Column = qualityScoreOf(tokens(text))

  /** Language-ID: argmax of per-language stopword hit counts; 'und'
    * (undetermined) when no list matches. Deterministic tie-break by
    * list order en > de > fr > es. */
  def predictLangOf(toks: Column): Column = {
    val scores = Seq("en", "de", "fr", "es").map(l => l -> stopwordHitsOf(toks, stopwords(l)))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores
      .foldLeft(when(best <= 0, "und")) { case (acc, (l, s)) => acc.when(s === best, l) }
      .otherwise("und")
  }

  def predictLang(text: Column): Column = predictLangOf(tokens(text))

  /** Document fingerprint: md5 of whitespace-normalized lower-cased text —
    * the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Portable 60-bit hash of a string expression (see object doc). */
  def portableHash(c: Column): Column =
    // fused digest→long (≡ conv(substring(md5(c), 1, 15), 16, 10) bit-
    // for-bit, locked by Md5PrefixLongSpec) — no hex/conv string stages
    graft.functions.expressions.Md5PrefixLong.col(c.cast("string"), 15)

  /** TF-IDF top terms per document, fully relational: explode tokens →
    * per-(doc, term) counts → document frequency (one small aggregate,
    * broadcast back) → tf·idf ranking with deterministic tie-break.
    * Returns (idCol, term, tf long, df long, tfidf, term_rank).
    *
    * Scale notes: two shuffles (doc-term count, term df) + a broadcast
    * join of the term dictionary; idf = ln(N / df) with raw-count tf. */
  def tfIdfTopTerms(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // doc count as a lazy 1-row aggregate cross-joined in (an eager
    // df.count() here would run a job at query-construction time)
    val nDocs = df.agg(count(lit(1)).cast("double").as("n_docs"))
    // staged by semantic hash (the hashedTermCounts convention): the
    // table is planned TWICE below (df aggregate + scoring join), and
    // un-staged each branch re-runs the corpus tokenize. At 100 TB the
    // alternative window-df formulation pays a full doc-term sort —
    // worse than the re-scan — so staging is the local fix and the
    // re-scan the cluster fallback.
    val docTerms = graft.sources.StagingCache.getOrElseUpdate(
      df.sparkSession,
      s"tfidfTerms:plan=${df.select(col(idCol), col(textCol))
        .queryExecution.analyzed.semanticHash()}") {
      df
        .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
        .groupBy(col("id"), col("term"))
        .agg(count(lit(1)).as("tf"))
    }
    val docFreq = docTerms.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window
      .partitionBy(col("id"))
      .orderBy(round(col("tfidf"), 6).desc, col("term").asc)
    docTerms
      .join(broadcast(docFreq), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf") * log(col("n_docs") / col("df")))
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= k)
      .select(
        col("id").as(idCol),
        col("term"),
        col("tf"),
        col("df"),
        round(col("tfidf"), 6).as("tfidf"),
        col("term_rank").cast("long").as("term_rank"))
  }

  /** Distinct word n-gram shingles as an array column. */
  def shingles(text: Column, n: Int): Column =
    array_distinct(allShingles(text, n))

  /** [[shingles]] over a PRE-TOKENIZED array column — see
    * [[allShinglesOf]] for why hot paths should project the token array
    * first. */
  def shinglesOf(toks: Column, n: Int): Column =
    array_distinct(allShinglesOf(toks, n))

  /** All word n-gram shingles in text order (NON-distinct) — repetition
    * metrics need the multiplicities that [[shingles]] collapses.
    *
    * Built by zipping the token array against its own tails (n − 1
    * zip_with folds), NOT by slicing inside a transform lambda: a lambda
    * body re-evaluates its outer expressions PER ELEMENT, so the
    * `slice(tokens(text), i, n)` formulation re-ran the regex tokenizer
    * once per shingle position — ~100× per document (the d40 bigram
    * lesson, NOTES.md). zip_with evaluates each array argument once per
    * ROW; concat null-propagates past the padded tail, and the final
    * slice drops the incomplete positions. Shorter-than-n docs keep the
    * historical one-shingle-of-everything behavior. */
  def allShingles(text: Column, n: Int): Column =
    allShinglesOf(tokens(text), n)

  /** [[allShingles]] over a PRE-TOKENIZED array column. The token array
    * is referenced ~2(n−1)+3 times in the zip/slice/guard tree; passing
    * `tokens(text)` here re-runs the regex tokenizer at every reference
    * wherever subexpression elimination cannot reach (the explode
    * Generate path) — project `tokens(textCol)` once and shingle from
    * the attribute (measured on the d74 kernel: 2.15 s → 1.50 s at
    * sf0.1, identical rows). */
  def allShinglesOf(t: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val zipped = (2 to n).foldLeft(t) { (acc, k) =>
      zip_with(acc, slice(t, lit(k), greatest(size(t) - (k - 1), lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    when(size(t) < n, array(array_join(t, " ")))
      .otherwise(slice(zipped, lit(1), size(t) - (n - 1)))
  }

  /** Gopher-style per-document repetition metrics
    * (Rae et al. 2021, "Scaling Language Models", table A1 repetition
    * filters — public paper):
    *
    *   - `top_bigram_frac`: occurrences of the most frequent word bigram /
    *     total bigrams (high → boilerplate/keyword stuffing)
    *   - `dup_3gram_frac`: 1 − distinct 3-grams / total 3-grams
    *     (high → copy-pasted spans)
    *   - `repetition_flag`: 1 when either exceeds its threshold
    *
    * Shape at scale: the 3-gram metric is per-row array arithmetic (no
    * shuffle); the bigram mode needs multiplicities across each doc →
    * explode + two partial-aggregated hash aggregates keyed by doc id,
    * then a per-doc join. Everything stays in whole-stage codegen;
    * nothing is quadratic in document length.
    *
    * Measured alternative (rejected): carrying the per-row 3-gram metric
    * through the gram aggregates as a max() column removes the per-doc
    * join but widens the exploded gram shuffle (~#grams × 8 bytes) and
    * every (doc, gram) aggregation buffer — at 2M docs / 80M grams that
    * cost 112 s vs 76 s for this join formulation. Shuffle WIDTH on the
    * fan-out side beats join COUNT on the per-doc side at scale. */
  /** Corpus vocabulary statistics (the Zipf table): per token, total
    * occurrences, document frequency, frequency rank (count desc, token
    * asc tie-break), and corpus share. One explode + one partial-
    * aggregated groupBy; the rank runs over the VOCABULARY (log-scale of
    * the corpus), and even that is numbered DISTRIBUTED via
    * [[graft.operators.GlobalOrder]] — a web-scale corpus has hundreds of
    * millions of distinct tokens, too many for the naive
    * single-partition `row_number() OVER (ORDER BY ...)`. The corpus
    * total joins back as a broadcast 1-row aggregate, not an
    * unpartitioned window. */
  def vocabStats(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      minCount: Long = 1L): org.apache.spark.sql.DataFrame = {
    val counted = df
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct(col("id")).as("n_docs"))
      .filter(col("n_occurrences") >= minCount)
    val ranked = graft.operators.GlobalOrder.withRowNumber(
      counted,
      Seq(col("n_occurrences").desc, col("token").asc),
      outCol = "freq_rank")
    // total from the RANKED side: it reads the cache GlobalOrder built,
    // so the corpus is scanned once, not re-aggregated from parquet
    val total = ranked.agg(sum(col("n_occurrences")).as("__total"))
    ranked
      .join(broadcast(total))
      .withColumn(
        "corpus_share",
        round(col("n_occurrences").cast("double") / col("__total"), 6))
      .drop("__total")
  }

  /** Token-distribution shift between two corpus slices — the
    * data-mixture drift monitor: add-k-smoothed unigram distributions P
    * (rows where `isACol`) and Q (the rest) over the union vocabulary,
    * each token's KL contribution p·ln(p/q), and the corpus-level KL and
    * total-variation totals attached to every row. Returns the
    * `topN` tokens by contribution (desc, token asc) — the "what drifted"
    * diagnostic a mixture dashboard shows.
    *
    * Shape: one exploded-token aggregate (partial-aggregated) into the
    * vocabulary table; everything after runs over the VOCABULARY, and the
    * corpus totals come from one tiny cross-joined aggregate. Float
    * discipline: per-token contributions round to 9 decimals and total
    * via exact decimal sums — bit-identical in DuckDB. */
  def distributionShift(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      isACol: org.apache.spark.sql.Column,
      addK: Double = 0.5,
      topN: Int = 20): org.apache.spark.sql.DataFrame = {
    val counts = df
      .select(isACol.as("is_a"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("is_a"), 0L).otherwise(1L)).as("cb"))
    val totals = counts.agg(
      sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("v"))
    val scored = counts
      .crossJoin(broadcast(totals))
      .select(
        col("token"), col("ca"), col("cb"),
        ((col("ca") + lit(addK)) / (col("na") + lit(addK) * col("v"))).as("p"),
        ((col("cb") + lit(addK)) / (col("nb") + lit(addK) * col("v"))).as("q"))
      .select(
        col("token"), col("ca"), col("cb"),
        round(col("p") * log(col("p") / col("q")), 9).as("kl_term"),
        round(abs(col("p") - col("q")) / 2, 9).as("tv_term"))
    val overall = scored.agg(
      round(sum(col("kl_term").cast("decimal(28,9)")).cast("double"), 6).as("kl_total"),
      round(sum(col("tv_term").cast("decimal(28,9)")).cast("double"), 6).as("tv_total"))
    scored
      .orderBy(col("kl_term").desc, col("token").asc)
      .limit(topN)
      .crossJoin(broadcast(overall))
      .select(
        col("token"), col("ca"), col("cb"),
        round(col("kl_term"), 6).as("kl_contrib"),
        col("kl_total"), col("tv_total"))
  }

  /** Gopher document-quality rules (Rae et al. 2021, "Scaling Language
    * Models", table A1 — public paper): per-document structural filters
    * complementing [[repetitionMetrics]]. Emits the raw metrics plus one
    * combined `gopher_pass` flag:
    *
    *   - word count in [minWords, maxWords]
    *   - mean word length in [3, 10] characters
    *   - symbol-to-word ratio (# and ellipsis) below 0.1
    *   - at most 90% of lines starting with a bullet, at most 30%
    *     ending in an ellipsis
    *   - at least 80% of words containing an alphabetic character
    *   - at least 2 of the 8 required English stopwords present
    *
    * Every gate compares INTEGER counts (e.g. `sum_len >= 3 * n_words`
    * instead of `mean >= 3.0`), so pass/fail is bit-stable across
    * engines; the reported ratio columns are rounded for display only.
    * Shape at scale: one projection pass per row, no shuffle, fully
    * codegen'd — the tokenize-once discipline (tokens/lines projected
    * before use) avoids the lambda re-evaluation trap. */
  def gopherRules(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      minWords: Long = 50L,
      maxWords: Long = 100000L): org.apache.spark.sql.DataFrame = {
    val required = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    df
      .select(
        col(idCol),
        tokens(col(textCol)).as("toks"),
        split(col(textCol), "\n").as("lines"),
        ((length(col(textCol)) - length(replace(col(textCol), lit("#"), lit("")))) +
          (length(col(textCol)) - length(replace(col(textCol), lit("..."), lit("")))) / 3)
          .cast("long").as("n_symbols"))
      .select(
        col(idCol),
        size(col("toks")).cast("long").as("n_words"),
        aggregate(col("toks"), lit(0L), (a, t) => a + length(t)).as("sum_len"),
        size(filter(col("toks"), t => t.rlike("[a-z]"))).cast("long").as("n_alpha_words"),
        size(array_intersect(col("toks"), array(required.map(lit): _*)))
          .cast("long").as("n_stopwords_hit"),
        size(col("lines")).cast("long").as("n_lines"),
        size(filter(col("lines"), l => substring(ltrim(l), 1, 1).isin("-", "*", "•")))
          .cast("long").as("n_bullet_lines"),
        size(filter(col("lines"), l => l.endsWith("..."))).cast("long").as("n_ellipsis_lines"),
        col("n_symbols"))
      .select(
        col(idCol),
        col("n_words"),
        round(col("sum_len").cast("double") / col("n_words"), 6).as("mean_word_len"),
        round(col("n_symbols").cast("double") / col("n_words"), 6).as("symbol_ratio"),
        round(col("n_bullet_lines").cast("double") / col("n_lines"), 6).as("bullet_line_frac"),
        round(col("n_ellipsis_lines").cast("double") / col("n_lines"), 6).as("ellipsis_line_frac"),
        round(col("n_alpha_words").cast("double") / col("n_words"), 6).as("alpha_word_frac"),
        col("n_stopwords_hit"),
        when(
          col("n_words") >= minWords && col("n_words") <= maxWords &&
            col("sum_len") >= col("n_words") * 3 && col("sum_len") <= col("n_words") * 10 &&
            col("n_symbols") * 10 < col("n_words") &&
            col("n_bullet_lines") * 10 <= col("n_lines") * 9 &&
            col("n_ellipsis_lines") * 10 <= col("n_lines") * 3 &&
            col("n_alpha_words") * 5 >= col("n_words") * 4 &&
            col("n_stopwords_hit") >= 2, 1L).otherwise(0L).as("gopher_pass"))
  }

  def repetitionMetrics(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      maxTopBigramFrac: Double = 0.08,
      maxDup3GramFrac: Double = 0.02,
      minTokens: Int = 20): org.apache.spark.sql.DataFrame = {
    val top = df
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(allShinglesOf(col("__toks"), 2)).as("g"))
      .groupBy(col(idCol), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(round(max(col("c")).cast("double") / sum(col("c")).cast("double"), 6)
        .as("top_bigram_frac"))
    val dup = df
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(
        col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        allShinglesOf(col("__toks"), 3).as("a3"))
      .select(
        col(idCol),
        col("n_tokens"),
        round(lit(1.0) - size(array_distinct(col("a3"))).cast("double") / size(col("a3")), 6)
          .as("dup_3gram_frac"))
    dup
      .join(top, Seq(idCol))
      .withColumn(
        "repetition_flag",
        // The fraction metrics have a floor of 1/n for an n-gram doc, so a
        // fully diverse short doc (titles, captions) trips any fixed
        // threshold — e.g. 10 tokens → 9 distinct bigrams → 1/9 > 0.08.
        // Gopher applies repetition thresholds only above a minimum
        // length; below it the metrics are reported but never flag.
        when(col("n_tokens") >= minTokens &&
          (col("top_bigram_frac") > maxTopBigramFrac ||
            col("dup_3gram_frac") > maxDup3GramFrac), 1L).otherwise(0L))
  }

  /** Cross-document duplicated-span statistics — exact substring dedup
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better", public paper) re-expressed at word-n-gram granularity: a
    * gram POSITION is duplicated when its n-token gram also occurs in at
    * least `minDocs` distinct documents (itself included). Reports, per
    * doc, total gram positions, duplicated positions, their fraction,
    * and a flag when duplicated/total ≥ flagNum/flagDen (compared as
    * integers — bit-stable across engines, like [[gopherRules]]).
    *
    * Shape at scale: explode once → (1) distinct (doc, gram) + one
    * partial-aggregated count to find shared grams, (2) shared grams
    * equi-join back to the exploded stream, (3) per-doc count. Never
    * all-pairs, never a suffix structure held on one node: the shuffles
    * are keyed by gram (high cardinality, well spread) and doc id. The
    * suffix-array formulation finds arbitrary-length spans; fixed-n
    * grams are the bounded-memory distributed approximation (a length-L
    * duplicated span ⇒ L−n+1 duplicated grams, so long copies dominate
    * the fraction just the same). */
  def crossDocGramStats(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8,
      minDocs: Int = 2,
      flagNum: Int = 1,
      flagDen: Int = 5): org.apache.spark.sql.DataFrame = {
    val exploded = df
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(allShinglesOf(col("__toks"), n)).as("gram"))
    val shared = exploded
      .distinct() // (doc, gram) pairs — then count DOCS per gram
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("gram"))
    val dupPerDoc = exploded
      .join(shared, Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_grams"))
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(allShinglesOf(col("__toks"), n)).cast("long").as("n_grams"))
      .join(dupPerDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        round(coalesce(col("n_dup_grams"), lit(0L)).cast("double") / col("n_grams"), 6)
          .as("dup_fraction"),
        when(coalesce(col("n_dup_grams"), lit(0L)) * flagDen >= col("n_grams") * flagNum, 1L)
          .otherwise(0L).as("dup_flag"))
  }

  /** PII patterns for training-data scrubbing. Kept to syntax that means
    * the same thing in Java regex (Spark) and RE2 (DuckDB, Go tooling):
    * character classes, bounded repetition, alternation — no lookaround,
    * no backreferences (RE2 has neither, and a scrubber that can't run
    * in the validation engine can't be cross-checked). */
  val piiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiPhone = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
  val piiIpv4 = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Per-document PII entity counts (pre-redaction). */
  def piiCounts(text: Column): Seq[Column] = Seq(
    size(regexp_extract_all(text, lit(piiEmail), lit(0))).cast("long").as("n_emails"),
    size(regexp_extract_all(text, lit(piiPhone), lit(0))).cast("long").as("n_phones"),
    size(regexp_extract_all(text, lit(piiIpv4), lit(0))).cast("long").as("n_ips"))

  /** Redact PII in place with typed placeholders. Order matters: emails
    * first (their domains contain dotted tokens an IP pattern could
    * partially match), then phones, then bare IPs. Pure per-row codegen'd
    * projection — at 100 TB this runs in the scan stage, no shuffle. */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, piiEmail, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, piiPhone, "<PHONE>")
    regexp_replace(noPhone, piiIpv4, "<IP>")
  }

  /** DIMSUM-sampled term-term co-occurrence cosine (Zadeh & Goel 2013,
    * "Dimension Independent Similarity Computation" — public paper; the
    * public reference implementation is Spark MLlib's
    * `RowMatrix.columnSimilarities(threshold)`). The doc-term matrix is
    * the canonical tall-skinny case: billions of doc rows, a bounded
    * vocab of columns. Exact all-pairs pays a per-doc pair fan-out
    * dominated by hot terms; DIMSUM keeps each (doc, term) entry with
    * probability `pmin_t = min(1, sqrtGamma / ||c_t||)` — hot columns
    * sampled DOWN by their norm — and reweights by `1/pmin`, making the
    * sampled dot product an unbiased estimator whose total emission count
    * is O(γ · vocab) regardless of stopword density (the independent-
    * coin variant of the paper's DIMSUMv2).
    *
    * Determinism/oracle design: the coin is the portable md5 hash of
    * `doc:term` (replayable in SQL — no RNG state), and the sampled dot
    * is an INTEGER sum of tf products, so the only float arithmetic is a
    * fixed per-pair expression over integer sums and per-term norms —
    * no accumulation-order sensitivity between engines. The exact
    * cosine rides along as the verifier column (at production scale you
    * drop it; here it gates the estimate). Output per co-occurring pair
    * (term_a < term_b): exact `cos`, sampled `est_cos`, `abs_err`. */
  def dimsumTermSimilarity(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      sqrtGamma: Double = 30.0): org.apache.spark.sql.DataFrame = {
    val two60 = 1.152921504606846976e18 // 2^60, exactly representable
    val e = df
      .select(col(idCol).cast("string").as("doc"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val p = e
      .groupBy(col("term"))
      .agg(sqrt(sum(col("tf") * col("tf")).cast("double")).as("nrm"))
      .withColumn("pmin", least(lit(1.0), lit(sqrtGamma) / col("nrm")))
    // vocab is the model-sized side (bounded; millions of terms at most)
    val ep = e.join(broadcast(p.select(col("term"), col("pmin"))), Seq("term"))
    val s = ep
      .filter(
        portableHash(concat(col("doc"), lit(":"), col("term"))).cast("double") / two60
          < col("pmin"))
      .select(col("doc"), col("term"), col("tf"))
    def pairDots(entries: org.apache.spark.sql.DataFrame, out: String) =
      entries.as("a")
        .join(entries.as("b"), col("a.doc") === col("b.doc") && col("a.term") < col("b.term"))
        .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"))
        .agg(sum(col("a.tf") * col("b.tf")).as(out))
    val exact = pairDots(e, "dot")
    val est = pairDots(s, "sdot")
    exact
      .join(est, Seq("term_a", "term_b"), "left")
      .join(
        broadcast(p.select(col("term").as("term_a"), col("nrm").as("na"), col("pmin").as("pa"))),
        Seq("term_a"))
      .join(
        broadcast(p.select(col("term").as("term_b"), col("nrm").as("nb"), col("pmin").as("pb"))),
        Seq("term_b"))
      .select(
        col("term_a"),
        col("term_b"),
        col("dot"),
        round(col("dot").cast("double") / (col("na") * col("nb")), 6).as("cos"),
        round(
          coalesce(col("sdot").cast("double") / (col("pa") * col("pb")), lit(0.0))
            / (col("na") * col("nb")), 6).as("est_cos"))
      .withColumn("abs_err", round(abs(col("est_cos") - col("cos")), 6))
  }

  /** Cross-document n-gram novelty: per doc, the fraction of its
    * DISTINCT word n-gram shingles that appear in NO other document —
    * the corpus-uniqueness signal a curation pipeline reads alongside
    * the within-doc repetition metrics (d20) and the substring-dup
    * screen (d30): low novelty = boilerplate/template mass; for docs
    * that mirror a reference set it is the memorization-risk prior.
    *
    * Scale shape: one explode of per-doc distinct shingles, one
    * partial-aggregated df count, one shuffle equi-join back on the
    * shingle key (the shingle vocabulary is unbounded — never
    * broadcast), one per-doc fold. All counts are exact integers; the
    * single float division rounds to 6. */
  def novelty(docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), explode(shinglesOf(col("__toks"), n)).as("g"))
    // sh is distinct per doc, so the count per shingle IS its document
    // frequency
    val dfv = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
    sh
      .join(dfv, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, lit(1L)).otherwise(lit(0L))).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_shingles"), 6))
  }

  /** PMI collocation extraction (Church & Hanks 1990, public paper):
    * the top bigrams by pointwise mutual information
    * ln(P(ab) / (P(a)·P(b))) — the multiword-expression discovery pass
    * a corpus analysis runs (for tokenizer vocab curation, boilerplate
    * fingerprints, domain phrase inventories). `minCount` floors the
    * bigram support (PMI is notoriously noisy on rare pairs).
    *
    * Scale shape: bigrams form ARRAY-side (`zip_with` against the
    * token array's own tail — the d40 lesson: no positional self-join,
    * no window) and collapse through one partial-aggregated groupBy;
    * unigram counts join back on the term keys as shuffle equi-joins
    * (the vocabulary is unbounded — never broadcast); T and B fall out
    * of the two count tables as 1-row aggregates. The top-k is an
    * orderBy+limit → TakeOrderedAndProject, never a global sort.
    *
    * Bit-exactness: all counts are exact integers; the PMI argument is
    * computed in ONE pinned float order (c_ab·T·T) / (B·c_a·c_b)
    * mirrored textually by the oracle, one ln (round-6 micro-stable,
    * the d12 contract), ordering on round-6 PMI with (t1, t2)
    * tie-breaks. */
  def pmiCollocations(
      docs: DataFrame,
      textCol: String,
      minCount: Long,
      topK: Int): DataFrame = {
    val toks = docs.select(tokens(col(textCol)).as("toks"))
    val uni = toks
      .select(explode(col("toks")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val bgAll = toks
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("t1"), b.as("t2")))).as("bg"))
      .groupBy(col("bg.t1").as("t1"), col("bg.t2").as("t2"))
      .agg(count(lit(1)).as("c_ab"))
    // B is the TOTAL bigram count — summed BEFORE the support floor,
    // or P(ab) would be conditioned on "is a frequent pair"
    val bg = bgAll.filter(col("c_ab") >= minCount)
    val totals = uni.agg(sum(col("c")).as("t_total"))
      .crossJoin(bgAll.agg(sum(col("c_ab")).as("b_total")))
    bg
      .join(uni.select(col("term").as("t1"), col("c").as("c_a")), Seq("t1"))
      .join(uni.select(col("term").as("t2"), col("c").as("c_b")), Seq("t2"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi", round(
        log((col("c_ab").cast("double") * col("t_total").cast("double") * col("t_total").cast("double"))
          / (col("b_total").cast("double") * col("c_a").cast("double") * col("c_b").cast("double"))), 6))
      .orderBy(col("pmi").desc, col("t1").asc, col("t2").asc)
      .limit(topK)
      .select(col("t1"), col("t2"), col("c_ab"), col("c_a"), col("c_b"), col("pmi"))
  }
}
