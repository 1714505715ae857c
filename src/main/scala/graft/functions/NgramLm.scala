package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model scoring — the CCNet-style quality filter: train
  * an add-k-smoothed bigram LM on the corpus, score every document by its
  * mean log-probability / perplexity, and filter the tail. (CCNet scores
  * against a KenLM n-gram model; the relational re-expression trains the
  * model in the same job — counts ARE the model.)
  *
  * Spark-first shape, all codegen'd builtins:
  *   1. tokenize → bigram pairs formed ARRAY-side (`zip_with` against
  *      the array's own tail) → one explode — no positional self-join,
  *      no window, no sort;
  *   2. vocabulary = top-`vocabSize` tokens (count desc, token asc), OOV
  *      folded to `<unk>` through a broadcast left join — unbounded raw
  *      vocab never becomes a grouping key;
  *   3. the stream collapses immediately to per-doc DISTINCT-bigram
  *      counts ([[docBigramCounts]]) — everything downstream (bigram and
  *      context counts, effective vocab size, scoring) derives from that
  *      one table, so the expensive explode+window subtree exists ONCE in
  *      the plan. Multi-branch reuse of it is the m11 lesson (NOTES.md):
  *      MATERIALIZE the shared subplan — callers that run the full
  *      pipeline should stage/cache the counts table (the registered d40
  *      query routes it through StagingCache);
  *   4. P(w2|w1) = (c12 + k) / (c1 + k·V), V = distinct mapped tokens —
  *      the model is ≤ V² rows by construction, so the scoring join is a
  *      broadcast.
  *
  * Float discipline (NOTES.md): each bigram's log-prob is rounded to 6
  * decimals, weighted by its exact integer count, and summed as DECIMAL —
  * exact and order-independent — then divided by the token count as
  * double. Bit-identical in DuckDB.
  *
  * At 100 TB: one token-stream shuffle (partitioned by doc) + one
  * aggregation into the counts table; counts and model are corpus-global
  * and tiny (≤ V²); scoring is map-side after the broadcast. To train on
  * a sample but score the full corpus, pass a sampled `trainDocs`.
  */
object NgramLm {

  /** Top-`vocabSize` tokens by (count desc, token asc), each with a
    * dense integer id `vid` >= 1 (0 is reserved for `<unk>`) — V rows,
    * broadcastable. Downstream works on ids, never token strings: the
    * bigram shuffle and aggregate hash (long, int, int) instead of
    * string pairs. */
  def vocabulary(docs: DataFrame, textCol: String, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be > 0, got $vocabSize")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("tok").asc)
    toksOf(docs, textCol)
      .select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(vocabSize)
      // single-partition window over <= vocabSize rows — intentional
      .withColumn("vid", row_number().over(w))
      .select(col("tok"), col("vid"))
  }

  /** Per-doc distinct-bigram counts (id, w1, w2, cnt) with w1/w2 the
    * integer vocab ids (OOV folded to 0 = `<unk>`) — the ONE heavy pass,
    * and it is shuffle-minimal: bigram
    * pairs form ARRAY-SIDE (`zip_with` of the token array against its
    * own tail — no posexplode, no doc-partitioned sort, no window), then
    * one explode, two broadcast vocab joins, and a single aggregate
    * exchange. Measured at 2M docs / 80M tokens: the window-lead
    * formulation paid a full sort of the token stream; this shape is the
    * same result with the sort deleted. Stage/cache the output when both
    * training and scoring read it. */
  def docBigramCounts(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      vocab: DataFrame): DataFrame = {
    def asSide(side: String) = vocab
      .select(col("tok").as(s"t$side"), col("vid").as(s"v$side"))
    toksOf(docs, textCol)
      .select(
        col(idCol),
        explode(
          zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => struct(a.as("t1"), b.as("t2")))).as("bg"))
      .select(col(idCol), col("bg.t1").as("t1"), col("bg.t2").as("t2"))
      .join(broadcast(asSide("1")), Seq("t1"), "left")
      .join(broadcast(asSide("2")), Seq("t2"), "left")
      .groupBy(
        col(idCol),
        coalesce(col("v1"), lit(0)).as("w1"),
        coalesce(col("v2"), lit(0)).as("w2"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Add-k model (w1, w2, lp) from a counts table: c12 and c1 re-aggregate
    * the counts (no corpus rescan); V = distinct tokens across both bigram
    * sides (= the distinct mapped token stream — every position of a
    * scored doc is in some bigram). */
  def modelFromCounts(docBig: DataFrame, addK: Double = 0.5): DataFrame = {
    require(addK > 0, s"addK must be > 0, got $addK")
    val c12 = docBig.groupBy(col("w1"), col("w2")).agg(sum(col("cnt")).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vsz = docBig.select(col("w1").as("w"))
      .unionByName(docBig.select(col("w2").as("w")))
      .agg(countDistinct(col("w")).as("v"))
    c12
      .join(broadcast(c1), Seq("w1"))
      .crossJoin(broadcast(vsz))
      .select(
        col("w1"), col("w2"),
        round(log((col("c12") + lit(addK)) / (col("c1") + lit(addK) * col("v"))), 6).as("lp"))
  }

  /** Per-doc scores (id, n_bigrams, avg_logprob, ppl) for a counts table
    * against a model: count-weighted exact-decimal mean log-prob. */
  def scoresFromCounts(docBig: DataFrame, model: DataFrame, idCol: String): DataFrame =
    docBig
      .join(broadcast(model), Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(
        sum(col("cnt")).as("n_bigrams"),
        (sum(col("cnt") * col("lp").cast("decimal(28,6)")).cast("double") /
          sum(col("cnt")).cast("double")).as("avg_lp_raw"))
      .select(
        col(idCol),
        col("n_bigrams"),
        round(col("avg_lp_raw"), 6).as("avg_logprob"),
        round(exp(-round(col("avg_lp_raw"), 6)), 6).as("ppl"))

  /** Full pipeline over `docs(idCol, textCol)`. Documents with fewer than
    * two tokens have no bigrams and are excluded. `trainDocs` (default:
    * the scored corpus itself) supplies the counting corpus. */
  def bigramScores(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      vocabSize: Int = 512,
      addK: Double = 0.5,
      trainDocs: Option[DataFrame] = None): DataFrame = {
    val vocab = vocabulary(trainDocs.getOrElse(docs), textCol, vocabSize)
    val trainBig = docBigramCounts(trainDocs.getOrElse(docs), textCol, idCol, vocab)
    val scoreBig =
      if (trainDocs.isEmpty) trainBig
      else docBigramCounts(docs, textCol, idCol, vocab)
    scoresFromCounts(scoreBig, modelFromCounts(trainBig, addK), idCol)
  }

  /** Scores + a `keep` flag for docs whose perplexity is at or below
    * `maxPpl` — the filtering step composed on [[bigramScores]]. */
  def perplexityFilter(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      maxPpl: Double,
      vocabSize: Int = 512,
      addK: Double = 0.5): DataFrame =
    bigramScores(docs, textCol, idCol, vocabSize, addK)
      .withColumn("keep", col("ppl") <= maxPpl)

  private def toksOf(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("toks", TextFunctions.tokens(col(textCol)))
      .filter(size(col("toks")) >= 2)
}
