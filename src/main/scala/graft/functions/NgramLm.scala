package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bigram language-model scoring — the CCNet-style quality filter: train
  * an add-k-smoothed bigram LM on the corpus, score every document by its
  * mean log-probability / perplexity, and filter the tail. (CCNet scores
  * against a KenLM n-gram model; the relational re-expression trains the
  * model in the same job — counts ARE the model.)
  *
  * Spark-first shape, all codegen'd builtins:
  *   1. tokenize → posexplode → ONE shuffle by doc to form the bigram
  *      stream via a window `lead` (no positional self-join);
  *   2. vocabulary = top-`vocabSize` tokens (count desc, token asc), OOV
  *      folded to `<unk>` through a broadcast left join — unbounded raw
  *      vocab never becomes a grouping key;
  *   3. unigram-context and bigram counts are partial-aggregated
  *      (map-side combine) over the mapped stream;
  *   4. P(w2|w1) = (c12 + k) / (c1 + k·V), V = distinct mapped tokens —
  *      the model is ≤ V² rows by construction, so the scoring join is a
  *      broadcast; per-doc mean log-prob aggregates the stream in place.
  *
  * Float discipline (NOTES.md): each bigram's log-prob is rounded to 6
  * decimals and summed as DECIMAL(28,6) — exact, order-independent — then
  * divided by the count as double. Bit-identical in DuckDB.
  *
  * At 100 TB: the token-stream shuffle is the cost, and it is one shuffle,
  * partitioned by doc — the same discipline as the lag-corr scan. Counts
  * and the model are corpus-global and tiny (≤ V²); scoring is map-side
  * after the broadcast. To train on a sample but score the full corpus,
  * pass a sampled `trainDocs`.
  */
object NgramLm {

  private def toksOf(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)

  /** (id, pos, w): the token stream with OOV folded to `<unk>`. */
  private def mappedStream(toksed: DataFrame, vocab: DataFrame, idCol: String): DataFrame =
    toksed
      .select(col(idCol), posexplode(col("toks")).as(Seq("pos", "tok")))
      .join(broadcast(vocab), Seq("tok"), "left")
      .select(
        col(idCol), col("pos"),
        when(col("in_vocab").isNull, lit("<unk>")).otherwise(col("tok")).as("w"))

  /** (id, w1, w2) via a window `lead` over the stream — one shuffle by
    * doc, no positional self-join. */
  private def bigramsOf(stream: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    stream
      .withColumn("w2", lead(col("w"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col(idCol), col("w").as("w1"), col("w2"))
  }

  /** Per-document bigram LM scores over `docs(idCol, textCol)`: returns
    * (id, n_bigrams, avg_logprob, ppl). Documents with fewer than two
    * tokens have no bigrams and are excluded. `trainDocs` (default: the
    * scored corpus itself) supplies the counting corpus. */
  def bigramScores(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      vocabSize: Int = 512,
      addK: Double = 0.5,
      trainDocs: Option[DataFrame] = None): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be > 0, got $vocabSize")
    require(addK > 0, s"addK must be > 0, got $addK")

    val train = toksOf(trainDocs.getOrElse(docs), textCol, idCol)

    // top-V vocabulary from the training stream; V rows — broadcast
    val vocab = train
      .select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(vocabSize)
      .select(col("tok"), lit(true).as("in_vocab"))

    val trainStream = mappedStream(train, vocab, idCol)
    val trainBigrams = bigramsOf(trainStream, idCol)

    // effective vocabulary size (distinct mapped tokens, <unk> included):
    // one small aggregate, broadcast back as a scalar
    val vsz = trainStream.agg(countDistinct(col("w")).as("v"))

    val c1 = trainBigrams.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val c12 = trainBigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))

    // ≤ V² rows by construction → broadcast; the per-bigram log-prob is
    // rounded before the exact decimal sum (cross-engine bit stability)
    val model = c12
      .join(broadcast(c1), Seq("w1"))
      .crossJoin(broadcast(vsz))
      .select(
        col("w1"), col("w2"),
        round(log((col("c12") + lit(addK)) / (col("c1") + lit(addK) * col("v"))), 6).as("lp"))

    val scoreBigrams =
      if (trainDocs.isEmpty) trainBigrams
      else bigramsOf(mappedStream(toksOf(docs, textCol, idCol), vocab, idCol), idCol)

    scoreBigrams
      .join(broadcast(model), Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        (sum(col("lp").cast("decimal(28,6)")).cast("double") / count(lit(1)))
          .as("avg_lp_raw"))
      .select(
        col(idCol),
        col("n_bigrams"),
        round(col("avg_lp_raw"), 6).as("avg_logprob"),
        round(exp(-round(col("avg_lp_raw"), 6)), 6).as("ppl"))
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
}
