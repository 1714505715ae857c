package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE (byte-pair-encoding) tokenizer training and application — the
  * subword-vocabulary step of an LLM data pipeline (Sennrich et al. 2016;
  * the greedy merge loop over a word-frequency table).
  *
  * Spark-first decomposition:
  *   - The training corpus collapses ONCE to the distinct-word frequency
  *     table — the classic BPE formulation. All `nMerges` iterations run
  *     over that table (distinct words: thousands at test scale, low
  *     millions at 100 TB — never the raw token stream).
  *   - Each iteration is one distributed aggregate: adjacent symbol pairs
  *     form array-side (`zip_with` of the symbol array against its own
  *     tail — the NgramLm shape), weighted by word count, and the argmax
  *     pair (count desc, pair asc for determinism) is ONE collected row.
  *   - The merge applies in a typed `map` over the word table (a
  *     sequential left-to-right fold per word — in-JVM kernel, the DTW
  *     precedent), then `localCheckpoint` cuts the growing lineage so
  *     iteration N's plan does not replay iterations 1..N−1.
  *
  * The merge list is driver-side kilobytes (the MODEL — store/broadcast
  * it); [[encodeWords]] applies it to any corpus by encoding the corpus's
  * DISTINCT words once and broadcast-joining the lengths back, so
  * application cost scales with vocabulary, not corpus size.
  *
  * Training is iterative and stateful — not expressible in one SQL query,
  * so (like DTW and the trained-ANN family) queries over it are rows-only
  * and the kernel is locked by golden tests (BpeSpec: the classic
  * low/lower/newest/widest example).
  */
object Bpe {

  /** End-of-word marker (kept as its own symbol, as in the paper). */
  val EndOfWord = "</w>"

  final case class Merge(rank: Int, left: String, right: String) {
    def merged: String = left + right
  }

  /** Split a word into its initial symbol sequence: characters plus the
    * end-of-word marker. */
  def initialSymbols(word: String): Vector[String] =
    word.toVector.map(_.toString) :+ EndOfWord

  /** One left-to-right merge pass: adjacent (left, right) pairs collapse.
    * Greedy left-to-right, matching the reference algorithm. */
  def applyMerge(symbols: Vector[String], left: String, right: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < symbols.length) {
      if (i + 1 < symbols.length && symbols(i) == left && symbols(i + 1) == right) {
        out += (left + right)
        i += 2
      } else {
        out += symbols(i)
        i += 1
      }
    }
    out.result()
  }

  /** Apply a full merge list in rank order to one word. */
  def encodeWord(word: String, merges: Seq[Merge]): Vector[String] =
    merges.sortBy(_.rank).foldLeft(initialSymbols(word)) { (syms, m) =>
      if (syms.length < 2) syms else applyMerge(syms, m.left, m.right)
    }

  /** Train `nMerges` BPE merges on the corpus behind `docs(textCol)`.
    * Deterministic: the argmax pair breaks count ties on (left asc,
    * right asc). Stops early when no adjacent pair occurs twice. */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._

    // the word-frequency table — the only pass over the raw corpus
    var words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => (initialSymbols(w), n) }
      .toDF("symbols", "n")
      .localCheckpoint(true)

    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val top = words
        .select(
          col("n"),
          explode(
            zip_with(
              slice(col("symbols"), lit(1), size(col("symbols")) - 1),
              slice(col("symbols"), lit(2), size(col("symbols")) - 1),
              (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty || top.head.getAs[Long]("c") < 2) exhausted = true
      else {
        val (l, r) = (top.head.getAs[String]("l"), top.head.getAs[String]("r"))
        merges += Merge(rank, l, r)
        words = words
          .as[(Vector[String], Long)]
          .map { case (syms, n) => (applyMerge(syms, l, r), n) }
          .toDF("symbols", "n")
          .localCheckpoint(true) // cut lineage: iteration N must not replay 1..N-1
        rank += 1
      }
    }
    merges.result()
  }

  /** The merge list as a DataFrame (rank, left, right, merged) — the
    * model table to store or join. */
  def mergesTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank.toLong, m.left, m.right, m.merged))
      .toDF("rank", "left", "right", "merged")
  }

  /** Rebuild the merge list from a stored merges table (the inverse of
    * [[mergesTable]]) — pairs with
    * [[graft.sources.ModelStore]] for versioned tokenizer models:
    * `fromTable(ModelStore.load(spark, root, Some(v)))` is "tokenize with
    * vocabulary VERSION AS OF v". */
  def fromTable(df: DataFrame): Seq[Merge] = {
    import org.apache.spark.sql.functions.col
    df.select(col("rank").cast("int"), col("left"), col("right"))
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_.rank)
      .toSeq
  }

  /** Per-doc BPE token counts under a trained merge list: the corpus's
    * DISTINCT words encode once (typed map over the vocab table), then
    * the per-word subword lengths broadcast-join back to the exploded
    * stream — application cost scales with vocabulary, not corpus. */
  def tokenCounts(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val stream = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
    val wordLens = stream
      .select(col("word")).distinct()
      .as[String]
      .map(w => (w, encodeWord(w, merges).length.toLong))
      .toDF("word", "n_subtok")
    stream
      .join(broadcast(wordLens), Seq("word"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_subtok")).as("n_bpe_tokens"))
  }
}
