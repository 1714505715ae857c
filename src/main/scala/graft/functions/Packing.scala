package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly: concatenate documents in
  * a deterministic order and split the token stream every `seqLen`
  * tokens ("concat-and-split" packing, the standard LM pre-training
  * batching described in public training reports — GPT-3 §2.3,
  * The Pile §2). Each document is assigned the range of fixed-length
  * sequences it lands in.
  *
  * Packing is computed WITHIN a stratum (source, shard, ...): a global
  * token order would serialize the cumulative sum through one reducer,
  * while per-stratum windows parallelize across strata — the same
  * decomposition a 1000-executor run needs, where each shard packs
  * independently. One shuffle by stratum; the cumulative sum is exact
  * integer arithmetic, so results are engine-portable. */
object Packing {

  /** Per-document packing positions: `tok_start` (0-based offset of the
    * doc's first token in its stratum's concatenated stream),
    * `start_seq`/`end_seq` (the first/last `seqLen`-token sequence the
    * doc occupies), and `seq_offset` (position within `start_seq`). */
  def packSequences(
      df: DataFrame,
      stratumCol: String,
      orderCol: String,
      tokensCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = Window.partitionBy(col(stratumCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("tok_end", sum(col(tokensCol)).over(w).cast("long"))
      .withColumn("tok_start", (col("tok_end") - col(tokensCol)).cast("long"))
      .select(
        col(stratumCol),
        col(orderCol),
        col(tokensCol),
        col("tok_start"),
        // `div` is Spark's integral divide on longs — the Column `/`
        // operator divides in double, which drifts from DuckDB's exact
        // BIGINT `//` once cumulative token counts pass 2^53. Counts are
        // nonnegative, so div == floor-div.
        expr(s"tok_start div $seqLen").as("start_seq"),
        // last token of the doc is tok_end - 1; empty docs stay in start_seq
        expr(s"greatest(tok_end - 1, tok_start) div $seqLen").as("end_seq"),
        (col("tok_start") % seqLen).cast("long").as("seq_offset"))
  }

  /** Sliding-window chunking of each document's token stream: windows of
    * `chunkSize` tokens every `stride` tokens (overlap = chunkSize −
    * stride), the standard pre-embedding split of long documents. Pure
    * per-row array arithmetic + explode — no shuffle; chunk count per
    * doc is ⌈max(n − overlap, 1) / stride⌉. */
  def chunkTokens(
      df: DataFrame,
      textCol: String,
      idCol: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val toks = TextFunctions.tokens(col(textCol))
    df
      .select(col(idCol), toks.as("toks"))
      .select(
        col(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        explode(
          transform(
            // starts 1, 1+stride, ... while start <= max(n - (chunk-stride), 1)
            sequence(
              lit(1),
              greatest(size(col("toks")) - (chunkSize - stride), lit(1)),
              lit(stride)),
            start => struct(
              ((start - 1) / stride).cast("long").as("chunk_id"),
              (start - 1).cast("long").as("tok_offset"),
              array_join(slice(col("toks"), start, lit(chunkSize)), " ").as("chunk_text"))))
          .as("c"))
      .select(
        col(idCol),
        col("n_tokens"),
        col("c.chunk_id").as("chunk_id"),
        col("c.tok_offset").as("tok_offset"),
        col("c.chunk_text").as("chunk_text"))
  }
}
