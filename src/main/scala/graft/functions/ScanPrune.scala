package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Literal scan-predicate construction for the stored-index probe
  * paths ([[Retrieval.pruneToTerms]], [[graft.streaming.StreamingDedup]]'s
  * fp-suspect pushdown): plant a bounded driver-collected key set as a
  * predicate the parquet reader can evaluate against row-group
  * statistics, dictionaries, and column indexes.
  *
  * Why not one big `isin`: Spark translates `sources.In` to an
  * OR-of-equalities only up to `spark.sql.parquet.pushdown.
  * inFilterThreshold` VALUES — beyond it the pushed filter degrades to
  * a `min ≤ x ≤ max` RANGE (SPARK-32792), which prunes nothing when the
  * keys are spread across the column's domain (random 64-bit
  * fingerprints; an eval vocabulary spanning the corpus vocabulary).
  * And the threshold cannot simply be raised to the full set size: the
  * OR tree is built `reduceLeft`, so parquet evaluates it by recursing
  * ONCE PER VALUE — tens of thousands of frames risks the task stack.
  *
  * So: chunk the values into `isin` groups of [[eqChunk]] (each small
  * enough to translate to OR-of-eq under the engine's threshold — the
  * session builders set `inFilterThreshold` = [[eqChunk]]) and OR the
  * chunks with a BALANCED reduction. Max recursion depth is eqChunk +
  * log2(chunks) regardless of set size, and every value stays an exact
  * equality the reader can test against row-group min/max (precise on a
  * key-clustered layout), dictionary pages, and parquet bloom filters. */
object ScanPrune {

  /** Values per `isin` chunk — must not exceed the session's
    * `spark.sql.parquet.pushdown.inFilterThreshold` or chunks silently
    * degrade to range filters ([[ensureEqPushdown]] raises it). */
  val eqChunk = 100

  /** Raise the session's parquet In-pushdown threshold STRICTLY ABOVE
    * [[eqChunk]] if it is lower (never lowered — a caller's larger
    * value stands): a full chunk must not sit exactly on the engine's
    * `values.length <= threshold` boundary, where a Spark change to
    * strict `<` (or a user conf of exactly eqChunk) would silently
    * degrade every full chunk to a useless min/max range — results
    * unchanged, pruning gone (ScanPruneSpec's boundary test measures
    * the scan's numOutputRows to catch exactly that). A pure cost knob:
    * it changes how a pushed `In` translates at the reader (OR-of-eq vs
    * min/max range), never which rows qualify. Spark reads it at
    * execution time, so setting it at plan construction is sufficient.
    * Callers that plant [[inLiteral]] predicates over clustered parquet
    * call this first. */
  def ensureEqPushdown(spark: org.apache.spark.sql.SparkSession): Unit = {
    val key = "spark.sql.parquet.pushdown.inFilterThreshold"
    if (spark.conf.getOption(key).forall(_.toInt <= eqChunk))
      spark.conf.set(key, (eqChunk + 1).toString)
  }

  /** Row-group estimate for the DENSITY GATE on multi-chunk literals: a
    * k-value literal pays a per-row InSet probe on every SURVIVING row
    * group, so it only beats the unpruned-scan alternative while k stays
    * at or under the row-group count (measured 6× slower engaged blindly
    * at k=4096 over 32 row groups — PERF.md's pushdown law). Files
    * approximate row groups only while each stays under one parquet
    * block; compacted dirs carry several row groups per file, so the
    * file count is floored with total bytes / the 128 MB default block —
    * a file-count-only estimate would disengage the pushdown exactly in
    * the large-index regime it was built for. */
  def estimatedRowGroups(df: org.apache.spark.sql.DataFrame): Long = {
    val files = df.inputFiles.length.toLong
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parquetBlock = BigInt(128L * 1024 * 1024) // parquet.block.size default
    math.max(files, (bytes / parquetBlock).toLong)
  }

  /** `c IN (values)` as OR'd ≤[[eqChunk]]-value `isin` chunks (balanced
    * over chunks). `values` must be non-empty and is deduplicated; the
    * caller bounds its size (this builds a plan literal per value). */
  def inLiteral(c: Column, values: Seq[Any]): Column = {
    require(values.nonEmpty, "inLiteral needs at least one value")
    def balanced(cs: Seq[Column]): Column =
      if (cs.length == 1) cs.head
      else {
        val (l, r) = cs.splitAt(cs.length / 2)
        balanced(l) || balanced(r)
      }
    balanced(values.distinct.grouped(eqChunk).map(g => c.isin(g: _*)).toSeq)
  }
}
