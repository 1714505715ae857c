package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval (Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework: BM25 and Beyond" — public paper),
  * expressed as a relational inverted-index probe: the corpus side is
  * a (doc, term, tf) postings table, the query side a small exploded
  * term list, and scoring touches ONLY the postings of query terms.
  * Completes the retrieval family: d12 ranks a document's own terms
  * (TF-IDF feature extraction); this ranks DOCUMENTS for a query — the
  * eval-retrieval / RAG-style lookup a training-data pipeline runs
  * against its corpus (e.g. "which training docs answer the eval
  * questions" — the retrieval form of the d19/d48 contamination audits).
  *
  * Scale shape: df + avgdl are corpus-level aggregates a deployment
  * computes once and reuses per query batch (here they stay lazy
  * subplans of the one registered query). The postings⋈queries join
  * broadcasts the query-term list (queries are small by construction;
  * the corpus NEVER broadcasts), the per-(query, doc) sum is one
  * partial-aggregated groupBy over candidate postings only — docs
  * sharing no query term are never scored — and the final top-k is a
  * rank-filtered window that Spark rewrites to WindowGroupLimit
  * (partial per-partition top-k BEFORE the query_id shuffle, the d39
  * convention), so the last exchange carries ≤ k·partitions rows per
  * query regardless of candidate count.
  *
  * Bit-exactness (the d61 integer micro-unit convention): each
  * per-term contribution idf·tf_part is rounded to integer MICRO-UNITS
  * and the per-doc score is an integer SUM — order-free, so aggregate
  * reordering cannot move a float bit — with one float division at the
  * end. idf uses the Lucene-shifted form ln(1 + (N − df + ½)/(df + ½)),
  * which is strictly positive (no negative-idf clamp needed); ln at
  * round-6 micro granularity is the established d12 contract. Ranking
  * compares the exact integer micro score with a doc-id tie-break, so
  * rank order is bit-stable by construction.
  */
object Retrieval {

  /** BM25 free parameters — the standard defaults (k1 saturates term
    * frequency, b interpolates document-length normalization). */
  val k1 = 1.2
  val b = 0.75

  /** Above this many distinct query/phrase terms the literal scan
    * filter is replaced by a codegen'd bloom pre-filter: a giant
    * literal IN array costs more than the row groups it prunes (the
    * BloomPrune ≤64k-words lesson, applied conservatively), while the
    * bloom keeps most of the pruning at ANY vocabulary size — the
    * 10⁵-10⁶-sentence decontamination sweep lives above this cap. */
  val maxTermPushdown = 10000

  /** Literal-predicate pushdown for the index SERVE paths: the stored
    * postings are term-clustered precisely so parquet min/max can prune
    * row groups to the query/phrase vocabulary — but a broadcast JOIN
    * alone never reaches the scan as a pushable filter, so the serve
    * paths collect the (small by construction: a query batch or an
    * eval-sentence list) distinct term set on the driver and plant it
    * as an `isin` literal. Results are unchanged — every downstream
    * join already restricts to these terms — only the scan shrinks.
    *
    * EAGER: the vocabulary collect is a Spark job that runs at
    * DataFrame-CONSTRUCTION time, on every call — the serve entry
    * points that use this ([[bm25FromIndex]], [[phraseSearchFromIndex]],
    * [[snippetsFromIndex]]) are not fully lazy. Callers composing plans
    * or wrapping construction in retries/metrics should construct once
    * and reuse the returned frame. */
  private def pruneToTerms(postings: DataFrame, termCol: DataFrame): DataFrame =
    pruneDecision(termCol) match {
      case Left(terms) if terms.isEmpty => postings
      case Left(terms) =>
        // chunked so every term stays an exact equality at the reader
        // (one flat isin above the session threshold would degrade to a
        // useless min/max range — ScanPrune's rationale)
        ScanPrune.ensureEqPushdown(postings.sparkSession)
        postings.filter(ScanPrune.inLiteral(col("term"), terms))
      case Right(words) =>
        BloomPrune.pruneAuto(postings, col("term"), words)
    }

  /** Memo for [[pruneDecision]]: a serve loop constructing
    * bm25FromIndex/phraseSearchFromIndex repeatedly over an IDENTICAL
    * phrase frame pays the vocabulary collect — and in the over-cap
    * branch the bloom build — once instead of per call. Entries are
    * keyed by the frame's canonicalized analyzed plan compared with
    * `sameResult` (never a hash alone: a collision would prune with the
    * WRONG vocabulary and silently drop matching postings) and only
    * DRIVER-LOCAL frames (every leaf a LocalRelation) are memoized —
    * a file-backed frame's plan stays identical when the file's
    * CONTENT changes, and a stale vocabulary there would be a
    * correctness bug, not a cost one. Bounded LRU, per session. */
  private val pruneMemoMax = 8
  private val pruneMemo = scala.collection.mutable.ListBuffer.empty[(
    org.apache.spark.sql.SparkSession,
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
    Either[Seq[String], Array[Long]])]
  private[graft] var pruneMemoHits = 0 // spec hook
  // spec hooks: entry count and whether any entry belongs to `s`
  private[graft] def pruneMemoSize: Int = pruneMemo.synchronized(pruneMemo.length)
  private[graft] def pruneMemoHolds(s: org.apache.spark.sql.SparkSession): Boolean =
    pruneMemo.synchronized(pruneMemo.exists(_._1 eq s))
  // spec hook: stand-in for sparkContext.isStopped — the shared-JVM
  // test suite can't hold a second, independently stoppable
  // SparkContext, so the sweep predicate is injectable there
  private[graft] var pruneMemoStopped: org.apache.spark.sql.SparkSession => Boolean =
    _.sparkContext.isStopped

  private def pruneDecision(termCol: DataFrame): Either[Seq[String], Array[Long]] = {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    def compute(): Either[Seq[String], Array[Long]] = {
      // limit BEFORE collect: the cap must bound the driver transfer
      // itself, not just the literal it builds — an over-cap vocabulary
      // collects maxTermPushdown+1 rows and never the full distinct set
      val terms = termCol.distinct().limit(maxTermPushdown + 1)
        .collect().map(_.getString(0)).toSeq
      if (terms.length <= maxTermPushdown) Left(terms)
      else
        // over the literal cap (a 10⁵+-sentence decontamination sweep):
        // fall back to a codegen'd bloom membership filter on the scan
        // side — no false negatives, so results are unchanged (the ~fpp
        // of non-matching postings that pass die in the downstream term
        // joins); the scan still sheds ~99% of non-vocabulary postings
        // before any shuffle. The bloom build is one distributed pass
        // over the vocabulary (driver holds only the bit array).
        Right(BloomPrune.buildSized(termCol, col("term")))
    }
    val canon = termCol.queryExecution.analyzed.canonicalized
    val memoizable = canon.collectLeaves().forall(_.isInstanceOf[LocalRelation])
    if (!memoizable) compute()
    else pruneMemo.synchronized {
      val session = termCol.sparkSession
      pruneMemo.indexWhere(e => (e._1 eq session) && e._2.sameResult(canon)) match {
        case i if i >= 0 =>
          val hit = pruneMemo.remove(i)
          pruneMemo.prepend(hit) // LRU bump
          pruneMemoHits += 1
          hit._3
        case _ =>
          val d = compute()
          // sweep entries pinned to STOPPED sessions before inserting —
          // without it a create-and-stop session loop pins (session,
          // plan, bloom) triples until LRU overflow (the
          // builtStagedIndexes sweep, applied here)
          pruneMemo.filterInPlace(e => !pruneMemoStopped(e._1))
          pruneMemo.prepend((session, canon, d))
          if (pruneMemo.length > pruneMemoMax) pruneMemo.remove(pruneMemoMax)
          d
      }
    }
  }

  /** Top-`k` documents per query by BM25. `queries` is a small
    * (queryIdCol, queryCol) table; query terms are deduplicated (the
    * short-query convention: query tf is not modeled). Output:
    * (queryIdCol, queryCol, docIdCol, n_terms_matched, score, rank). */
  def bm25TopK(
      docs: DataFrame,
      textCol: String,
      docIdCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryCol: String,
      k: Int): DataFrame = {
    val (postings, stats) = indexParts(docs, textCol, docIdCol)
    bm25FromParts(postings, stats, queries, queryIdCol, queryCol, k)
      .withColumnRenamed("doc_id", docIdCol)
  }

  /** Postings of a tokenized (doc_id, toks) projection: (doc_id, dl,
    * term, tf). dl rides the groupBy as a functionally-dependent key —
    * no second shuffle to re-join lengths. */
  private def postingsOf(toks: DataFrame): DataFrame =
    toks
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Corpus stats of a tokenized projection, kept as EXACT LONGS so
    * per-batch stats rows are additive (the index-append path sums
    * them; integer sums are order-free and exact below 2^53). */
  private def statsOf(toks: DataFrame): DataFrame =
    toks.agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("toks")).cast("long")).as("sum_dl"))

  /** Per-batch document frequency (term, df_partial) of a postings
    * batch. Batches are doc-disjoint (the append contract), so df is
    * ADDITIVE across batches — the same exact-integer argument as
    * `sum_dl` — which is what lets the serve path probe a
    * vocabulary-sized table instead of paying a second postings scan
    * per query batch (see [[bm25FromParts]]). */
  def dfOf(postings: DataFrame): DataFrame =
    postings.groupBy(col("term")).agg(count(lit(1)).as("df_partial"))

  /** The BM25 scorer over prepared parts: `postings` as from
    * [[postingsOf]] (one or many batches unioned — doc ids must be
    * unique across batches), `stats` as one or many additive
    * [[statsOf]] rows. This is the serve path of the persistent index
    * ([[bm25FromIndex]]) and the direct path ([[bm25TopK]]) — one
    * scorer, so index parity is structural.
    *
    * `dfRows` (optional): one or many additive [[dfOf]] tables. When
    * given, per-term df is an exact integer fold of the stored partials
    * — the SAME integer the postings scan would count, so scores are
    * bit-identical — and the plan touches postings ONCE per query batch
    * (the contribution join) instead of twice (df + contributions). */
  def bm25FromParts(
      postings: DataFrame,
      statsRows: DataFrame,
      queries: DataFrame,
      queryIdCol: String,
      queryCol: String,
      k: Int,
      dfRows: Option[DataFrame] = None): DataFrame = {
    // fold per-batch stats additively, then one cast to double each —
    // bit-identical to the single-corpus aggregate
    val stats = statsRows.agg(
      sum(col("n_docs")).cast("double").as("n_docs"),
      sum(col("sum_dl")).cast("double").as("sum_dl"))
    // document frequency per term — restricted to query terms before it
    // is broadcast, so the plan carries |query vocabulary| rows of df,
    // not the corpus vocabulary. With a stored df table the probe scans
    // a vocabulary-sized relation; without one it falls back to the
    // postings scan (identical integers either way).
    val qTerms = queries
      .select(col(queryIdCol).as("query_id"), col(queryCol).as("query"),
        explode(TextFunctions.tokens(col(queryCol))).as("term"))
      .distinct()
    val docFreq = dfRows match {
      case Some(df) => df
        .join(broadcast(qTerms.select(col("term")).distinct()), Seq("term"))
        .groupBy(col("term")).agg(sum(col("df_partial")).as("df"))
      case None => postings
        .join(broadcast(qTerms.select(col("term")).distinct()), Seq("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
    }
    val contrib = postings
      .join(broadcast(qTerms), Seq("term"))
      .join(broadcast(docFreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("tf_part",
        col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / (col("sum_dl") / col("n_docs")))))
      .withColumn("contrib_u", round(col("idf") * col("tf_part") * lit(1e6), 0).cast("long"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_u").desc, col("doc_id").asc)
    contrib
      .groupBy(col("query_id"), col("query"), col("doc_id"))
      .agg(sum(col("contrib_u")).as("score_u"), count(lit(1)).as("n_terms_matched"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(
        col("query_id").as(queryIdCol),
        col("query").as(queryCol),
        col("doc_id"),
        col("n_terms_matched"),
        round(col("score_u").cast("double") / lit(1e6), 6).as("score"),
        col("rank"))
  }

  /** Build a persistent BM25 index at `root`: the postings table and
    * the additive stats row land as committed batch dirs (the
    * [[graft.streaming.StateStore]] append layout — a torn write has
    * no `_SUCCESS` and is invisible; a replayed batch id overwrites
    * its own dir). This is the deployment shape: the corpus-side work
    * of [[bm25TopK]] (tokenize → explode → postings groupBy) runs
    * ONCE at build time; every query batch afterwards reads stored
    * postings. Postings are RANGE-partitioned and sorted by term so a
    * query-term probe prunes row groups on parquet min/max. */
  def buildIndex(docs: DataFrame, textCol: String, docIdCol: String, root: String): Unit =
    appendToIndex(docs, textCol, docIdCol, root, batchId = 0L)

  /** Append a batch of NEW documents (doc ids must not repeat across
    * batches) as batch `batchId`. Per-batch postings are independent —
    * a doc's (dl, term, tf) rows never span batches — and the stats
    * row is additive, so append == full rebuild exactly (locked by
    * RetrievalIndexSpec). Cost is batch-proportional: nothing
    * re-tokenizes, nothing retrains, df/avgdl re-derive at query time
    * from the unioned parts.
    *
    * Replay contract: a batch id whose postings/stats/df dirs ALL
    * committed is skipped (a legitimate replay carries the same data,
    * and an in-place rewrite would transiently delete committed files
    * under a concurrent reader that already listed the id); an id
    * invisible to readers (postings or stats missing) is completed
    * wholesale, which races nothing; an id that is visible but missing
    * only its df dir gets JUST the df write, derived from the committed
    * postings. */
  def appendToIndex(
      batch: DataFrame,
      textCol: String,
      docIdCol: String,
      root: String,
      batchId: Long): Unit = {
    import graft.streaming.StateStore
    val spark = batch.sparkSession
    // A FULLY-committed batch id is a completed append: skip the
    // rewrite. A replay only ever carries the same data, and rewriting
    // a committed dir in place would DELETE its files (overwrite =
    // delete-then-write) under any concurrent reader that already
    // listed the id — the race the id-intersection read cannot see.
    // Ids invisible to readers (postings or stats missing — the crash-
    // between-writes case) are completed wholesale, which races
    // nothing. The in-between case — postings+stats committed, df torn
    // — is VISIBLE (visibility is postings∩stats; df only shortcuts
    // cost), so the replay completes ONLY the df dir, derived from the
    // committed postings themselves.
    val visible = StateStore.committedBatchIds(spark, s"$root/postings")
      .intersect(StateStore.committedBatchIds(spark, s"$root/stats"))
      .contains(batchId)
    val dfDone = StateStore.committedBatchIds(spark, s"$root/df").contains(batchId)
    if (visible && !dfDone) {
      val stored = StateStore
        .readBatchDirsById(spark, s"$root/postings", Seq(batchId)).get
      StateStore.writeBatchDir(dfOf(stored), s"$root/df", batchId)
    } else if (!visible) {
      val (postings, stats) = indexParts(batch, textCol, docIdCol)
      val stored = postings
        // range-partitioned so FILES carry disjoint term ranges — a
        // k-term probe touches ~k row groups in the whole dir, not k
        // per file (which is what a hash repartition + sort degrades
        // to once k exceeds one file's row-group count)
        .repartitionByRange(col("term")).sortWithinPartitions(col("term"))
        // cache: the df fold below would otherwise re-run the whole
        // tokenize → postings aggregation a second time at build time
        .persist()
      StateStore.writeBatchDir(stored, s"$root/postings", batchId)
      StateStore.writeBatchDir(stats, s"$root/stats", batchId)
      // the additive per-term df table: batch VISIBILITY never depends
      // on it (a crash before this write leaves postings+stats
      // committed — the batch serves with postings-derived df, same
      // integers), but a complete batch serves df from this
      // vocabulary-sized table instead of a second postings pass
      StateStore.writeBatchDir(dfOf(stored), s"$root/df", batchId)
      stored.unpersist()
    }
  }

  /** Compact the BM25 index's accumulated batch dirs (a long-lived
    * [[graft.streaming.StreamingIndex]] lands one dir per micro-batch)
    * into one dir per table, re-clustering postings by term so the
    * serve path's row-group pruning survives the merge. Only the
    * FULLY-VISIBLE prefix compacts (ids in the postings∩stats∩df
    * intersection — a compacted dir cannot be subset-read, so a
    * half-committed batch must stay in its own dirs until its replay
    * completes it); absorbed ids stay committed via the manifest, so
    * replays still skip. Serve results are identical by construction
    * (same rows, one dir) — locked by RetrievalIndexSpec.
    *
    * `sweepGraceMs`: wall-clock floor under the one-generation sweep
    * (see [[graft.streaming.StateStore.compactBatchDirs]]) — set ≥ the
    * longest concurrent ad-hoc read when the index serves while being
    * compacted (the in-stream `compactEvery` cadence defaults it to
    * [[graft.streaming.StateStore.defaultInStreamGraceMs]]). */
  def compactIndex(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      sweepGraceMs: Long = 0L): Unit = {
    import graft.streaming.StateStore
    val visible = StateStore.committedBatchIds(spark, s"$root/postings")
      .intersect(StateStore.committedBatchIds(spark, s"$root/stats"))
      .intersect(StateStore.committedBatchIds(spark, s"$root/df"))
      // the NEWEST batch never compacts: it may sit inside a replay
      // window only the stream checkpoint knows about, and its replay
      // must be able to skip-check / subset-read its own dirs
      .sorted.dropRight(1)
    if (visible.length >= 2) {
      // losing the postings lease to a concurrent compactor skips the
      // whole generation — the loser must not compact stats/df under
      // the winner's feet (each sub-table has its own lease)
      val won = StateStore.compactBatchDirs(spark, s"$root/postings", visible,
        df => df.repartitionByRange(col("term")).sortWithinPartitions(col("term")),
        sweepGraceMs)
      if (won) {
        StateStore.compactBatchDirs(spark, s"$root/stats", visible,
          identity, sweepGraceMs)
        StateStore.compactBatchDirs(spark, s"$root/df", visible,
          // per-term partials stay additive; fold them so the df table
          // shrinks to one row per term
          df => df.groupBy(col("term")).agg(sum(col("df_partial")).as("df_partial")),
          sweepGraceMs)
      }
    }
  }

  /** Compact the positional index's batch dirs (the
    * [[graft.streaming.StreamingDecontam]] ingestion lands one per
    * micro-batch), term-re-clustered. Single-table, so every committed
    * id is fully visible — but the NEWEST batch still never compacts:
    * StreamingDecontam's replay reads its own batch dir by id
    * (subset-read), which must keep working across a restart. */
  def compactPositionalIndex(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      sweepGraceMs: Long = 0L): Unit = {
    import graft.streaming.StateStore
    val ids = StateStore.committedBatchIds(spark, s"$root/postings")
      .sorted.dropRight(1)
    if (ids.length >= 2)
      StateStore.compactBatchDirs(spark, s"$root/postings", ids,
        df => df.repartitionByRange(col("term"))
          .sortWithinPartitions(col("term"), col("doc_id"), col("pos")),
        sweepGraceMs)
  }

  /** One batch's index contribution: (postings, additive stats row) —
    * what [[appendToIndex]] persists and [[bm25FromParts]] consumes
    * (unioned across batches). Public so the split-invariance gate
    * (d69) and any external index store can use the same parts. */
  def indexParts(
      batch: DataFrame,
      textCol: String,
      docIdCol: String): (DataFrame, DataFrame) = {
    val toks = batch.select(
      col(docIdCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
    (postingsOf(toks), statsOf(toks))
  }

  /** Serve BM25 from a stored index: same scorer as [[bm25TopK]]
    * ([[bm25FromParts]]), postings/stats from the committed batch
    * dirs. A batch counts only when BOTH its postings and its stats
    * dirs committed (id intersection) — a crash between the two
    * writes of [[appendToIndex]] leaves that batch wholly invisible
    * (never a half-applied view where the postings score against
    * stats that don't include them), and the replay overwrites both
    * sides. Throws if no batch has committed at `root`.
    *
    * df serving: when every visible batch also committed its df dir,
    * per-term df probes the vocabulary-sized df table (one postings
    * pass per query batch instead of two); any batch whose df write was
    * torn demotes the WHOLE read to postings-derived df — correctness
    * never depends on the df table, only cost does (a partial df fold
    * would undercount df and silently inflate idf).
    *
    * NOT fully lazy: construction runs the [[pruneToTerms]] vocabulary
    * collect (one small Spark job) before returning. */
  def bm25FromIndex(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      queries: DataFrame,
      queryIdCol: String,
      queryCol: String,
      k: Int): DataFrame = {
    import graft.streaming.StateStore
    val ids = StateStore.committedBatchIds(spark, s"$root/postings")
      .intersect(StateStore.committedBatchIds(spark, s"$root/stats"))
    def part(name: String) = StateStore
      .readBatchDirsById(spark, s"$root/$name", ids)
      .getOrElse(throw new IllegalStateException(
        s"no fully-committed index batch at $root — run buildIndex first"))
    val dfIds = StateStore.committedBatchIds(spark, s"$root/df")
    val dfRows =
      if (ids.nonEmpty && ids.forall(dfIds.contains))
        StateStore.readBatchDirsById(spark, s"$root/df", ids)
      else None
    // row-group pruning: plant the query vocabulary as a scan literal —
    // the term-clustered layout only pays off if the filter REACHES the
    // parquet scan, which the broadcast join alone never does
    val qv = queries.select(explode(TextFunctions.tokens(col(queryCol))).as("term"))
    bm25FromParts(pruneToTerms(part("postings"), qv), part("stats"),
      queries, queryIdCol, queryCol, k, dfRows)
  }

  /** Exact phrase search over POSITIONAL postings: for each phrase,
    * every document containing its tokens consecutively, with the
    * occurrence count and first position. The retrieval-grade form of
    * the d19/d48 contamination audits — "which training docs contain
    * this eval sentence verbatim" — and the capability BM25's
    * bag-of-words scoring cannot express.
    *
    * Plan: one positional postings table (doc, term, pos — posexplode,
    * no aggregation needed), phrase terms with their offsets broadcast
    * against it, and the classic anchor trick: a posting for offset-j
    * term at position p witnesses a candidate occurrence anchored at
    * p − j, so an occurrence is an anchor where ALL |phrase| offsets
    * are witnessed — one partial-aggregated groupBy(phrase, doc,
    * anchor) HAVING count(DISTINCT offset) = |phrase|. Only postings
    * of phrase terms are touched (the inverted-index discipline);
    * repeated tokens inside a phrase are handled by counting DISTINCT
    * offsets, and anchors < 0 are dropped. All-integer — bit-exact by
    * construction. Output: (phraseIdCol, phraseCol, docIdCol,
    * n_occurrences, first_pos) with 0-based positions — the doc column
    * keeps the caller's name, the bm25TopK/jaccardTopK convention. */
  def phraseSearch(
      docs: DataFrame,
      textCol: String,
      docIdCol: String,
      phrases: DataFrame,
      phraseIdCol: String,
      phraseCol: String,
      minOccurrences: Int = 1): DataFrame =
    phraseSearchFromPostings(
      positionalIndexParts(docs, textCol, docIdCol),
      phrases, phraseIdCol, phraseCol, docIdCol, minOccurrences)

  /** The phrase scorer over prepared POSITIONAL postings (doc_id, pos,
    * term) — one or many [[positionalIndexParts]] batches unioned (doc
    * ids must be unique across batches; a doc's positions never span
    * batches, so union == whole-corpus posexplode row-for-row and
    * split-invariance is structural). Serve path of the persistent
    * positional index ([[phraseSearchFromIndex]]) and the direct path
    * ([[phraseSearch]]) — one scorer, same anchor trick. */
  def phraseSearchFromPostings(
      postings: DataFrame,
      phrases: DataFrame,
      phraseIdCol: String,
      phraseCol: String,
      docIdCol: String,
      minOccurrences: Int = 1): DataFrame = {
    val pTerms = phrases
      .select(col(phraseIdCol).as("phrase_id"), col(phraseCol).as("phrase"),
        posexplode(TextFunctions.tokens(col(phraseCol))).as(Seq("off", "pterm")))
    val pLen = pTerms.groupBy(col("phrase_id").as("pid"))
      .agg(countDistinct(col("off")).as("p_len"))
    val pSide = pTerms.join(broadcast(pLen), col("phrase_id") === col("pid")).drop("pid")
    postings
      .join(broadcast(pSide), col("term") === col("pterm"))
      .select(col("phrase_id"), col("phrase"), col("p_len"), col("doc_id"),
        col("off"), (col("pos") - col("off")).cast("long").as("anchor"))
      .filter(col("anchor") >= 0)
      .groupBy(col("phrase_id"), col("phrase"), col("p_len"), col("doc_id"), col("anchor"))
      .agg(countDistinct(col("off")).as("n_off"))
      .filter(col("n_off") === col("p_len"))
      .groupBy(col("phrase_id"), col("phrase"), col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"), min(col("anchor")).as("first_pos"))
      .filter(col("n_occurrences") >= minOccurrences)
      .select(
        col("phrase_id").as(phraseIdCol),
        col("phrase").as(phraseCol),
        col("doc_id").as(docIdCol),
        col("n_occurrences"),
        col("first_pos"))
  }

  // ---- persistent positional index (phrase search + snippets) -----------

  /** One batch's positional-index contribution: POSITIONAL postings
    * (doc_id, pos, term) — a pure posexplode, no aggregation, so the
    * stored rows ARE the tokenized corpus (each doc is exactly
    * reconstructible from its rows, which is what lets
    * [[snippetsFromPostings]] assemble context windows without a
    * separate forward index). Public so the split-invariance gate (d75/
    * d76) and any external store can use the same parts. */
  def positionalIndexParts(
      batch: DataFrame,
      textCol: String,
      docIdCol: String): DataFrame =
    batch.select(col(docIdCol).as("doc_id"),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "term")))

  /** Build a persistent POSITIONAL index at `root` — the write-once
    * complement of [[buildIndex]] for the phrase/decontamination
    * workload: [[phraseSearch]] pays the corpus tokenize on EVERY call,
    * while a decontamination sweep audits the same corpus against
    * thousands of eval sentences repeatedly; storing the positional
    * postings once makes each audit a probe of phrase-term postings
    * only. Postings are term-clustered (range-partition + sort) so
    * parquet min/max prunes row groups to the phrase vocabulary. */
  def buildPositionalIndex(
      docs: DataFrame, textCol: String, docIdCol: String, root: String): Unit =
    appendToPositionalIndex(docs, textCol, docIdCol, root, batchId = 0L)

  /** Append a batch of NEW documents (doc ids must not repeat across
    * batches) to the positional index as batch `batchId`. Positional
    * postings are per-doc rows, so doc-disjoint batches make append ==
    * full rebuild EXACTLY (no cross-batch state at all — not even an
    * additive stats row). Same replay contract as [[appendToIndex]]:
    * a fully-committed id is skipped (rewriting a committed dir in
    * place would transiently delete its files under a concurrent
    * reader), a torn dir has no `_SUCCESS` and is invisible. */
  def appendToPositionalIndex(
      batch: DataFrame,
      textCol: String,
      docIdCol: String,
      root: String,
      batchId: Long): Unit = {
    import graft.streaming.StateStore
    val spark = batch.sparkSession
    val done = StateStore.committedBatchIds(spark, s"$root/postings")
    if (!done.contains(batchId)) {
      StateStore.writeBatchDir(
        positionalIndexParts(batch, textCol, docIdCol)
          .repartitionByRange(col("term"))
          .sortWithinPartitions(col("term"), col("doc_id"), col("pos")),
        s"$root/postings", batchId)
    }
  }

  private def positionalPostingsAt(
      spark: org.apache.spark.sql.SparkSession, root: String): DataFrame = {
    import graft.streaming.StateStore
    StateStore.readCommittedBatchDirs(spark, s"$root/postings")
      .getOrElse(throw new IllegalStateException(
        s"no committed positional-index batch at $root — run " +
          "buildPositionalIndex first"))
  }

  /** [[phraseSearch]] served from a stored positional index — identical
    * output (same scorer over the same postings rows), corpus-tokenize
    * cost paid once at build time instead of per audit. NOT fully lazy:
    * construction runs the [[pruneToTerms]] vocabulary collect. */
  def phraseSearchFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      phrases: DataFrame,
      phraseIdCol: String,
      phraseCol: String,
      minOccurrences: Int = 1): DataFrame = {
    // row-group pruning: only phrase-term postings participate in the
    // anchor fold, so the scan can be cut to the eval vocabulary as a
    // literal predicate (NOT valid for snippetsFromIndex, whose window
    // reassembly needs every term of the hit docs)
    val pv = phrases.select(explode(TextFunctions.tokens(col(phraseCol))).as("term"))
    phraseSearchFromPostings(pruneToTerms(positionalPostingsAt(spark, root), pv),
      phrases, phraseIdCol, phraseCol, "doc_id", minOccurrences)
  }

  // ---- anchor-fingerprint decontamination probe --------------------------
  //
  // The OVER-CAP decontamination regime (10⁵+ eval sentences): the
  // phrase vocabulary is then a near-uniform sample of the corpus
  // vocabulary, so the term-literal cap is blown and even the bloom
  // fallback sheds only postings — every row group of the positional
  // index still survives (PERF.md measured the 100k-sentence stored
  // path at parity with the direct scan for exactly this reason).
  // The anchor probe restores bounded-probe behavior at ANY eval-list
  // size: each doc's k-token windows are fingerprinted to 64-bit fps
  // and stored fp-CLUSTERED (the StreamingDedup layout applied to
  // decontamination), each eval sentence contributes ONE fp (its first
  // k-gram), and candidate (phrase, doc) pairs come from an exact fp
  // probe of that narrow (fp, doc_id) table. A doc containing a phrase
  // necessarily contains the phrase's first k-gram, so the probe has NO
  // false negatives; fp collisions and partial matches die in the exact
  // positional verify, which now runs over the HIT phrases' vocabulary
  // only — back under the literal cap whenever actual contamination is
  // sparse, which is the operating point of a decontamination sweep.

  /** Default anchor window: long enough that a random k-gram is
    * near-unique in any natural corpus, short enough that most eval
    * sentences reach it (shorter phrases route through the classic
    * literal/bloom path). */
  val defaultAnchorK = 4

  /** fp of the k-token window starting at 1-based `from`: xxhash64 over
    * the tokens joined on \u0001 (cannot appear inside a token). The
    * SAME expression fingerprints doc windows and eval first-k-grams —
    * the probe is an exact equality join in one fp space. */
  private def windowFp(toks: Column, from: Column, k: Int): Column =
    xxhash64(concat_ws("\u0001", slice(toks, from, lit(k))))

  /** One batch's anchor contribution: the DISTINCT (fp, doc_id) pairs
    * of every k-token window of every doc (docs shorter than k tokens
    * contribute nothing — they cannot contain a ≥k-token phrase). */
  def anchorIndexParts(
      batch: DataFrame, textCol: String, docIdCol: String, k: Int): DataFrame = {
    require(k >= 1, s"anchor window must be >= 1 token, got $k")
    batch
      .select(col(docIdCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("toks")) - (k - 1)),
          i => windowFp(col("toks"), i, k)))).as("fp"))
  }

  private def anchorKMarker(root: String) =
    new org.apache.hadoop.fs.Path(s"$root/anchors", "_anchor_k")

  private def storedAnchorK(
      spark: org.apache.spark.sql.SparkSession, root: String): Option[Int] = {
    val p = anchorKMarker(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt)
      finally in.close()
    }
  }

  /** Append a batch of NEW documents' anchor fingerprints under
    * `root/anchors` (same committed-batch-dir contract as
    * [[appendToPositionalIndex]]; call both per batch to serve the
    * anchor probe). Dirs are fp-clustered — files range-disjoint in fp
    * — so the probe's literal pushdown row-group-prunes. `k` is part of
    * the stored layout: the first append records it and later appends
    * must match (the probe reads it back, so build and probe can never
    * disagree silently). */
  def appendToAnchorIndex(
      batch: DataFrame,
      textCol: String,
      docIdCol: String,
      root: String,
      batchId: Long,
      k: Int = defaultAnchorK): Unit = {
    import graft.streaming.StateStore
    val spark = batch.sparkSession
    storedAnchorK(spark, root) match {
      case Some(k0) => require(k0 == k,
        s"anchor index at $root was built with k=$k0, append requested k=$k")
      case None =>
        val p = anchorKMarker(root)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        val out = fs.create(p, true)
        try out.write(k.toString.getBytes("UTF-8")) finally out.close()
    }
    val done = StateStore.committedBatchIds(spark, s"$root/anchors")
    if (!done.contains(batchId)) {
      StateStore.writeBatchDir(
        anchorIndexParts(batch, textCol, docIdCol, k)
          .repartitionByRange(col("fp")).sortWithinPartitions(col("fp"), col("doc_id")),
        s"$root/anchors", batchId)
    }
  }

  /** Compact the anchor table's batch dirs, fp-re-clustered (never the
    * newest id — the replay-window rule). Grace as [[compactIndex]]. */
  def compactAnchorIndex(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      sweepGraceMs: Long = 0L): Unit = {
    import graft.streaming.StateStore
    val ids = StateStore.committedBatchIds(spark, s"$root/anchors")
      .sorted.dropRight(1)
    if (ids.length >= 2)
      StateStore.compactBatchDirs(spark, s"$root/anchors", ids,
        df => df.repartitionByRange(col("fp"))
          .sortWithinPartitions(col("fp"), col("doc_id")),
        sweepGraceMs)
  }

  /** Candidate-pair cap for [[phraseSearchViaAnchors]]' local
    * materialization: at or under it the candidate set becomes driver
    * literals; over it the probe stays distributed (served from the
    * one-scan checkpoint). `var` is a spec hook only. */
  private[graft] var anchorCandCap = 100000

  /** How an eval list splits against the anchor index's stored k at
    * `root`: (n_phrases, n_short, short_fraction), where short phrases
    * (< k tokens) route through the unanchored classic path inside
    * [[phraseSearchViaAnchors]] (its k-gram-floor contract). One
    * aggregate over the eval list — cheap enough to run per audit and
    * alert when the list composition defeats the probe. */
  def anchorRoutingStats(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      phrases: DataFrame,
      phraseCol: String): (Long, Long, Double) = {
    val k = storedAnchorK(spark, root).getOrElse(throw new IllegalStateException(
      s"no anchor index at $root"))
    val r = phrases
      .agg(
        count(lit(1)).as("n"),
        sum(when(size(TextFunctions.tokens(col(phraseCol))) < k, 1L).otherwise(0L))
          .as("n_short"))
      .head()
    val (n, nShort) = (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    (n, nShort, if (n == 0) 0.0 else nShort.toDouble / n)
  }

  /** The phrase audit served through the ANCHOR probe — output
    * identical to [[phraseSearchFromIndex]] (same exact scorer decides
    * every emitted row; the anchors only pre-filter), cost bounded by
    * the eval-list size and the TRUE contamination instead of the eval
    * vocabulary's row-group coverage. Requires both `root/postings`
    * (the verify side) and `root/anchors` ([[appendToAnchorIndex]]).
    * CONTRACT — the k-gram floor: phrases shorter than the stored k
    * (in TOKENS, [[TextFunctions.tokens]]) route through
    * [[phraseSearchFromIndex]]'s literal/bloom path — correctness never
    * depends on the split, only cost does. An eval list DOMINATED by
    * short phrases therefore quietly loses the anchor win (the probe
    * bounds only the long-phrase leg); deployments should check
    * [[anchorRoutingStats]] against their eval list and either lower k
    * at build time or accept the classic-path cost for the short
    * fraction. NOT fully lazy: construction collects the bounded
    * eval-fp set and the hit-phrase vocabulary. */
  def phraseSearchViaAnchors(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      phrases: DataFrame,
      phraseIdCol: String,
      phraseCol: String,
      minOccurrences: Int = 1): DataFrame = {
    import graft.streaming.StateStore
    val k = storedAnchorK(spark, root).getOrElse(throw new IllegalStateException(
      s"no anchor index at $root — run appendToAnchorIndex alongside the " +
        "positional appends"))
    val anchors = StateStore.readCommittedBatchDirs(spark, s"$root/anchors")
      .getOrElse(throw new IllegalStateException(
        s"no committed anchor batch at $root"))
    val ph = phrases.select(
      col(phraseIdCol).as("phrase_id"), col(phraseCol).as("phrase"),
      TextFunctions.tokens(col(phraseCol)).as("ptoks"))
    val longPh = ph.filter(size(col("ptoks")) >= k)
    val shortPh = ph.filter(size(col("ptoks")) < k)
      .select(col("phrase_id").as(phraseIdCol), col("phrase").as(phraseCol))
    // ONE fp per eval sentence: its first k-gram, in the stored fp space
    val evalFps = longPh
      .select(col("phrase_id"), windowFp(col("ptoks"), lit(1), k).as("fp"))
    // ONE bounded probe over the eval list answers BOTH construction
    // questions — the distinct long-phrase fp set (for the literal
    // pushdown below) and whether any short phrase exists (for the
    // classic-path union at the end). Separately those were two driver
    // jobs per construction (the fp distinct-collect and
    // shortPh.isEmpty); an over-cap eval list falls back to the old
    // per-question actions. fp is null exactly for short phrases.
    val phProbe: Option[(Seq[Long], Boolean)] = {
      val rows = ph
        .select(when(size(col("ptoks")) >= k, windowFp(col("ptoks"), lit(1), k)).as("fp"))
        .limit(maxTermPushdown + 1).collect()
      if (rows.length > maxTermPushdown) None
      else Some((
        rows.filterNot(_.isNullAt(0)).map(_.getLong(0)).distinct.toSeq,
        rows.exists(_.isNullAt(0))))
    }
    // density-gated literal pushdown over the fp-clustered anchor dirs
    // (the StreamingDedup suspect trick): bounded collect, never the
    // full set past the cap, and — past one chunk — engaged only while
    // the fp count stays at or under the estimated row-group count (a
    // multi-chunk literal pays per-row InSet probes on every SURVIVING
    // row group; the measured 6× over-density backfire). Over the cap
    // or over-density the table scans UNPRUNED — no bloom pre-filter
    // here: the candidate join below is broadcast (there is no shuffle
    // to protect), so the hash probe itself rejects exactly the rows a
    // bloom would shed, and the bloom build would cost two extra driver
    // jobs per construction. The scan is a narrow (fp, doc_id) long
    // table either way — the point of anchoring is that ITS size, not
    // the eval list's, bounds the pass.
    val fpVals = phProbe match {
      case Some((fps, _)) => Some(fps)
      case None =>
        val rows = evalFps.select(col("fp")).distinct()
          .limit(maxTermPushdown + 1).collect()
        if (rows.length <= maxTermPushdown) Some(rows.map(_.getLong(0)).toSeq)
        else None
    }
    val probedAnchors = fpVals match {
      case Some(fps) if fps.isEmpty => anchors.limit(0) // every phrase is short
      case Some(fps) if fps.length <= ScanPrune.eqChunk ||
          fps.length <= ScanPrune.estimatedRowGroups(anchors) =>
        ScanPrune.ensureEqPushdown(spark)
        anchors.filter(ScanPrune.inLiteral(col("fp"), fps))
      case _ => anchors
    }
    // exact-equality candidates; fp collisions die in the verify below
    val candidates = probedAnchors
      .join(broadcast(evalFps), Seq("fp"))
      .select(col("phrase_id"), col("doc_id")).distinct()
    // materialize the candidate set ONCE — the set feeds THREE
    // downstream consumers (the hit-phrase restriction, pruneToTerms'
    // eager vocabulary collect, and the candidate-doc semi-join), and a
    // lazy frame would re-run the whole anchor scan once per consumer.
    // localCheckpoint (eager, MEMORY_AND_DISK, lineage truncated) runs
    // the single anchor scan up front; the cap probe below and every
    // consumer — local literals under the cap, the distributed frames
    // over it — read the materialized blocks, and the ContextCleaner
    // reclaims them once the returned plan is dropped (no caller-side
    // unpersist contract). The checkpoint costs the under-cap path
    // nothing it wasn't paying: fewer than candCap+1 rows exist there,
    // so the probe's limit-collect had to scan every partition anyway.
    // CLUSTER CAVEAT: localCheckpoint truncates lineage, so the over-cap
    // distributed frames returned below are NOT recomputable — if an
    // executor holding checkpoint blocks is lost/decommissioned before
    // the caller consumes the plan, the query fails with missing-block
    // errors rather than re-scanning. On local[k] (this deployment) the
    // blocks live in the one JVM and the trade is free; a remote-executor
    // deployment that needs loss-resilience should swap this line for
    // cache() + a caller-side unpersist contract (recomputable, one
    // anchor re-scan per lost block) and accept the re-scan cost.
    val candMat = candidates.localCheckpoint(true)
    // candidates are true hits + the fp collision rate, small by the
    // decontamination premise; over the cap the distributed frames
    // stand — correct, served from the checkpoint blocks. `var` is a
    // spec hook so the over-cap branch is testable on small corpora.
    val candCap = anchorCandCap
    val candLocal = {
      val rows = candMat.limit(candCap + 1).collect()
      if (rows.length <= candCap)
        Some(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq)
      else None
    }
    import org.apache.spark.sql.Encoders
    val candPhraseIds = candLocal match {
      case Some(rows) => spark
        .createDataset(rows.map(_._1).distinct)(Encoders.scalaLong).toDF("phrase_id")
      case None => candMat.select(col("phrase_id")).distinct()
    }
    val candDocs = candLocal match {
      case Some(rows) => spark
        .createDataset(rows.map(_._2).distinct)(Encoders.scalaLong).toDF("doc_id")
      case None => candMat.select(col("doc_id")).distinct()
    }
    // verify ONLY the hit phrases over ONLY the candidate docs: the
    // vocabulary collect inside pruneToTerms now sees the contaminated
    // subset, not the eval list — back under the literal cap whenever
    // contamination is sparse
    val hitPh = longPh
      .join(broadcast(candPhraseIds), Seq("phrase_id"), "left_semi")
      .select(col("phrase_id").as(phraseIdCol), col("phrase").as(phraseCol))
    val vTerms = hitPh.select(explode(TextFunctions.tokens(col(phraseCol))).as("term"))
    val vPostings = pruneToTerms(positionalPostingsAt(spark, root), vTerms)
      .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
    val longHits = phraseSearchFromPostings(
      vPostings, hitPh, phraseIdCol, phraseCol, "doc_id", minOccurrences)
    val anyShort = phProbe.map(_._2).getOrElse(!shortPh.isEmpty)
    if (!anyShort) longHits
    else longHits.unionByName(phraseSearchFromIndex(
      spark, root, shortPh, phraseIdCol, phraseCol, minOccurrences))
  }

  /** [[snippets]] served from POSITIONAL postings: the context window is
    * REASSEMBLED from the stored (doc_id, pos, term) rows — tokens with
    * pos in [snippet_start, first_pos + p_len + window), ordered by pos
    * — so neither the audit nor the snippet assembly re-tokenizes the
    * corpus. Bit-identical to [[snippets]]: the postings of a doc ARE
    * its token sequence, and the position-range filter is exactly the
    * direct path's clamped `slice`. The hit⋈postings join is a plain
    * equi-join on doc_id deliberately left to AQE (the hit table is
    * |phrases|·|matched docs| — unbounded, the [[snippets]] rule).
    *
    * Cost shape (measured, PERF.md round 9): the hit-finding anchor
    * fold is prunable to the phrase vocabulary (the stored path's
    * [[snippetsFromIndex]] does), while the window-reassembly join
    * genuinely needs every term of the hit docs and stays unpruned.
    * With that split the stored path beats the direct in-row slice
    * (4.5 s vs 5.7 s at 2M docs) besides never re-tokenizing. */
  def snippetsFromPostings(
      postings: DataFrame,
      phrases: DataFrame,
      phraseIdCol: String,
      phraseCol: String,
      docIdCol: String,
      window: Int): DataFrame =
    snippetsFromParts(postings, postings, phrases, phraseIdCol, phraseCol,
      docIdCol, window)

  /** The snippet assembly split by postings ROLE: the hit-finding
    * anchor fold touches only phrase-term postings (prunable), the
    * window reassembly needs every term of the hit docs (never
    * prunable) — so the stored-index path can pass a term-pruned scan
    * for the first and the full postings for the second. */
  private def snippetsFromParts(
      hitPostings: DataFrame,
      allPostings: DataFrame,
      phrases: DataFrame,
      phraseIdCol: String,
      phraseCol: String,
      docIdCol: String,
      window: Int): DataFrame = {
    val postings = allPostings
    val hits = phraseSearchFromPostings(
        hitPostings, phrases, phraseIdCol, phraseCol, "doc_id")
      .select(col(phraseIdCol).as("phrase_id"), col(phraseCol).as("phrase"),
        col("doc_id"), col("first_pos"))
      .withColumn("p_len", size(TextFunctions.tokens(col("phrase"))).cast("long"))
      .withColumn("snippet_start", greatest(col("first_pos") - window, lit(0L)))
    postings
      .join(hits, Seq("doc_id"))
      .filter(col("pos") >= col("snippet_start") &&
        col("pos") < col("first_pos") + col("p_len") + window)
      .groupBy(col("phrase_id"), col("phrase"), col("doc_id"),
        col("first_pos"), col("snippet_start"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("term")))),
          x => x.getField("term")), " ").as("snippet"))
      .select(
        col("phrase_id").as(phraseIdCol),
        col("phrase").as(phraseCol),
        col("doc_id").as(docIdCol),
        col("first_pos"),
        col("snippet_start"),
        col("snippet"))
  }

  /** [[snippets]] served from a stored positional index. The
    * hit-finding scan is pruned to the phrase vocabulary (the
    * [[phraseSearchFromIndex]] pushdown); only the window-reassembly
    * join reads the full postings. NOT fully lazy: construction runs
    * the [[pruneToTerms]] vocabulary collect. */
  def snippetsFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      phrases: DataFrame,
      phraseIdCol: String,
      phraseCol: String,
      window: Int): DataFrame = {
    val all = positionalPostingsAt(spark, root)
    val pv = phrases.select(explode(TextFunctions.tokens(col(phraseCol))).as("term"))
    snippetsFromParts(pruneToTerms(all, pv), all,
      phrases, phraseIdCol, phraseCol, "doc_id", window)
  }

  /** Context snippets around each document's FIRST occurrence of a
    * phrase: `window` tokens either side of the [[phraseSearch]] match,
    * clamped to the document bounds — the context-window assembly step
    * a RAG / decontamination-triage pipeline runs after the exact-match
    * audit ("show me the hit in context"). One extra broadcast join of
    * the (phrase, doc, first_pos) hit table back to the tokenized docs
    * and an in-row `slice` — no further shuffle; all offsets are exact
    * integers so the snippet strings are bit-stable. Output: (phraseIdCol,
    * phraseCol, docIdCol, first_pos, snippet_start, snippet). */
  def snippets(
      docs: DataFrame,
      textCol: String,
      docIdCol: String,
      phrases: DataFrame,
      phraseIdCol: String,
      phraseCol: String,
      window: Int): DataFrame = {
    val hits = phraseSearch(docs, textCol, docIdCol, phrases, phraseIdCol, phraseCol)
      .select(col(phraseIdCol).as("phrase_id"), col(phraseCol).as("phrase"),
        col(docIdCol).as("doc_id"), col("first_pos"))
      .withColumn("p_len", size(TextFunctions.tokens(col("phrase"))).cast("long"))
    val toks = docs.select(
      col(docIdCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
    // NOT broadcast: |hits| is |phrases|·|matched docs| — a frequent
    // single-term phrase over a large corpus matches millions of docs,
    // so the join strategy is left to AQE's runtime sizes
    toks
      .join(hits, Seq("doc_id"))
      .withColumn("snippet_start", greatest(col("first_pos") - window, lit(0L)))
      .withColumn("snippet", array_join(
        slice(col("toks"),
          (col("snippet_start") + 1).cast("int"),
          (col("first_pos") - col("snippet_start") + col("p_len") + window).cast("int")),
        " "))
      .select(
        col("phrase_id").as(phraseIdCol),
        col("phrase").as(phraseCol),
        col("doc_id").as(docIdCol),
        col("first_pos"),
        col("snippet_start"),
        col("snippet"))
  }

  /** Jaccard term-overlap top-`k`: ranks documents by
    * |q ∩ d| / |q ∪ d| over DISTINCT tokens — the set-similarity
    * ranker that complements BM25 (no tf, no length prior; pure
    * vocabulary overlap). Same inverted-index probe shape as
    * [[bm25TopK]]: only docs sharing a query term are scored. The
    * score is one float division of exact integer set sizes — bit-
    * stable — with a doc-id tie-break on the rank. */
  def jaccardTopK(
      docs: DataFrame,
      textCol: String,
      docIdCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryCol: String,
      k: Int): DataFrame = {
    val dterm = docs
      .select(col(docIdCol).as("doc_id"),
        array_distinct(TextFunctions.tokens(col(textCol))).as("dtoks"))
      .select(col("doc_id"), size(col("dtoks")).cast("long").as("dn"),
        explode(col("dtoks")).as("term"))
    val qtBase = queries
      .select(col(queryIdCol).as("query_id"), col(queryCol).as("query"),
        explode(array_distinct(TextFunctions.tokens(col(queryCol)))).as("term"))
    val qt = qtBase
      .join(broadcast(qtBase.groupBy(col("query_id").as("qid"))
        .agg(count(lit(1)).as("nq"))), col("query_id") === col("qid"))
      .drop("qid")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("jaccard").desc, col("doc_id").asc)
    dterm
      .join(broadcast(qt), Seq("term"))
      .groupBy(col("query_id"), col("query"), col("doc_id"), col("dn"), col("nq"))
      .agg(count(lit(1)).as("nm"))
      .withColumn("jaccard",
        col("nm").cast("double") / (col("dn") + col("nq") - col("nm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(
        col("query_id").as(queryIdCol),
        col("query").as(queryCol),
        col("doc_id").as(docIdCol),
        round(col("jaccard"), 6).as("jaccard"),
        col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttner 2009, public
    * paper): fuses any number of per-query rankings into one by
    * score(d) = Σ_lists 1/(c + rank_list(d)) — the standard hybrid-
    * search combiner (lexical BM25 + a second signal) precisely
    * because it needs no score calibration, only ranks. Each input is
    * a (query_id, doc_id, rank) table; `c = 60` is the paper's
    * constant. Contribution 1/(c+rank) is integerized to micro-units
    * (a pure function of the rank — both engines compute the same
    * table), the per-doc fold is an integer sum — order-free — and
    * the fused rank breaks score ties by doc id. Scale shape: a union
    * of already-top-k tables (≤ k·|lists| rows per query), one
    * partial-aggregated groupBy, one WindowGroupLimit top-k. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val normalized = rankings.map(_.select(
      col("query_id"), col("doc_id"),
      round(lit(1e6) / (lit(c.toDouble) + col("rank").cast("double")), 0)
        .cast("long").as("contrib_u")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_u").desc, col("doc_id").asc)
    normalized.reduce(_.unionByName(_))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib_u")).as("score_u"), count(lit(1)).as("n_lists"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(
        col("query_id"), col("doc_id"), col("n_lists"),
        round(col("score_u").cast("double") / lit(1e6), 6).as("rrf_score"),
        col("rank"))
  }

  /** Ranking-quality metrics at cutoff `k` for any ranked retrieval
    * output (BM25, ANN, hybrid — anything emitting (query_id, doc_id,
    * rank)): per query, the relevant-set size, hits@k, precision@k,
    * recall@k, reciprocal rank of the first relevant hit (0 when none
    * — the MRR convention), and nDCG@k. The offline eval loop a
    * retrieval deployment runs against its qrels before shipping a
    * ranker change — the evaluation complement of the d62/d64
    * candidate-recall gates.
    *
    * Scale shape: one broadcast-joinable qrels lookup (qrels are
    * labeled pairs — small by construction), one partial-aggregated
    * per-query fold, and an IDCG lookup joined from a k-row positions
    * table; nothing touches the corpus.
    *
    * Bit-exactness: each position's DCG gain 1/log2(rank+1) is rounded
    * to integer micro-units (ln at round-6 micro granularity is the
    * established d12 contract) and DCG/IDCG are integer sums —
    * order-free — with one float division per ratio at the end.
    * Queries with an empty relevant set emit NULL recall/nDCG (0/0 has
    * no honest value) and rr = 0. A query with qrels but NO ranked
    * rows at all (the ranker returned nothing) emits hits=0 /
    * precision=0 / recall=0 / rr=0 / nDCG=0 rather than vanishing —
    * dropping it would inflate averages exactly when the ranker fails
    * hardest. */
  def rankingMetrics(
      ranked: DataFrame,
      qrels: DataFrame,
      queryIdCol: String,
      docIdCol: String,
      k: Int): DataFrame = {
    val spark = ranked.sparkSession
    // integer micro-units of the position gain 1/log2(pos+1); the same
    // constants serve DCG (at the hit's rank) and IDCG (at 1..n_rel)
    // ln(pos+1)/ln(2), NOT log2(): Spark's log() is JVM Math.log — the
    // identical libm the driver-side IDCG mirror below folds with
    def gainU(pos: Column): Column =
      round(lit(1e6) / (log(pos.cast("double") + lit(1.0)) / log(lit(2.0))), 0).cast("long")
    // distinct: a duplicated qrel pair would fan out the left join
    // below and overcount hits/DCG
    val rel = qrels.select(
      col(queryIdCol).as("query_id"), col(docIdCol).as("doc_id")).distinct()
      .withColumn("rel", lit(1L))
    val nRel = rel.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    // FULL outer against the qrel queries: a query with labeled
    // relevant docs but ZERO ranked rows must surface as hits=0 /
    // recall=0 / rr=0 — silently dropping it would inflate averaged
    // metrics exactly when the ranker fails hardest
    val perQuery = ranked
      .select(col(queryIdCol).as("query_id"), col(docIdCol).as("doc_id"), col("rank"))
      .filter(col("rank") <= k)
      .join(broadcast(rel), Seq("query_id", "doc_id"), "left")
      .groupBy(col("query_id"))
      .agg(
        sum(coalesce(col("rel"), lit(0L))).as("hits"),
        min(when(col("rel").isNotNull, col("rank"))).as("first_rel_rank"),
        sum(when(col("rel").isNotNull, gainU(col("rank"))).otherwise(lit(0L))).as("dcg_u"))
      // no broadcast hint here: Spark cannot build a broadcast side for a
      // full-outer join — the hint is silently dropped with a
      // HintErrorLogger WARN at EVERY (re)planning, which flooded the
      // round-12 driver run's bounded output capture. The fallback SMJ is
      // the only supported strategy at this (per-query aggregate) size.
      .join(nRel, Seq("query_id"), "full_outer")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("dcg_u", coalesce(col("dcg_u"), lit(0L)))
    // IDCG: the best achievable DCG puts a relevant doc at every
    // position 1..min(n_rel, k) — a k-row lookup, prefix-summed
    import spark.implicits._
    val idcg = (1 to k).map(p => (p.toLong, (1 to p).map(q =>
        math.round(1e6 / (math.log(q + 1.0) / math.log(2.0))) // mirror gainU
      ).sum)).toDF("ideal_n", "idcg_u")
    perQuery
      .join(broadcast(idcg), least(col("n_rel"), lit(k.toLong)) === col("ideal_n"), "left")
      .select(
        col("query_id"),
        col("n_rel"),
        col("hits"),
        round(col("hits").cast("double") / k, 6).as("precision_at_k"),
        when(col("n_rel") > 0,
          round(col("hits").cast("double") / col("n_rel"), 6)).as("recall_at_k"),
        round(coalesce(lit(1.0) / col("first_rel_rank"), lit(0.0)), 6).as("rr"),
        when(col("n_rel") > 0,
          round(col("dcg_u").cast("double") / col("idcg_u"), 6)).as("ndcg_at_k"))
  }
}
