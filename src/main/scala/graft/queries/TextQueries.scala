package graft.queries

import graft.functions.{Dedup, Sampling, Similarity, TextFunctions => TF}
import graft.multimodal.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators over the `documents` and `embeddings`
  * tables: text analysis, language ID, exact + MinHash + SimHash + n-gram
  * dedup, cosine similarity search (brute force + LSH), multimodal
  * metadata plumbing. All oracle-able in DuckDB via the portable
  * md5-derived hash. */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "embeddings")

  /** BPE merges trained once per (session, dir) — the tokenizer model,
    * shared by the merges table (d42) and the encoder (d43). */
  private def trainedBpe(s: SparkSession, dir: String): Seq[graft.functions.Bpe.Merge] =
    graft.sources.ModelCache.getOrElseUpdate(s, s"bpe:$dir:m=30") {
      graft.functions.Bpe.train(docs(s, dir), "text", 30)
    }

  /** Text near-dup groups as a staged dedup index — the iterative
    * connected-components rounds can't benefit from plan caching, and
    * d23 (groups) + d29 (apply) consume the same table, so it is built
    * once per (session, dir) like the ANN model family. */
  /** Staged whole-corpus BM25 index parts (postings, stats) for the
    * direct-path retrieval family: d66/d67/d68/d71 probe the SAME
    * corpus postings with different query batches, and a deployment
    * computes the corpus side once (the buildIndex story) — so the
    * tokenize→explode→postings subtree is staged per (session, dir)
    * like the DTW summary family. [[graft.functions.Retrieval
    * .bm25FromParts]] over the staged parts is bit-identical to
    * bm25TopK: same scorer, and the doc_id rename is a no-op here. */
  private def stagedBm25Parts(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val (p, st) = graft.functions.Retrieval.indexParts(docs(s, dir), "text", "doc_id")
    (graft.sources.StagingCache.getOrElseUpdate(s, s"bm25_postings:$dir")(p),
      graft.sources.StagingCache.getOrElseUpdate(s, s"bm25_stats:$dir")(st))
  }

  private def stagedNearDupGroups(s: SparkSession, dir: String): DataFrame =
    graft.sources.StagingCache.getOrElseUpdate(s, s"neardup_groups:$dir:j=0.5") {
      Dedup.nearDupGroups(docs(s, dir), "text", "doc_id", minEstJaccard = 0.5)
    }

  /** On-disk staged index roots for the compaction-invariance gates
    * (d77/d78): the corpus appended as three doc-disjoint batches
    * through the REAL committed-batch-dir store, then compacted —
    * batches 0-1 absorbed into a manifest-carrying c-dir, batch 2 left
    * in its own dir (the never-absorb-the-newest replay rule), so the
    * serve path exercises the mixed compacted + live read. Built once
    * per (session, corpus dir) per JVM; the root is DELETED first so a
    * leftover from an earlier process can never satisfy the gate. */
  private val builtStagedIndexes =
    scala.collection.mutable.Set.empty[(SparkSession, String)]

  private def stagedCompactedRoot(
      s: SparkSession, dir: String, kind: String)(
      build: (DataFrame, String) => Unit): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    // the root is per (process, session, corpus): a second session in
    // this JVM — or another process — builds its OWN root instead of
    // deleting and rebuilding one an earlier session may still be
    // serving lazy d77/d78 frames from (stale roots are /tmp litter,
    // and each owner still delete-firsts its own)
    val owner = s"${ProcessHandle.current().pid()}_${System.identityHashCode(s)}"
    val root = s"${sys.props("java.io.tmpdir")}/graft_${kind}_${key}_$owner"
    builtStagedIndexes.synchronized {
      builtStagedIndexes.filterInPlace(!_._1.sparkContext.isStopped)
      if (!builtStagedIndexes((s, root))) {
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
        build(docs(s, dir), root)
        builtStagedIndexes += ((s, root))
      }
    }
    root
  }

  private def compactedBm25Root(s: SparkSession, dir: String): String =
    stagedCompactedRoot(s, dir, "d77_idx") { (d, root) =>
      (0 to 2).foreach(i => graft.functions.Retrieval.appendToIndex(
        d.filter(pmod(col("doc_id"), lit(3)) === i), "text", "doc_id", root, i.toLong))
      graft.functions.Retrieval.compactIndex(s, root)
    }

  private def compactedPositionalRoot(s: SparkSession, dir: String): String =
    stagedCompactedRoot(s, dir, "d78_pidx") { (d, root) =>
      (0 to 2).foreach(i => graft.functions.Retrieval.appendToPositionalIndex(
        d.filter(pmod(col("doc_id"), lit(3)) === i), "text", "doc_id", root, i.toLong))
      graft.functions.Retrieval.compactPositionalIndex(s, root)
    }

  /** d81's staged root: the d79 build with BOTH layers compacted —
    * batches 0-1 of the positional postings AND the anchor table
    * absorbed into manifest c-dirs (newest stays live). The anchor
    * layer's compaction-invariance oracle, completing the set (d77
    * BM25, d78 positional, d80 ANN codes). */
  private def anchoredCompactedRoot(s: SparkSession, dir: String): String =
    stagedCompactedRoot(s, dir, "d81_aidxc") { (d, root) =>
      (0 to 2).foreach { i =>
        val b = d.filter(pmod(col("doc_id"), lit(3)) === i)
        graft.functions.Retrieval.appendToPositionalIndex(b, "text", "doc_id", root, i.toLong)
        graft.functions.Retrieval.appendToAnchorIndex(b, "text", "doc_id", root, i.toLong, k = 2)
      }
      graft.functions.Retrieval.compactPositionalIndex(s, root)
      graft.functions.Retrieval.compactAnchorIndex(s, root)
    }

  /** d79's staged root: positional postings + the ANCHOR fp table,
    * appended batch-aligned (the deployment contract — call both per
    * batch). k = 2 so the test phrase list exercises BOTH routes: the
    * ≥2-token phrases take the anchor probe, the 1-token phrase falls
    * back to the literal path. */
  private def anchoredPositionalRoot(s: SparkSession, dir: String): String =
    stagedCompactedRoot(s, dir, "d79_aidx") { (d, root) =>
      (0 to 2).foreach { i =>
        val b = d.filter(pmod(col("doc_id"), lit(3)) === i)
        graft.functions.Retrieval.appendToPositionalIndex(b, "text", "doc_id", root, i.toLong)
        graft.functions.Retrieval.appendToAnchorIndex(b, "text", "doc_id", root, i.toLong, k = 2)
      }
    }

  /** d80's staged root: the embedding corpus routed + PQ-encoded in
    * three id-disjoint batches under the WHOLE-CORPUS model (the same
    * cacheKey d27's in-query path trains — parity is the point), landed
    * as committed bucket-clustered dirs, batches 0-1 compacted (the
    * mixed c-dir + live read, like d77/d78). */
  private def annCodesRoot(s: SparkSession, dir: String): String =
    stagedCompactedRoot(s, dir, "d80_ann") { (_, root) =>
      val e = embs(s, dir)
      (0 to 2).foreach { i =>
        val encoded = Similarity.ivfPqIndexAppend(
          e, e.filter(pmod(col("vec_id"), lit(3)) === i), "vec_id", "embedding",
          nSub = 16, kSub = 32, cacheKey = Some(dir))
        graft.streaming.StateStore.writeBatchDir(
          encoded.repartitionByRange(col("bucket"))
            .sortWithinPartitions(col("bucket"), col("id")),
          s"$root/codes", i.toLong)
      }
      graft.streaming.StreamingAnnIndex.compactAnnIndex(s, root)
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-doc text statistics + quality score (tokenize once per row)
    "d1_text_stats" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), col("lang"), col("text"), TF.tokens(col("text")).as("toks"))
        .select(
          col("doc_id"),
          col("lang"),
          size(col("toks")).cast("long").as("n_tokens"),
          round(size(array_distinct(col("toks"))).cast("double") / size(col("toks")), 6)
            .as("distinct_ratio"),
          round(TF.stopwordRatioOf(col("toks"), TF.stopwords("en")), 6).as("stopword_ratio"),
          TF.qualityScoreOf(col("toks")).as("quality_score"),
          // BPE-style pre-tokenizer count: words | numbers | single punct
          size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
            .cast("long").as("n_subtokens"))
    }),
    // exact dedup via normalized-text fingerprint
    "d2_dedup_exact" -> ((s, dir) => {
      Dedup.exactDedup(docs(s, dir), "text", "doc_id")
    }),
    // MinHash-LSH near-dup candidate pairs with estimated Jaccard
    "d3_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLshPairs(docs(s, dir), "text", "doc_id")
        .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
    }),
    // per-doc 60-bit SimHash
    "d4_simhash" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"), Dedup.simhash("text").as("simhash"))
    }),
    // exact 3-gram Jaccard, LSH-band candidate generation (sub-quadratic:
    // no within-bucket all-pairs)
    "d5_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardViaLsh(docs(s, dir), "text", "doc_id")
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),
    // brute-force cosine top-5 for the first 10 vectors
    "d6_embed_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
    }),
    // sign-LSH bucketed approximate top-5 (equi-join instead of cross join)
    "d7_embed_lsh" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5, nBits = 8)
    }),
    // IVF inverted-list ANN: probe the 2 nearest of 16 centroid lists
    "d11_embed_ivf" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
    }),
    // multi-band + multi-probe sign-LSH top-5: the recall-hardened scale
    // path (10 bands x 6 sign bits, 1-bit-flip probes)
    "d14_embed_lsh_bands" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.lshTopKBanded(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
    }),
    // IVF with TRAINED centroids (3 spherical k-means iterations over the
    // corpus sample); k-means is not practical to mirror in oracle SQL ->
    // rows-only here, recall@5 >= 0.9 gated by AnnRecallSpec
    "d15_embed_ivf_trained" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.ivfTopKTrained(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5,
        cacheKey = Some(dir))
    }),
    // product-quantization top-5: ADC shortlist over 16-byte codes +
    // exact re-rank (rows-only: trained codebooks aren't SQL-expressible;
    // recall@5 >= 0.9 gated in AnnRecallSpec like d15)
    "d26_pq_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.pqTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5,
        nSub = 16, kSub = 32, cacheKey = Some(dir))
    }),
    // IVF-PQ: trained coarse lists + ADC over codes + exact re-rank
    // (rows-only like d15/d26; recall gated in AnnRecallSpec)
    "d27_ivf_pq" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5,
        nSub = 16, kSub = 32, cacheKey = Some(dir))
    }),
    // ANN serve-from-store: d27's query served from the PERSISTED
    // (id, bucket, codes) table — three id-disjoint ivfPqIndexAppend
    // batches through the committed batch-dir store, batches 0-1
    // compacted (the StreamingAnnIndex layout), model re-derived
    // memoized under the same key. Oracle = d27's replay VERBATIM:
    // equality proves the stored index and the serve path are
    // bit-invisible — the BM25 build-once/serve-many shape for ANN
    "d80_ann_index_serve" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.ivfPqTopKFromCodes(
        graft.streaming.StreamingAnnIndex.codesAt(s, annCodesRoot(s, dir)),
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5,
        nSub = 16, kSub = 32, cacheKey = Some(dir))
    }),
    // incremental index maintenance: route + encode a FRESH batch under
    // the model trained on the BASE split only — the daily-ingest path
    // (per-row scans of the batch; nothing retrains, nothing re-touches
    // the base index). Oracle replays base-split training + fresh encode.
    "d56_index_append" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.ivfPqIndexAppend(
        e.filter(col("vec_id") < 400), e.filter(col("vec_id") >= 400),
        "vec_id", "embedding", cacheKey = Some(dir + ":base400"))
        .select(
          col("id"),
          col("bucket"),
          // serialized codes: the compare gate sorts rows by every
          // column, and array cells aren't orderable there
          concat_ws(",", transform(col("codes"), _.cast("string"))).as("codes"))
    }),
    // IVFADC proper: PQ over residuals (vec − coarse centroid), per-list
    // query LUTs (rows-only like d27; recall gated in AnnRecallSpec)
    "d31_ivf_pq_residual" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.ivfPqResidualTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5,
        nSub = 16, kSub = 32, cacheKey = Some(dir))
    }),
    // Johnson–Lindenstrauss sign projection 64 → 16 dims: deterministic
    // ±1 matrix from the portable hash of the salt, derived once per
    // partition, pure multiply-adds per row (no shuffle); exploded to
    // (vec_id, dim, value) for oracle hashing
    "d45_jl_project" -> ((s, dir) => {
      Similarity.jlProjected(embs(s, dir), "vec_id", "embedding", 64, 16)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "value")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"),
          round(col("value"), 6).as("value"))
    }),
    // hard-negative mining (contrastive training): the 5 most-similar
    // WRONG-label vectors per query — exact over negatives (mismatch
    // filter before ranking); the ANN over-fetch path approximates this
    "d41_hard_negatives" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.hardNegatives(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", "label", 5)
    }),
    // the DEPLOYABLE hard-negative miner: banded sign-LSH candidates
    // over-fetched to 20, label-filtered, re-ranked to top-5 — no cross
    // join; d41's exact cross stays registered as its recall verifier
    // (the d61/d62 split, negatives edition)
    "d64_hard_negatives_ann" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.hardNegativesAnn(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", "label", 5, kCand = 20)
    }),
    // embedding near-duplicate pairs above a cosine threshold, LSH-bucketed
    "d10_embed_neardup" -> ((s, dir) => {
      Similarity.embeddingNearDupPairs(embs(s, dir), "vec_id", "embedding", 0.3, nBits = 6)
    }),
    // multi-band near-dup pairs: candidates from ANY of 16 sign-LSH bands
    // (recall-hardened version of d10; pair recall gated in AnnRecallSpec)
    "d16_embed_neardup_bands" -> ((s, dir) => {
      Similarity.embeddingNearDupPairsBanded(embs(s, dir), "vec_id", "embedding", 0.3)
    }),
    // semantic-dedup clusters: banded cosine pairs (>= 0.3) → connected
    // components → canonical vector per cluster
    "d25_embed_dedup_groups" -> ((s, dir) => {
      // the groups table is a dedup INDEX: built once per (session, dir)
      // — the iterative CC rounds can't benefit from plan caching, so
      // stage the result (same build-once/serve-many shape as the ANN
      // model family)
      graft.sources.StagingCache.getOrElseUpdate(s, s"embed_dedup_groups:$dir:t=0.3") {
        Similarity.embeddingNearDupGroups(embs(s, dir), "vec_id", "embedding", 0.3)
      }
    }),
    // TF-IDF: top-3 distinguishing terms per document
    "d12_tfidf" -> ((s, dir) => {
      TF.tfIdfTopTerms(docs(s, dir), "text", "doc_id", 3)
    }),
    // BM25 top-5 retrieval for a fixed query batch — the inverted-index
    // probe (only postings of query terms are scored; the corpus never
    // broadcasts). Integer micro-unit per-term contributions make the
    // per-doc sum order-free (the d61 convention); rank compares the
    // exact integer score. Query 3 carries the rare term 'dup' (df≈25
    // vs ~390 — IDF discrimination), query 5 a term absent from the
    // corpus (contributes nothing, matched count drops)
    "d66_bm25" -> ((s, dir) => {
      val q = s.createDataFrame(Seq(
        (1L, "hash join table"),
        (2L, "spark fast scan"),
        (3L, "slow batch merge dup"),
        (4L, "vector column group sort"),
        (5L, "dup missingterm"))).toDF("query_id", "query")
      val (p, st) = stagedBm25Parts(s, dir)
      graft.functions.Retrieval
        .bm25FromParts(p, st, q, "query_id", "query", 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    // retrieval-quality eval over d66's ranking: qrels are the docs
    // containing ALL of a query's terms (deterministic AND-relevance
    // both engines recompute), metrics recall@5 / precision@5 / MRR /
    // nDCG@5 per query. Query 5's relevant set is empty (missingterm)
    // — the NULL-recall/ndcg, rr=0 edge in-registry
    "d67_retrieval_eval" -> ((s, dir) => {
      val q = s.createDataFrame(Seq(
        (1L, "hash join table"),
        (2L, "spark fast scan"),
        (3L, "slow batch merge dup"),
        (4L, "vector column group sort"),
        (5L, "dup missingterm"))).toDF("query_id", "query")
      val (p, st) = stagedBm25Parts(s, dir)
      val ranked = graft.functions.Retrieval
        .bm25FromParts(p, st, q, "query_id", "query", 5)
      val qt = q.select(col("query_id"),
        explode(TF.tokens(col("query"))).as("term")).distinct()
      val nq = qt.groupBy(col("query_id")).agg(count(lit(1)).as("nq"))
      // the staged postings already hold one row per (doc, term) — the
      // distinct exploded token set — so qrels reads them instead of
      // re-tokenizing the corpus (identical pairs by construction)
      val qrels = p
        .select(col("doc_id"), col("term"))
        .join(broadcast(qt), Seq("term"))
        .groupBy(col("query_id"), col("doc_id")).agg(count(lit(1)).as("nm"))
        .join(broadcast(nq), Seq("query_id"))
        .filter(col("nm") === col("nq"))
        .select(col("query_id"), col("doc_id"))
      graft.functions.Retrieval
        .rankingMetrics(ranked, qrels, "query_id", "doc_id", 5)
        .orderBy(col("query_id"))
    }),
    // hybrid retrieval: BM25 top-20 + Jaccard-overlap top-20 fused by
    // reciprocal-rank fusion (integer micro-unit contributions, the
    // calibration-free hybrid-search combiner) → fused top-5
    "d68_rrf_hybrid" -> ((s, dir) => {
      val q = s.createDataFrame(Seq(
        (1L, "hash join table"),
        (2L, "spark fast scan"),
        (3L, "slow batch merge dup"),
        (4L, "vector column group sort"),
        (5L, "dup missingterm"))).toDF("query_id", "query")
      val d = docs(s, dir)
      val (p, st) = stagedBm25Parts(s, dir)
      val bm = graft.functions.Retrieval
        .bm25FromParts(p, st, q, "query_id", "query", 20)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val jc = graft.functions.Retrieval
        .jaccardTopK(d, "text", "doc_id", q, "query_id", "query", 20)
        .select(col("query_id"), col("doc_id"), col("rank"))
      graft.functions.Retrieval.rrfFuse(Seq(bm, jc), k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    // the incremental-index serve path: corpus split into base +
    // append batches (the buildIndex/appendToIndex layout, disk layer
    // spec-gated in RetrievalIndexSpec), scored from the UNIONED parts
    // with additively-folded stats AND the additive per-term df tables
    // (the vocabulary-sized probe — postings scanned once per query
    // batch, not twice). Oracle = the WHOLE-corpus BM25 replay —
    // passing proves split-invariance of all THREE parts bit-for-bit
    "d69_bm25_index" -> ((s, dir) => {
      val q = s.createDataFrame(Seq(
        (1L, "hash join table"),
        (2L, "spark fast scan"),
        (3L, "slow batch merge dup"),
        (4L, "vector column group sort"),
        (5L, "dup missingterm"))).toDF("query_id", "query")
      val d = docs(s, dir)
      val splits = Seq(
        d.filter(pmod(col("doc_id"), lit(3)) === 0),
        d.filter(pmod(col("doc_id"), lit(3)) === 1),
        d.filter(pmod(col("doc_id"), lit(3)) === 2))
        .map(b => graft.functions.Retrieval.indexParts(b, "text", "doc_id"))
      graft.functions.Retrieval.bm25FromParts(
          splits.map(_._1).reduce(_.unionByName(_)),
          splits.map(_._2).reduce(_.unionByName(_)),
          q, "query_id", "query", 5,
          dfRows = Some(splits.map(p => graft.functions.Retrieval.dfOf(p._1))
            .reduce(_.unionByName(_))))
        .orderBy(col("query_id"), col("rank"))
    }),
    // exact phrase occurrences over positional postings — the
    // contamination-audit form of retrieval ("which docs contain this
    // eval sentence verbatim"). Phrase 1 repeats a token (distinct-
    // offset counting), 3 is a 4-gram, 4 is a single term, 5 never
    // occurs (absent from the output)
    "d70_phrase" -> ((s, dir) => {
      val ph = s.createDataFrame(Seq(
        (1L, "table table"),
        (2L, "fast table"),
        (3L, "key agg row scan"),
        (4L, "vector"),
        (5L, "spark missingterm"))).toDF("phrase_id", "phrase")
      graft.functions.Retrieval
        .phraseSearch(docs(s, dir), "text", "doc_id", ph, "phrase_id", "phrase")
        .orderBy(col("phrase_id"), col("doc_id"))
    }),
    // more-like-this: the REAL hybrid search — for each seed doc, the
    // lexical ranking (BM25 with the seed's own text as the query,
    // self dropped) fused by RRF with the semantic ranking (embedding
    // cosine over the aligned vec_id space, d6's convention). The
    // query-by-example expansion primitive a curation pipeline uses to
    // grow a seed set
    "d71_more_like_this" -> ((s, dir) => {
      val seeds = Seq(7L, 123L, 321L)
      val d = docs(s, dir)
      val q = d.filter(col("doc_id").isin(seeds: _*))
        .select(col("doc_id").as("query_id"), col("text").as("query"))
      val (p, st) = stagedBm25Parts(s, dir)
      val lexical = graft.functions.Retrieval
        .bm25FromParts(p, st, q, "query_id", "query", 21)
        .filter(col("doc_id") =!= col("query_id"))
        .select(col("query_id"), col("doc_id"), col("rank"))
      val e = embs(s, dir)
      val semantic = Similarity
        .bruteForceTopK(e, e.filter(col("vec_id").isin(seeds: _*)), "vec_id", "embedding", 20)
        .select(col("query_id"), col("corpus_id").as("doc_id"), col("rank"))
      graft.functions.Retrieval.rrfFuse(Seq(lexical, semantic), k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    // context snippets around each doc's first phrase hit — the
    // triage view after the d70 exact-match audit
    "d73_snippets" -> ((s, dir) => {
      val ph = s.createDataFrame(Seq(
        (1L, "table table"),
        (2L, "fast table"),
        (3L, "key agg row scan"))).toDF("phrase_id", "phrase")
      graft.functions.Retrieval
        .snippets(docs(s, dir), "text", "doc_id", ph, "phrase_id", "phrase", window = 3)
        .orderBy(col("phrase_id"), col("doc_id"))
    }),
    // the positional-index serve path for the phrase audit: corpus
    // split into doc-disjoint batches (the buildPositionalIndex/append
    // layout, disk layer spec-gated in PhraseIndexSpec), the d70 audit
    // scored from the UNIONED positional postings — the corpus
    // tokenize paid once at build, not per audit. Oracle = the WHOLE-
    // corpus d70 replay — split invariance bit-for-bit
    "d75_phrase_index" -> ((s, dir) => {
      val ph = s.createDataFrame(Seq(
        (1L, "table table"),
        (2L, "fast table"),
        (3L, "key agg row scan"),
        (4L, "vector"),
        (5L, "spark missingterm"))).toDF("phrase_id", "phrase")
      val d = docs(s, dir)
      val parts = Seq(
        d.filter(pmod(col("doc_id"), lit(3)) === 0),
        d.filter(pmod(col("doc_id"), lit(3)) === 1),
        d.filter(pmod(col("doc_id"), lit(3)) === 2))
        .map(b => graft.functions.Retrieval.positionalIndexParts(b, "text", "doc_id"))
        .reduce(_.unionByName(_))
      graft.functions.Retrieval
        .phraseSearchFromPostings(parts, ph, "phrase_id", "phrase", "doc_id")
        .orderBy(col("phrase_id"), col("doc_id"))
    }),
    // index-served snippets: the context window REASSEMBLED from the
    // stored positional postings (tokens in the clamped pos range,
    // ordered by pos) — no re-tokenize in the audit OR the triage
    // view. Oracle = the WHOLE-corpus d73 replay
    "d76_snippets_index" -> ((s, dir) => {
      val ph = s.createDataFrame(Seq(
        (1L, "table table"),
        (2L, "fast table"),
        (3L, "key agg row scan"))).toDF("phrase_id", "phrase")
      val d = docs(s, dir)
      val parts = Seq(
        d.filter(pmod(col("doc_id"), lit(3)) === 0),
        d.filter(pmod(col("doc_id"), lit(3)) === 1),
        d.filter(pmod(col("doc_id"), lit(3)) === 2))
        .map(b => graft.functions.Retrieval.positionalIndexParts(b, "text", "doc_id"))
        .reduce(_.unionByName(_))
      graft.functions.Retrieval
        .snippetsFromPostings(parts, ph, "phrase_id", "phrase", "doc_id", window = 3)
        .orderBy(col("phrase_id"), col("doc_id"))
    }),
    // the COMPACTION-invariance gate for the BM25 disk layer: the d69
    // corpus appended as three batches through the real batch-dir
    // store, batches 0-1 absorbed into a compacted dir (newest stays
    // live — the replay-window rule), BM25 served from the mixed
    // c-dir + b-dir read WITH the stored additive df tables. Oracle =
    // the same whole-corpus replay as d69 — absorb-invariance
    // end-to-end under the driver's bit-exact gate
    "d77_bm25_compacted" -> ((s, dir) => {
      val q = s.createDataFrame(Seq(
        (1L, "hash join table"),
        (2L, "spark fast scan"),
        (3L, "slow batch merge dup"),
        (4L, "vector column group sort"),
        (5L, "dup missingterm"))).toDF("query_id", "query")
      graft.functions.Retrieval.bm25FromIndex(
          s, compactedBm25Root(s, dir), q, "query_id", "query", 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    // the positional twin of d77: phrase audit served from a COMPACTED
    // positional index (re-clustered by term on merge). Oracle = the
    // whole-corpus d70 replay, the d75 convention
    "d78_phrase_compacted" -> ((s, dir) => {
      val ph = s.createDataFrame(Seq(
        (1L, "table table"),
        (2L, "fast table"),
        (3L, "key agg row scan"),
        (4L, "vector"),
        (5L, "spark missingterm"))).toDF("phrase_id", "phrase")
      graft.functions.Retrieval.phraseSearchFromIndex(
          s, compactedPositionalRoot(s, dir), ph, "phrase_id", "phrase")
        .orderBy(col("phrase_id"), col("doc_id"))
    }),
    // the ANCHOR-probe decontamination path: the d70 audit served
    // through the fp-clustered first-k-gram candidate probe + exact
    // positional verify — the over-cap regime's bounded-probe form
    // (phrase count stops correlating with surviving row groups).
    // Oracle = the whole-corpus d70 replay: the anchors must be pure
    // pre-filter, bit-invisible in the result
    "d79_phrase_anchors" -> ((s, dir) => {
      val ph = s.createDataFrame(Seq(
        (1L, "table table"),
        (2L, "fast table"),
        (3L, "key agg row scan"),
        (4L, "vector"),
        (5L, "spark missingterm"))).toDF("phrase_id", "phrase")
      graft.functions.Retrieval.phraseSearchViaAnchors(
          s, anchoredPositionalRoot(s, dir), ph, "phrase_id", "phrase")
        .orderBy(col("phrase_id"), col("doc_id"))
    }),
    // the anchor layer's compaction-invariance oracle: the d79 audit
    // served after BOTH index layers' batches 0-1 are absorbed into
    // manifest c-dirs (the d77/d78/d80 pattern applied to the last
    // remaining disk layer) — equality against the same whole-corpus
    // replay proves absorb-invariance for the anchor table end to end
    "d81_phrase_anchors_compacted" -> ((s, dir) => {
      val ph = s.createDataFrame(Seq(
        (1L, "table table"),
        (2L, "fast table"),
        (3L, "key agg row scan"),
        (4L, "vector"),
        (5L, "spark missingterm"))).toDF("phrase_id", "phrase")
      graft.functions.Retrieval.phraseSearchViaAnchors(
          s, anchoredCompactedRoot(s, dir), ph, "phrase_id", "phrase")
        .orderBy(col("phrase_id"), col("doc_id"))
    }),
    // PMI collocations: top bigrams by pointwise mutual information
    // with a support floor — multiword-expression discovery for
    // tokenizer vocab curation / boilerplate fingerprinting
    "d72_pmi" -> ((s, dir) => {
      TF.pmiCollocations(docs(s, dir), "text", minCount = 5, topK = 50)
    }),
    // cross-document shingle novelty: corpus-uniqueness per doc — the
    // complement of d20's within-doc repetition and d30's shared-
    // substring screen
    "d74_novelty" -> ((s, dir) => {
      TF.novelty(docs(s, dir), "text", "doc_id", n = 3)
        .select(col("doc_id"), col("n_shingles"), col("n_novel"), col("novelty"))
    }),
    // language-ID heuristic vs labeled lang: confusion counts
    "d8_lang_id" -> ((s, dir) => {
      docs(s, dir)
        .select(col("lang"), TF.tokens(col("text")).as("toks"))
        .select(col("lang"), TF.predictLangOf(col("toks")).as("predicted"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n_docs"))
    }),
    // per-doc fingerprint (rolling exact-dedup key)
    "d9_fingerprint" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        TF.fingerprint(col("text")).as("fingerprint"))
    }),
    // end-to-end curation pipeline: quality gate + language filter +
    // near-dup removal -> per-source yield
    "d13_curation" -> ((s, dir) => {
      val d = docs(s, dir)
        .select(col("doc_id"), col("source"), col("text"), TF.tokens(col("text")).as("toks"))
        .select(
          col("doc_id"), col("source"), col("text"),
          TF.qualityScoreOf(col("toks")).as("quality"),
          TF.predictLangOf(col("toks")).as("predicted"))
      val drops = Dedup.nearDupIdsToDrop(docs(s, dir), "text", "doc_id", 0.5)
      val flagged = d
        .join(broadcast(drops), d("doc_id") === drops("drop_id"), "left")
        .withColumn(
          "kept",
          col("quality") >= 0.6 && col("predicted") === "en" && col("drop_id").isNull)
      flagged
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(col("kept"), 1)).as("n_kept"),
          round(avg(col("quality")), 6).as("avg_quality"))
    }),
    // deterministic stratified sampling: per-lang binary-fraction rates
    // keyed on the portable doc-id hash (reproducible + incremental —
    // a row's fate never changes as the dataset grows)
    "d17_hash_sample" -> ((s, dir) => {
      graft.functions.Sampling
        .hashSampleBy(docs(s, dir), "doc_id", "lang",
          Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.125))
        .select(col("doc_id"), col("lang"))
    }),
    // exact-count stratified sample: the 25 hash-lowest docs per source
    // (row-exact eval-set carving, vs d17's in-expectation fractions)
    "d32_exact_sample" -> ((s, dir) => {
      graft.functions.Sampling
        .exactSampleBy(docs(s, dir), "doc_id", "source", n = 25)
        .select(col("source"), col("doc_id"))
    }),
    // data-mixture planning: per-source token totals -> deterministic
    // sampling rate min(1, weight*budget/tokens) + expected token yield
    "d18_mixture" -> ((s, dir) => {
      graft.functions.Sampling.mixtureRates(
        docs(s, dir).select(col("source"), TF.tokenCount(col("text")).as("n_tokens")),
        "source", "n_tokens",
        Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.3),
        tokenBudget = 10000L)
    }),
    // benchmark decontamination: train docs whose 3-gram overlap with the
    // eval slice (doc_id % 97 == 0) reaches 3% — eval grams broadcast,
    // one exploded-gram shuffle on the train side
    "d19_decontam" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.contaminationReport(
        d.filter(col("doc_id") % 97 =!= 0),
        d.filter(col("doc_id") % 97 === 0),
        "text", "doc_id", minContamination = 0.03)
    }),
    // EXACT similarity self-join (prefix filtering, no false negatives):
    // the result is ALL pairs with jaccard >= 0.4, so the oracle is the
    // brute-force all-pairs scan — hash equality proves losslessness
    "d50_setsim_join" -> ((s, dir) => {
      Dedup.setSimJoinExact(docs(s, dir), "text", "doc_id")
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),
    // per-source quality cap: keep the best `cap` docs per source by
    // (quality desc, doc_id) — the CommonCrawl per-domain cap as a
    // deterministic policy filter
    "d49_domain_cap" -> ((s, dir) => {
      val scored = docs(s, dir).select(
        col("doc_id"),
        col("source"),
        TF.qualityScore(col("text")).as("quality_score"))
      Sampling.capPerGroup(scored, "source", "quality_score", "doc_id", cap = 10)
    }),
    // FUZZY decontamination: MinHash-banded train-vs-eval candidates,
    // exact Jaccard on candidates only (the paraphrase-tolerant d19)
    "d48_fuzzy_decontam" -> ((s, dir) => {
      val d = docs(s, dir)
      // mod-10 split (vs d19's mod-97): a tenth of the corpus as the
      // held-out side leaves real cross-split near-dups to find
      Dedup.fuzzyContamination(
        d.filter(col("doc_id") % 10 =!= 0),
        d.filter(col("doc_id") % 10 === 0),
        "text", "doc_id")
        .select(
          col("train_id"),
          col("n_eval_matches"),
          round(col("max_jaccard"), 6).as("max_jaccard"))
    }),
    // Gopher-style repetition filters: top-bigram fraction + duplicate
    // 3-gram fraction per doc, with the combined flag
    "d20_repetition" -> ((s, dir) => {
      TF.repetitionMetrics(docs(s, dir), "text", "doc_id")
    }),
    // corpus vocabulary (Zipf) table: counts, doc freq, rank, share
    "d28_vocab_stats" -> ((s, dir) => {
      TF.vocabStats(docs(s, dir), "text", "doc_id")
    }),
    // Gopher structural quality rules: integer-gated pass flag + metrics
    "d24_gopher_quality" -> ((s, dir) => {
      TF.gopherRules(docs(s, dir), "text", "doc_id")
    }),
    // near-dup group resolution: LSH pairs (est Jaccard >= 0.5) →
    // connected components (alternating star) → canonical doc per cluster
    "d23_dedup_groups" -> ((s, dir) => {
      stagedNearDupGroups(s, dir)
    }),
    // dedup APPLY: groups → keep the canonical doc per cluster → per-source
    // kept/dropped counts and token savings (the end of the pairs → groups
    // → filtered-corpus chain)
    "d29_dedup_apply" -> ((s, dir) => {
      val d = docs(s, dir)
      d.select(col("doc_id"), col("source"), TF.tokenCount(col("text")).cast("long").as("n_tokens"))
        .join(stagedNearDupGroups(s, dir), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("is_canonical")).as("n_kept"),
          (count(lit(1)) - sum(col("is_canonical"))).as("n_dropped"),
          sum(when(col("is_canonical") === 1L, col("n_tokens")).otherwise(0L)).as("kept_tokens"),
          sum(when(col("is_canonical") === 0L, col("n_tokens")).otherwise(0L)).as("dropped_tokens"))
    }),
    // cross-document duplicated-span stats (exact substring dedup at
    // word-8-gram granularity): shared grams via one distinct + count,
    // equi-joined back — never all-pairs, never a single-node suffix array
    "d30_substring_dup" -> ((s, dir) => {
      TF.crossDocGramStats(docs(s, dir), "text", "doc_id", n = 8)
    }),
    // sequence packing: concat-and-split positions per doc within its
    // source stratum (per-stratum windows — parallel across shards)
    "d21_pack" -> ((s, dir) => {
      graft.functions.Packing.packSequences(
        docs(s, dir).select(
          col("doc_id"), col("source"), TF.tokenCount(col("text")).cast("long").as("n_tokens")),
        "source", "doc_id", "n_tokens", seqLen = 256)
    }),
    // the COMPOSED pipeline contract under ONE external oracle: exact
    // dedup → decontamination → quality gate → per-source cap →
    // sequence pack, each stage consuming the PREVIOUS stage's frame —
    // a column dropped, retyped, or re-keyed by one stage fails here,
    // not in any single-operator query (the bit-exact twin of
    // ScaleBench.pipelineMain, whose row-count gate is self-referential)
    "d82_pipeline_composed" -> ((s, dir) => {
      val d = docs(s, dir)
      // s1: exact dedup — keep the canonical (lowest) id per fingerprint
      val keep = Dedup.exactDedup(d, "text", "doc_id")
        .select(col("keep_id").as("doc_id"))
      val s1 = d.join(keep, Seq("doc_id"), "left_semi")
      // s2: decontamination — the d19 split (eval slice carved from the
      // ORIGINAL corpus so dedup can't move the benchmark), train side =
      // s1 survivors outside the slice, drop at 3-gram overlap >= 3%
      val train = s1.filter(col("doc_id") % 97 =!= 0)
      val s2 = train.join(
        Dedup.contaminationReport(train, d.filter(col("doc_id") % 97 === 0),
          "text", "doc_id", minContamination = 0.03).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      // s3: quality gate at the d13 threshold — gate AND later rank on
      // the ROUNDED score so both engines order the same 6-decimal value
      val scored = s2.select(col("doc_id"), col("source"), col("text"),
        round(TF.qualityScore(col("text")), 6).as("quality_score"))
      val s3 = scored.filter(col("quality_score") >= 0.6)
      // s4: mixture cap — best 150 per source by (quality desc, doc_id)
      val s4 = s3.join(
        graft.functions.Sampling.capPerGroup(
          s3.select(col("doc_id"), col("source"), col("quality_score")),
          "source", "quality_score", "doc_id", cap = 150)
          .select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      // s5: pack the survivors into 256-token sequences per source
      graft.functions.Packing.packSequences(
        s4.select(col("doc_id"), col("source"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens")),
        "source", "doc_id", "n_tokens", seqLen = 256)
    }),
    // sliding-window chunking: 32-token windows every 24 tokens
    "d22_chunk" -> ((s, dir) => {
      graft.functions.Packing.chunkTokens(docs(s, dir), "text", "doc_id", 32, 24)
    }),
    // fuzzy string join (entity resolution): vocabulary terms within edit
    // distance 2, candidates blocked on LENGTH (|len(a)-len(b)| <= 2 is a
    // NECESSARY condition for lev <= 2, so blocking loses nothing) — the
    // equi-join candidate discipline that replaces an O(V²) cross join
    // with O(V·5) length-bucket probes; levenshtein verifies only pairs
    "d34_fuzzy_join" -> ((s, dir) => {
      val vocab = docs(s, dir)
        .select(explode(TF.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      val left = vocab.select(
        col("tok").as("tok_a"), col("n").as("n_a"),
        explode(sequence(length(col("tok")) - 2, length(col("tok")) + 2)).as("len_b"))
      val right = vocab.select(
        col("tok").as("tok_b"), col("n").as("n_b"), length(col("tok")).as("len_b"))
      left.join(right, Seq("len_b"))
        .filter(col("tok_a") < col("tok_b") && levenshtein(col("tok_a"), col("tok_b")) <= 2)
        .select(
          col("tok_a"), col("tok_b"),
          levenshtein(col("tok_a"), col("tok_b")).cast("long").as("edit_distance"),
          col("n_a"), col("n_b"))
    }),
    // PII scrubbing: the harness docs carry no PII, so each doc gets a
    // deterministic doc_id-derived PII suffix IN-QUERY (both engines build
    // the identical string), and the oracle then checks detection counts,
    // the redacted text (by md5), and that redaction leaves nothing behind
    "d33_pii" -> ((s, dir) => {
      val txt = concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
        lit(" call 555-123-4567 from host 10.0."),
        (col("doc_id") % 256).cast("string"), lit("."),
        (col("doc_id") % 100).cast("string"))
      val redacted = TF.redactPii(col("txt"))
      docs(s, dir)
        .select(col("doc_id"), txt.as("txt"))
        .select(
          Seq(col("doc_id")) ++ TF.piiCounts(col("txt")) ++ Seq(
            md5(redacted).as("redacted_md5"),
            (size(regexp_extract_all(redacted, lit(TF.piiEmail), lit(0))) === 0 &&
              size(regexp_extract_all(redacted, lit(TF.piiPhone), lit(0))) === 0 &&
              size(regexp_extract_all(redacted, lit(TF.piiIpv4), lit(0))) === 0)
              .as("clean_after")): _*)
    }),
    // incremental passage dedup: the recurring production op — dedupe a
    // new batch (doc_id % 5 = 4) against the corpus-so-far's shingle
    // index (doc_id % 5 < 4). Bloom prefilter settles proven-new
    // shingles scan-side; only bloom positives reach the exact semi-join
    "d35_incr_dedup" -> ((s, dir) => {
      val d = docs(s, dir)
      val corpusIdx = graft.functions.IncrementalDedup.shingleFps(
        d.filter(col("doc_id") % 5 < 4), "text", "doc_id", 8)
      graft.functions.IncrementalDedup
        .passageDedupStats(
          d.filter(col("doc_id") % 5 === 4), corpusIdx, "text", "doc_id",
          shingleSize = 8)
        .select(
          col("id").as("doc_id"), col("n_shingles"), col("n_dup_shingles"),
          col("dup_fraction"), col("keep"))
    }),
    // fasttext-shape trained text classifier: hashed-ngram features →
    // 20-class softmax regression fit on the corpus's source labels
    // (the harness signal that actually lives in the TEXT: each source
    // has a distinct token mixture, while lang is uncorrelated metadata
    // and the synthetic docs contain none of gopherRules' required
    // stopwords). Trained once per (session, dir) via ModelCache — the
    // train/serve split; ~0.86 accuracy vs 0.05 random at sf0.01.
    // Trained model -> rows-only contract (like the ANN model family);
    // convergence is locked by QualityClassifierSpec.
    "d36_source_classifier" -> ((s, dir) => {
      val d = docs(s, dir)
      val srcIdx = d.select(col("source")).distinct()
        .select(col("source"), (dense_rank().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("source"))) - 1).as("y"))
      def labels(of: org.apache.spark.sql.DataFrame) =
        of.join(srcIdx, Seq("source")).select(col("doc_id").as("id"), col("y"))
      // train on a deterministic hash sample capped at ~1.5k docs — the
      // 1024-parameter model saturates well below that, and training cost
      // must not scale with the corpus (the production shape documented in
      // QualityClassifier: sample-train, serve everything). sf0.01 keeps
      // every doc (mod=1); sf0.1 trains on ~a third.
      // corpus count memoized per (session, plan) — the same scalar is
      // re-derived every serve otherwise (d65's perceptron shares the key)
      val mod = math.max(1L, graft.sources.ModelCache.getOrElseUpdate(
        s, s"nrows:plan=${d.queryExecution.analyzed.semanticHash()}")(d.count()) / 1500L)
      val trainDocs = if (mod == 1L) d
        else d.filter(pmod(xxhash64(col("doc_id")), lit(mod)) === 0)
      val model = graft.sources.ModelCache.getOrElseUpdate(
        s, s"src_clf:$dir:D=1024:K=20:it=50:lr=4000:m=$mod:tol=1e-3") {
        // iters=50 is the BUDGET; tol stops at convergence (2 consecutive
        // relative loss improvements < 1e-3) — iteration count is the
        // wall-clock of this overhead-bound loop
        graft.functions.QualityClassifier.trainMulticlass(
          graft.functions.QualityClassifier.hashedFeatures(trainDocs, "text", "doc_id", 1024),
          labels(trainDocs), numBuckets = 1024, numClasses = 20, iters = 50, lr = 4000.0,
          tol = 1e-3)
      }
      graft.functions.QualityClassifier.scoreMulticlass(d, "text", "doc_id", model)
        .join(labels(d), Seq("id"))
        .join(srcIdx.select(col("source").as("predicted_source"), col("y").as("predicted")),
          Seq("predicted"))
        .join(srcIdx, Seq("y"))
        .select(
          col("id").as("doc_id"), col("predicted_source"), col("source"),
          col("confidence"), (col("predicted") === col("y")).as("agrees"))
    }),
    // nearest-centroid source classifier — the ORACLE-GATED classifier:
    // one-aggregation-pass training (per-class mean hashed-token-count
    // vectors in integer micro-units), exact-integer scoring, so the
    // full train→predict chain replays bit-for-bit in DuckDB — the
    // contract d36's softmax cannot offer (exp/log has no cross-engine
    // bit guarantee; see COVERAGE.md)
    "d63_centroid_classifier" -> ((s, dir) => {
      graft.functions.QualityClassifier
        .centroidClassifier(docs(s, dir), "text", "doc_id", "source", numBuckets = 1024)
    }),
    // fixed-point averaged-perceptron source classifier — the
    // DISCRIMINATIVE member of the oracle-gated classifier family (d63
    // is generative): mistake-driven integer updates (+ − × only, no
    // division — averaged weights stay scaled by the step count, argmax
    // is scale-invariant), so the full SEQUENTIAL train→predict chain
    // replays bit-for-bit in a DuckDB recursive CTE. epochs/sampleCap
    // sized so the oracle's step count stays bounded (~1k steps)
    // independent of corpus size; measured sf0.01 accuracy 0.472 —
    // between d63's generative ~0.27 and d36's float softmax ~0.86,
    // as the family table in COVERAGE.md documents
    "d65_perceptron_classifier" -> ((s, dir) => {
      graft.functions.QualityClassifier.perceptronClassifier(
        docs(s, dir), "text", "doc_id", "source",
        numBuckets = 1024, epochs = 4, sampleCap = 240L)
    }),
    // data-mixture drift monitor: token-distribution shift of src0 vs
    // the rest — per-token KL contributions (top 20) + corpus-level KL
    // and total-variation totals on every row
    "d44_dist_shift" -> ((s, dir) => {
      TF.distributionShift(docs(s, dir), "text", col("source") === "src0")
    }),
    // BPE tokenizer TRAINING (Sennrich merges over the distinct-word
    // frequency table; one collected argmax row per iteration). Trained
    // model -> rows-only contract (iterative, not SQL-expressible; the
    // kernel is locked by BpeSpec's paper example, like DtwSpec for DTW);
    // trained once per (session, dir) via ModelCache
    "d42_bpe_merges" -> ((s, dir) => {
      graft.functions.Bpe.mergesTable(s, trainedBpe(s, dir))
    }),
    // per-doc token counts under the TRAINED subword vocab: distinct
    // words encode once, lengths broadcast-join back to the stream —
    // application cost scales with vocabulary, not corpus (rows-only,
    // same trained-model contract as d42)
    "d43_bpe_tokens" -> ((s, dir) => {
      graft.functions.Bpe.tokenCounts(docs(s, dir), "text", "doc_id", trainedBpe(s, dir))
    }),
    // passage-level dedup APPLY (ccnet/RefinedWeb remove-duplicated-
    // paragraphs): corpus-wide first occurrence wins, docs reassembled
    // from their kept passages. d30 measures duplicated spans; this is
    // the half that edits the corpus.
    "d38_passage_dedup_apply" -> ((s, dir) => {
      graft.functions.Dedup.passageDedupApply(docs(s, dir), "text", "doc_id", 10)
        .select(
          col("id").as("doc_id"), col("n_passages"), col("n_kept"),
          col("dedup_fraction"), col("cleaned_text"))
    }),
    // span-level exact-substring dedup APPLY (ExactSubstr, Lee et al.
    // 2022): maximal duplicated runs of >= 8 tokens removed at ANY
    // offset, first corpus occurrence kept. d38's passages only catch
    // chunk-aligned repeats; this is the sliding-gram upgrade, with the
    // suffix array replaced by a partial-aggregated first-occurrence
    // min — the distributable form of the paper's single-machine index.
    "d57_span_dedup_apply" -> ((s, dir) => {
      graft.functions.Dedup.spanDedupApply(docs(s, dir), "text", "doc_id", 8)
    }),
    // split leakage audit: hash-splitting by doc_id (the naive scheme)
    // puts members of one near-dup cluster on both sides of the
    // train/eval fence; keying the same salted hash by the cluster's
    // group_id pins every cluster to one split. The audit quantifies
    // both schemes over the staged d23 group table — n_leaking_groups
    // and n_contaminated_eval_docs must be 0 for by_group, and the
    // oracle replays the full assignment. Scale shape: two hash
    // aggregates over the dedup index (already built), no new scans.
    "d58_split_leakage" -> ((s, dir) => {
      import graft.functions.TrainingExport
      val g = stagedNearDupGroups(s, dir).select(col("doc_id"), col("group_id"))
      val weights = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
      def audit(scheme: String, key: Column): DataFrame = {
        val assigned = TrainingExport
          .assignSplits(g.withColumn("skey", key), "skey", weights)
          .select(col("doc_id"), col("group_id"), col("split"))
        val perGroup = assigned
          .groupBy(col("group_id"))
          .agg(
            count(lit(1)).as("sz"),
            countDistinct(col("split")).as("n_splits"),
            sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"))
        val groupStats = perGroup.agg(
          sum(when(col("sz") > 1, 1L).otherwise(0L)).as("n_multi_groups"),
          sum(when(col("sz") > 1 && col("n_splits") > 1, 1L).otherwise(0L))
            .as("n_leaking_groups"))
        val docStats = assigned
          .join(perGroup.select(col("group_id"), col("n_train")), Seq("group_id"))
          .agg(
            sum(when(col("split") =!= "train", 1L).otherwise(0L)).as("n_eval_docs"),
            sum(when(col("split") =!= "train" && col("n_train") > 0, 1L).otherwise(0L))
              .as("n_contaminated_eval_docs"))
        groupStats.crossJoin(docStats).select(lit(scheme).as("scheme"), col("*"))
      }
      audit("by_doc", col("doc_id")).unionByName(audit("by_group", col("group_id")))
    }),
    // margin-based bitext mining (Artetxe & Schwenk 2019): en↔de
    // candidate translation pairs scored by cos over both sides' top-4
    // neighborhood density — forward-best per source doc, with mutual
    // (backward-best agrees) and threshold flags. Exact cross here (the
    // d6 verifier shape); the scaladoc documents the ANN-candidate path.
    "d61_bitext_mining" -> ((s, dir) => {
      Similarity.mineBitext(
        embs(s, dir),
        docs(s, dir).select(col("doc_id").as("vec_id"), col("lang")),
        "vec_id", "embedding", "lang", "en", "de", k = 4, minMargin = 1.0)
    }),
    // the DEPLOYABLE bitext form: same margin pipeline, candidates from
    // banded sign-LSH over-fetched to 16 per src doc (deterministic
    // portable bands — the oracle replays candidates AND margins), no
    // cross join and no broadcast of either language partition. d61's
    // exact cross stays registered as this plan's recall verifier.
    "d62_bitext_ann" -> ((s, dir) => {
      Similarity.mineBitextAnn(
        embs(s, dir),
        docs(s, dir).select(col("doc_id").as("vec_id"), col("lang")),
        "vec_id", "embedding", "lang", "en", "de",
        k = 4, minMargin = 1.0, kCand = 16)
    }),
    // cross-source overlap matrix: exact shingle-set Jaccard per source
    // pair + the 16-long mergeable MinHash signature estimate riding as
    // the production path (the matrix that orders dedup passes and sets
    // mixture weights across corpus sources)
    "d60_source_overlap" -> ((s, dir) => {
      Dedup.groupOverlap(docs(s, dir), "text", "source")
    }),
    // DIMSUM-sampled term-term cosine over the doc-term matrix: hot
    // columns down-sampled by norm (deterministic md5 coins), integer
    // sampled dot reweighted per pair, exact cosine riding along as the
    // verifier. sqrtGamma=30 vs term norms ~53 → hot terms kept at
    // p≈0.56 — the estimator is genuinely sampling here, not pass-through.
    "d59_dimsum_terms" -> ((s, dir) => {
      TF.dimsumTermSimilarity(docs(s, dir), "text", "doc_id", sqrtGamma = 30.0)
    }),
    // deterministic train/val/test split + global-shuffle keys for the
    // training-data export (TrainingExport): every value is a pure
    // function of (salt, doc_id) via the portable md5 hash, so the
    // oracle reproduces the full assignment bit-for-bit. The sharded
    // write layout itself is locked by TrainingExportSpec.
    "d37_split_export" -> ((s, dir) => {
      graft.functions.TrainingExport.withShuffleKeys(
        graft.functions.TrainingExport.assignSplits(
          docs(s, dir).select(col("doc_id")),
          "doc_id", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)),
        "doc_id", nShards = 8)
    }),
    // weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    // 25 docs per source drawn ∝ n_chars, keys derived from the portable
    // hash so the draw is a pure function of (id, weight) — reproducible
    // across runs/partitionings/engines, unlike rand()-keyed sampling
    "d39_weighted_sample" -> ((s, dir) => {
      graft.functions.Sampling
        .weightedSampleBy(docs(s, dir), "doc_id", "source", "n_chars", k = 25)
        .select(
          col("source"), col("doc_id"), col("n_chars"),
          round(col("es_key"), 6).as("es_key"))
    }),
    // token-BUDGETED weighted sample: per source, docs drawn ∝ n_chars in
    // A-ES order until 500 tokens accumulate (boundary doc included) —
    // the materialization step of the d18 mixture plan
    "d47_token_budget_sample" -> ((s, dir) => {
      graft.functions.Sampling
        .weightedSampleByTokenBudget(
          docs(s, dir).withColumn("n_tokens", TF.tokenCount(col("text")).cast("long")),
          "doc_id", "source", "n_chars", "n_tokens", tokenBudget = 500L)
        .select(
          col("source"), col("doc_id"), col("n_tokens"),
          round(col("es_key"), 6).as("es_key"))
    }),
    // held-out LM scoring: the model trains on the even half of the
    // corpus and scores EVERY doc (the train/serve split of d40's
    // pipeline); bigrams unseen in training drop at the model join
    "d46_lm_heldout" -> ((s, dir) => {
      // same composition as NgramLm.bigramScores(trainDocs = even half),
      // with the TRAIN-side tables staged (the d40/m11 lesson): unstaged,
      // the vocab subtree is planned once per broadcast side and the
      // train counts subtree ~4× (c12, c1, and twice inside the
      // effective-V union) — each a full tokenize of the train half
      val d = docs(s, dir)
      val train = d.filter(col("doc_id") % 2 === 0)
      val vocab = graft.sources.StagingCache.getOrElseUpdate(s, s"d46_vocab:$dir:V=64") {
        graft.functions.NgramLm.vocabulary(train, "text", 64)
      }
      val trainBig = graft.sources.StagingCache.getOrElseUpdate(s, s"d46_trainbig:$dir:V=64") {
        graft.functions.NgramLm.docBigramCounts(train, "text", "doc_id", vocab)
      }
      graft.functions.NgramLm.scoresFromCounts(
        graft.functions.NgramLm.docBigramCounts(d, "text", "doc_id", vocab),
        graft.functions.NgramLm.modelFromCounts(trainBig), "doc_id")
    }),
    // bigram LM perplexity scoring (CCNet-shape quality filter): add-k
    // smoothed bigram model trained on the corpus, each doc scored by mean
    // log-prob; one token-stream shuffle, broadcast model join
    "d40_ngram_lm" -> ((s, dir) => {
      // the counts table is read by BOTH the model aggregation and the
      // scoring join — stage it (m11 lesson: materialize a shared
      // expensive subplan; un-staged, the explode+window subtree would
      // evaluate once per branch)
      val d = docs(s, dir)
      val docBig = graft.sources.StagingCache.getOrElseUpdate(s, s"ngram_docbig:$dir:V=64") {
        graft.functions.NgramLm.docBigramCounts(
          d, "text", "doc_id", graft.functions.NgramLm.vocabulary(d, "text", 64))
      }
      graft.functions.NgramLm.scoresFromCounts(
        docBig, graft.functions.NgramLm.modelFromCounts(docBig), "doc_id")
    }),
    // multimodal frame-sampling plumbing: payload → per-frame rows (every
    // 2nd of the n_frames byte slices the metadata declares), md5-
    // checksummed — zero-shuffle fan-out via the partition-wise batch
    // contract (Multimodal.sampleFrames)
    "x2_frame_sample" -> ((s, dir) => {
      Multimodal.sampleFrames(
        Multimodal.withBinaryPayload(docs(s, dir), "text"),
        "doc_id", "payload", "media_meta.n_frames", everyNth = 2)
        .toDF()
        .select(
          col("id").as("doc_id"), col("frame_idx"), col("n_bytes"), col("checksum"))
    }),
    // int8 embedding quantization: per-vector symmetric scale (max-abs /
    // 127), explicit floor(x/s + 0.5) rounding so both engines agree at
    // halves, saturating clamp — 4x storage cut for the 100 TB corpus,
    // with the reconstruction error reported per vector. Pure per-row
    // array arithmetic: scan-stage work, no shuffle at all.
    "d51_int8_quant" -> ((s, dir) => {
      val sc = col("scale")
      embs(s, dir)
        .withColumn(
          "scale",
          array_max(transform(col("embedding"), x => abs(x))).cast("double") / 127.0)
        .withColumn(
          "q",
          when(sc === 0.0, transform(col("embedding"), _ => lit(0)))
            .otherwise(transform(
              col("embedding"),
              x =>
                least(greatest(floor(x.cast("double") / sc + 0.5), lit(-127.0)), lit(127.0))
                  .cast("int"))))
        .withColumn(
          "err2",
          zip_with(
            col("q"),
            col("embedding"),
            (q, v) =>
              (q.cast("double") * sc - v.cast("double")) *
                (q.cast("double") * sc - v.cast("double"))))
        .select(
          col("vec_id"),
          round(sc, 9).as("scale"),
          aggregate(col("q"), lit(0L), (a, x) => a + x.cast("long")).as("q_sum"),
          aggregate(col("q"), lit(0L), (a, x) => a + abs(x).cast("long")).as("q_abs_sum"),
          round(
            aggregate(col("err2"), lit(0.0), (a, x) => a + x) / size(col("q")),
            9).as("mse"))
    }),
    // URL/domain extraction + blocklist screen: the harness docs carry no
    // URLs, so each doc gets two deterministic doc_id-derived links
    // IN-QUERY (the d33 pattern — both engines build identical text);
    // the domain frequency table is what a crawl-filtering pipeline
    // joins its blocklist against. One explode + one hash aggregate.
    "d52_url_extract" -> ((s, dir) => {
      val txt = concat(
        col("text"),
        lit(" see https://site"), (col("doc_id") % 50).cast("string"),
        lit(".example-"), (col("doc_id") % 3).cast("string"),
        lit(".com/p/"), col("doc_id").cast("string"),
        lit(" and http://cdn"), (col("doc_id") % 4).cast("string"),
        lit(".assets.net/r/"), (col("doc_id") % 7).cast("string"))
      docs(s, dir)
        .select(col("doc_id"), txt.as("txt"))
        .select(
          col("doc_id"),
          explode(regexp_extract_all(col("txt"), lit("https?://[A-Za-z0-9.-]+(/[A-Za-z0-9./_-]*)?"), lit(0)))
            .as("url"))
        .select(
          col("doc_id"),
          regexp_extract(col("url"), "https?://([A-Za-z0-9.-]+)", 1).as("domain"))
        .groupBy(col("domain"))
        .agg(
          countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_urls"))
        .withColumn("blocked", col("domain").like("cdn%"))
    }),
    // per-source corpus report card: the curation dashboard a pipeline
    // operator reads before choosing filters — doc/token volumes, exact
    // dup rate (d2's fingerprint), quality mean (exact: 6-decimal scores
    // summed as integers, so partial-aggregation order can't move the
    // mean), median length, short-doc fraction. One pass over documents.
    "d54_corpus_report" -> ((s, dir) => {
      docs(s, dir)
        .select(
          col("doc_id"), col("source"), col("lang"), col("text"),
          TF.tokens(col("text")).as("toks"))
        .select(
          col("doc_id"), col("source"), col("lang"),
          size(col("toks")).cast("long").as("n_tokens"),
          round(TF.qualityScoreOf(col("toks")) * 1e6, 0).cast("long").as("q6"),
          TF.fingerprint(col("text")).as("fp"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          round(percentile(col("n_tokens"), lit(0.5)), 6).as("median_tokens"),
          round(
            (sum(col("q6")).cast("double") / 1e6) / count(lit(1)),
            6).as("avg_quality"),
          (count(lit(1)) - countDistinct(col("fp"))).as("n_dup_docs"),
          round(
            count(when(col("n_tokens") < 50, 1)).cast("double") / count(lit(1)),
            6).as("short_frac"),
          countDistinct(col("lang")).as("n_langs"))
    }),
    // dedup threshold sensitivity: how many candidate pairs and affected
    // docs each near-dup threshold would sweep in — the m36 pattern
    // (config sensitivity from ONE computation) applied to d3's pairs
    "d55_threshold_sweep" -> ((s, dir) => {
      val ths = Seq(0.3, 0.5, 0.7, 0.9)
      val swept = Dedup.minhashLshPairs(docs(s, dir), "text", "doc_id")
        .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 6).as("ej"))
        .select(
          col("id_a"), col("id_b"), col("ej"),
          explode(array(ths.map(lit(_)): _*)).as("threshold"))
        .filter(col("ej") >= col("threshold"))
      swept
        .select(col("threshold"), explode(array(col("id_a"), col("id_b"))).as("id"))
        .groupBy(col("threshold"))
        .agg(countDistinct(col("id")).as("n_docs_affected"))
        .join(
          swept.groupBy(col("threshold")).agg(count(lit(1)).as("n_pairs")),
          Seq("threshold"))
        .select(
          round(col("threshold"), 2).as("threshold"),
          col("n_pairs"),
          col("n_docs_affected"))
    }),
    // multimodal plumbing: binary payload + typed metadata (decode stubbed)
    "x1_multimodal_meta" -> ((s, dir) => {
      Multimodal.withBinaryPayload(docs(s, dir), "text").select(
        col("doc_id"),
        col("media_meta.n_bytes").cast("long").as("n_bytes"),
        col("media_meta.checksum").as("checksum"),
        col("media_meta.width").cast("long").as("width"),
        col("media_meta.height").cast("long").as("height"),
        col("media_meta.n_frames").cast("long").as("n_frames"))
    }),
    // REAL image decode: per-doc deterministic PNG synthesized with the
    // JDK encoder, carried as a binary column, decoded back with
    // javax.imageio, per-image pixel sums emitted. PNG is lossless, so
    // the decoded stats equal the closed-form pixel formula — which is
    // exactly what the oracle recomputes codec-free; any encoder OR
    // decoder fault breaks the equality. Zero shuffle (two fused
    // mapPartitions stages).
    "x3_image_decode" -> ((s, dir) => {
      Multimodal.imagePixelStats(docs(s, dir), "doc_id").toDF()
        .select(
          col("doc_id"), col("width"), col("height"), col("n_pixels"),
          col("sum_r"), col("sum_g"), col("sum_b"),
          round(col("sum_r") / col("n_pixels"), 6).as("mean_r"),
          round(col("sum_g") / col("n_pixels"), 6).as("mean_g"),
          round(col("sum_b") / col("n_pixels"), 6).as("mean_b"))
    }),
    // REAL audio decode: per-doc deterministic 8-bit mono PCM clip
    // synthesized with the JDK WAV encoder, carried as a binary column,
    // decoded back with javax.sound.sampled, per-clip amplitude stats
    // emitted. PCM is lossless, so the decoded stats equal the
    // closed-form sample formula — which is exactly what the oracle
    // recomputes codec-free; any encoder OR decoder fault breaks the
    // equality. Zero shuffle (two fused mapPartitions stages).
    "x4_audio_decode" -> ((s, dir) => {
      Multimodal.audioSampleStats(docs(s, dir), "doc_id").toDF()
        .select(
          col("doc_id"), col("n_samples"), col("sample_rate"),
          col("sum_amp"), col("min_amp"), col("max_amp"),
          round(col("sum_amp") / col("n_samples"), 6).as("mean_amp"))
    }),
    // REAL video demux + decode: per-doc deterministic multi-frame
    // animated GIF synthesized with the JDK encoder over an explicit
    // 256-gray palette (indexed GIF is lossless by construction),
    // carried as a binary column, demuxed frame-by-frame with
    // javax.imageio's gif reader, per-frame pixel sums emitted — one
    // output row per FRAME (the video explode direction). The oracle
    // recomputes the closed-form per-frame pixel formula codec-free;
    // any encoder, container-framing, or decoder fault breaks the
    // equality. Zero shuffle (two fused mapPartitions stages). Closes
    // the last multimodal stub.
    "x5_video_decode" -> ((s, dir) => {
      Multimodal.videoFrameStats(docs(s, dir), "doc_id").toDF()
        .select(
          col("doc_id"), col("frame_idx"), col("width"), col("height"),
          col("n_pixels"), col("sum_v"),
          round(col("sum_v") / col("n_pixels"), 6).as("mean_v"))
    }),
    // corrupt-payload QUARANTINE, oracle-gated: the x5 corpus with every
    // 17th payload truncated mid-header, run through the tolerant
    // decoder — good docs must carry the exact closed-form per-frame
    // stats, poisoned docs exactly one status='corrupt' row with null
    // stats (the error text is engine-specific and excluded). One bad
    // byte array quarantines, never fails the stage — the deployment
    // entry point for non-synthetic bytes, now bit-gated end to end.
    "x6_video_quarantine" -> ((s, dir) => {
      Multimodal.videoFrameStatsPoisoned(docs(s, dir), "doc_id", poisonEvery = 17L)
        .toDF()
        .select(
          col("doc_id"), col("status"), col("frame_idx"), col("width"),
          col("height"), col("n_pixels"), col("sum_v"))
    }),
    // image quarantine, oracle-gated: the x3 corpus with every 17th
    // payload truncated to the bare PNG signature, run through the
    // tolerant decoder — good docs the exact closed-form pixel stats,
    // poisoned docs exactly one status='corrupt' all-null row. With x6
    // and x8 this bit-gates all three tolerant deployment entry points.
    "x7_image_quarantine" -> ((s, dir) => {
      Multimodal.imagePixelStatsPoisoned(docs(s, dir), "doc_id", poisonEvery = 17L)
        .toDF()
        .select(
          col("doc_id"), col("status"), col("width"), col("height"),
          col("n_pixels"), col("sum_r"), col("sum_g"), col("sum_b"))
    }),
    // audio quarantine, oracle-gated: the x4 corpus with every 17th
    // payload truncated inside the RIFF chunk header, run through the
    // tolerant decoder — same contract as x6/x7 for the audio leg.
    "x8_audio_quarantine" -> ((s, dir) => {
      Multimodal.audioSampleStatsPoisoned(docs(s, dir), "doc_id", poisonEvery = 17L)
        .toDF()
        .select(
          col("doc_id"), col("status"), col("n_samples"), col("sample_rate"),
          col("sum_amp"), col("min_amp"), col("max_amp"))
    }),
    // format-sniffing DISPATCH over one mixed binary column: id mod 4
    // routes each doc to PNG / WAV / GIF / headerless text, every 17th
    // media payload truncated after its magic (sniffs, then fails its
    // kernel) — every row lands in exactly one of {ok, corrupt,
    // unknown_format} with the per-modality closed-form stats on the ok
    // rows (GIF aggregated per document). The mixed-column deployment
    // surface over the same three kernels x6/x7/x8 gate per-format.
    "x9_media_dispatch" -> ((s, dir) => {
      Multimodal.mediaStatsMixedPoisoned(docs(s, dir), "doc_id", poisonEvery = 17L)
        .toDF()
        .select(
          col("doc_id"), col("format"), col("status"),
          col("width"), col("height"), col("n_pixels"),
          col("sum_r"), col("sum_g"), col("sum_b"),
          col("n_samples"), col("sample_rate"),
          col("sum_amp"), col("min_amp"), col("max_amp"),
          col("n_frames"), col("sum_v"))
    })
  )

  /** DuckDB equivalents. Shared fragments: tokenization and the portable
    * md5-derived 60-bit hash. */
  private val toks = "string_split_regex(lower(trim(text)), '\\s+')"

  /** Shared DuckDB replay of the d66 BM25 pipeline (queries → postings
    * → df/avgdl → micro-unit contributions → integer per-doc sums →
    * rank); d66 selects the ranking from `rk`, d67 folds metrics over
    * it (reusing `qt` for qrels and `dt` for the doc term sets). */
  private def bm25CteWith(qSql: String): String =
    s"""WITH q(query_id, query) AS (
       |  $qSql
       |), dt AS (
       |  SELECT doc_id, $toks AS toks FROM documents
       |), post AS (
       |  SELECT doc_id, dl, term, COUNT(*)::BIGINT AS tf FROM (
       |    SELECT doc_id, len(toks)::BIGINT AS dl, UNNEST(toks) AS term FROM dt
       |  ) GROUP BY 1, 2, 3
       |), stats AS (
       |  SELECT COUNT(*)::DOUBLE AS n_docs, SUM(len(toks))::DOUBLE AS sum_dl FROM dt
       |), qt AS (
       |  SELECT DISTINCT * FROM (
       |    SELECT query_id, query,
       |           UNNEST(string_split_regex(lower(trim(query)), '\\s+')) AS term
       |    FROM q)
       |), f AS (
       |  SELECT term, COUNT(*)::BIGINT AS df FROM post
       |  WHERE term IN (SELECT term FROM qt) GROUP BY 1
       |), sc AS (
       |  SELECT qt.query_id, qt.query, p.doc_id,
       |         CAST(round(
       |           ln(1.0::DOUBLE + (s.n_docs - f.df + 0.5::DOUBLE) / (f.df + 0.5::DOUBLE))
       |           * (p.tf * (1.2::DOUBLE + 1.0::DOUBLE)
       |              / (p.tf + 1.2::DOUBLE
       |                   * (0.25::DOUBLE + 0.75::DOUBLE * p.dl / (s.sum_dl / s.n_docs))))
       |           * 1e6) AS BIGINT) AS cu
       |  FROM post p
       |  JOIN qt ON p.term = qt.term
       |  JOIN f ON f.term = p.term
       |  CROSS JOIN stats s
       |), agg AS (
       |  SELECT query_id, query, doc_id,
       |         SUM(cu)::BIGINT AS su, COUNT(*)::BIGINT AS n_terms_matched
       |  FROM sc GROUP BY 1, 2, 3
       |), rk AS (
       |  SELECT *,
       |         row_number() OVER (PARTITION BY query_id ORDER BY su DESC, doc_id ASC)::BIGINT AS rank
       |  FROM agg
       |)""".stripMargin

  /** The fixed five-query batch shared by d66/d67/d68/d69. */
  private val bm25Cte: String = bm25CteWith(
    """SELECT * FROM (VALUES
      |    (1::BIGINT, 'hash join table'),
      |    (2::BIGINT, 'spark fast scan'),
      |    (3::BIGINT, 'slow batch merge dup'),
      |    (4::BIGINT, 'vector column group sort'),
      |    (5::BIGINT, 'dup missingterm')) v(query_id, query)""".stripMargin)

  private def phash(e: String) = s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** Shared DuckDB replay of [[graft.functions.Retrieval.phraseSearch]]
    * for a VALUES phrase list: positional postings (zipped parallel
    * UNNESTs) + the anchor fold. Yields CTEs `dt(doc_id, toks)` and
    * `occ(phrase_id, phrase, p_len, doc_id, anchor, n_off)` — an
    * occurrence is a row with n_off = p_len. */
  private def phraseCte(phraseValues: String): String =
    s"""WITH ph(phrase_id, phrase) AS (
       |  SELECT * FROM (VALUES
       |    $phraseValues) v(phrase_id, phrase)
       |), dt AS (
       |  SELECT doc_id, $toks AS toks FROM documents
       |), post AS (
       |  SELECT doc_id, UNNEST(toks) AS term,
       |         UNNEST(range(0, len(toks))) AS pos
       |  FROM dt
       |), pt AS (
       |  SELECT phrase_id, phrase,
       |         UNNEST(string_split_regex(lower(trim(phrase)), '\\s+')) AS pterm,
       |         UNNEST(range(0, len(string_split_regex(lower(trim(phrase)), '\\s+')))) AS off
       |  FROM ph
       |), plen AS (
       |  SELECT phrase_id, COUNT(DISTINCT off)::BIGINT AS p_len FROM pt GROUP BY 1
       |), hits AS (
       |  SELECT pt.phrase_id, pt.phrase, pl.p_len, p.doc_id, pt.off,
       |         (p.pos - pt.off)::BIGINT AS anchor
       |  FROM post p
       |  JOIN pt ON p.term = pt.pterm
       |  JOIN plen pl ON pl.phrase_id = pt.phrase_id
       |  WHERE p.pos - pt.off >= 0
       |), occ AS (
       |  SELECT phrase_id, phrase, p_len, doc_id, anchor,
       |         COUNT(DISTINCT off) AS n_off
       |  FROM hits GROUP BY 1, 2, 3, 4, 5
       |)""".stripMargin
  private val enList = TF.stopwords("en").map(w => s"'$w'").mkString("[", ", ", "]")

  private val shingleCte =
    s"""WITH sh AS (
       |  SELECT doc_id, source, list_distinct(list_transform(
       |    generate_series(0, greatest(len($toks) - 3, 0)),
       |    i -> array_to_string(($toks)[i + 1 : i + 3], ' '))) AS shingles
       |  FROM documents
       |)""".stripMargin

  /** Shared oracle prefix for the dedup-group family (d23/d29):
    * MinHash sigs → banded candidates → integer-gated est-Jaccard pairs
    * (>= 8/16 matching positions == est >= 0.5) → RECURSIVE transitive
    * closure → per-doc group id (component minimum; singletons map to
    * themselves). */
  private lazy val dedupClosureCtes: String = {
    val p = graft.functions.Dedup.minhashPrime
    val minList = graft.functions.Dedup
      .minhashCoeffs(16)
      .map { case (a, b) => s"MIN((h * $a + $b) % $p)" }
      .mkString("[", ", ", "]")
    "WITH RECURSIVE " + shingleCte.stripPrefix("WITH ") +
      s""", hashed AS (
       |  SELECT doc_id, ('0x' || substr(md5(UNNEST(shingles)), 1, 7))::BIGINT AS h FROM sh
       |), sigs AS (
       |  SELECT doc_id, $minList AS sig FROM hashed GROUP BY doc_id
       |), banded AS (
       |  SELECT doc_id, b.band,
       |         ${phash("array_to_string(sig[b.band * 2 + 1 : b.band * 2 + 2], '_')")} AS bucket
       |  FROM sigs, (SELECT UNNEST(generate_series(0, 7)) AS band) b
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
       |  FROM banded a JOIN banded c ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id
       |), pairs AS (
       |  SELECT p.id_a, p.id_b
       |  FROM cand p
       |  JOIN sigs sa ON sa.doc_id = p.id_a
       |  JOIN sigs sb ON sb.doc_id = p.id_b
       |  WHERE len(list_filter(generate_series(1, 16), i -> sa.sig[i] = sb.sig[i])) * 2 >= 16
       |), edges AS (
       |  SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs
       |), reach(u, v) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u
       |), comp AS (
       |  SELECT u AS id, least(u, MIN(v)) AS group_id FROM reach GROUP BY u
       |), g AS (
       |  SELECT d.doc_id, coalesce(c.group_id, d.doc_id) AS group_id
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
       |)""".stripMargin
  }

  /** The BPE trainer (functions.Bpe.train) replayed in DuckDB — all
    * INTEGER arithmetic, so unlike the float kernels there is no
    * operation-order risk. Single-row-state recursion: each step carries
    * the entire word table as a list of (syms, n) structs plus the merge
    * list; the recursive term UNNESTs the state, aggregates pair counts
    * (DuckDB allows GROUP BY in the recursive term), picks the argmax
    * pair via MIN over a (−count, l, r) struct — the trainer's exact
    * (count desc, l asc, r asc) tie-break — and applies the merge with a
    * list_reduce fold that replicates applyMerge's greedy left-to-right
    * collapse (the merged symbol l||r can never equal l, so the fold
    * cannot re-merge its own output, same invariant as the kernel's
    * skip-2). Stops at 30 merges (the d42/d43 model) or when no pair
    * occurs twice, exactly like the trainer's `exhausted`. */
  private val bpeCte: String =
    s"""WITH RECURSIVE w0 AS (
       |  SELECT word, COUNT(*)::BIGINT AS n FROM (
       |    SELECT UNNEST($toks) AS word FROM documents
       |  ) WHERE length(word) > 0 GROUP BY word
       |), winit AS (
       |  SELECT word,
       |         list_append(list_transform(generate_series(1, length(word)), i -> word[i]), '</w>') AS syms,
       |         n
       |  FROM w0
       |), st AS (
       |  SELECT 0 AS it,
       |         (SELECT list(struct_pack(syms := syms, n := n)) FROM winit) AS ws,
       |         []::STRUCT(rank BIGINT, l VARCHAR, r VARCHAR)[] AS ms
       |  UNION ALL
       |  SELECT it + 1,
       |         list_transform(ws, w -> struct_pack(
       |           syms := list_reduce(list_transform(w.syms, s -> [s]), (acc, x) ->
       |             CASE WHEN len(acc) > 0 AND acc[-1] = bl AND x[1] = br
       |                  THEN list_append(list_slice(acc, 1, len(acc) - 1), bl || br)
       |                  ELSE list_concat(acc, x) END),
       |           n := w.n)),
       |         list_append(ms, struct_pack(rank := it::BIGINT, l := bl, r := br))
       |  FROM (
       |    SELECT it, ws, ms,
       |           MIN(struct_pack(nc := -c, l := l, r := r)).l AS bl,
       |           MIN(struct_pack(nc := -c, l := l, r := r)).r AS br
       |    FROM (
       |      SELECT it, ws, ms, p.l AS l, p.r AS r, SUM(p.n)::BIGINT AS c
       |      FROM (
       |        SELECT it, ws, ms, UNNEST(flatten(list_transform(ws, w ->
       |          list_transform(generate_series(1, len(w.syms) - 1), i ->
       |            struct_pack(l := w.syms[i], r := w.syms[i + 1], n := w.n))))) AS p
       |        FROM st
       |        WHERE it < 30
       |      )
       |      GROUP BY it, ws, ms, p.l, p.r
       |      HAVING SUM(p.n) >= 2
       |    )
       |    GROUP BY it, ws, ms
       |  )
       |), fin AS (
       |  SELECT ms FROM st ORDER BY it DESC LIMIT 1
       |), fm AS (
       |  SELECT m.rank AS rank, m.l AS l, m.r AS r
       |  FROM (SELECT UNNEST(ms) AS m FROM fin)
       |)""".stripMargin

  // ---- trained-ANN oracle fragments -------------------------------------
  // The k-means trainers replayed in DuckDB. Made possible by the round-5
  // trainer change: cluster means fold over ID-SORTED member lists (not
  // avg()), so the trained model is a pure function of the data and the
  // oracle's list(x ORDER BY id) + list_reduce reproduces it bit-for-bit.
  // Every float reduction below is a 0-or-first-seeded SEQUENTIAL fold in
  // a pinned order (element index for dot/l2, member id for means, s for
  // the ADC sum) — matching the Scala kernels' loop order exactly; an
  // aggregate SUM would be free to reorder the additions.
  //
  // Recursion shape: MULTI-ROW state (one row per centroid per iteration),
  // not one row carrying the whole model — grouping by a 512-struct book
  // list re-hashes kilobytes per input row and measured 100x slower. Each
  // step groups the single recursive reference down to per-subspace rows
  // carrying (a) the centroid list via any_value and (b) all assigned
  // members as a list, then rebuilds every centroid with list ops (empty
  // cluster -> previous centroid, like the trainer).

  private def sqlFsum(l: String) = s"list_reduce($l, (p, q) -> p + q)"
  private def sqlCos(a: String, b: String) =
    s"(${sqlFsum(s"list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])")}" +
      s" / (sqrt(${sqlFsum(s"list_transform($a, x -> x * x)")})" +
      s" * sqrt(${sqlFsum(s"list_transform($b, x -> x * x)")})))"
  private def sqlL2sq(a: String, b: String) =
    sqlFsum(s"list_transform(generate_series(1, len($a)), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))")

  /** Corpus + unit-normalized corpus + coarse spherical k-means (raw
    * vectors, 32 lists, 3 iterations, first-32-by-id init) → `fcents`.
    * `corpusWhere` restricts the TRAINING corpus (d56 trains on the
    * base split only). */
  private def annCoarseCte(corpusWhere: String = ""): String =
    s"""WITH RECURSIVE c AS (
       |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings $corpusWhere
       |), un AS (
       |  SELECT id, v, CASE WHEN nrm = 0 THEN v ELSE list_transform(v, x -> x / nrm) END AS uv
       |  FROM (SELECT id, v, sqrt(${sqlFsum("list_transform(v, x -> x * x)")}) AS nrm FROM c)
       |), cinit AS (
       |  SELECT (row_number() OVER (ORDER BY id) - 1)::INT AS cid, v AS centv
       |  FROM (SELECT id, v FROM c ORDER BY id LIMIT 32)
       |), ctr AS (
       |  SELECT 0 AS it, cid, centv FROM cinit
       |  UNION ALL
       |  SELECT it + 1, cid,
       |         CASE WHEN len(memb) = 0 THEN centv
       |              ELSE list_transform(generate_series(1, 64), p ->
       |                     ${sqlFsum("list_transform(memb, m -> m.v[p])")} / len(memb)) END
       |  FROM (
       |    SELECT it, u.cid AS cid, u.centv AS centv,
       |           list_sort(list_filter(allm, m -> m.cid = u.cid)) AS memb
       |    FROM (
       |      SELECT it, any_value(allc) AS allc,
       |             list(struct_pack(id := id, cid := mcid, v := v)) AS allm
       |      FROM (
       |        SELECT pc.it, cv.id, cv.v,
       |               MIN(struct_pack(nc := -round(${sqlCos("cv.v", "pc.centv")}, 6), cid := pc.cid)).cid AS mcid,
       |               list(struct_pack(cid := pc.cid, centv := pc.centv) ORDER BY pc.cid) AS allc
       |        FROM ctr pc, c cv
       |        WHERE pc.it < 3
       |        GROUP BY pc.it, cv.id, cv.v
       |      ) GROUP BY it
       |    ), UNNEST(allc) AS t(u)
       |  )
       |), fcents AS (
       |  SELECT cid, centv FROM ctr WHERE it = 3
       |)""".stripMargin

  /** PQ codebooks on the unit-normalized corpus (16 subspaces × 32 codes,
    * 3 iterations, first-32-by-id seeds) → `book`, corpus `codes`, and
    * per-query ADC `lut` (queries: vec_id < 10). */
  private val annPqCte: String =
    s""", ss AS (
       |  SELECT UNNEST(generate_series(0, 15)) AS s
       |), subs AS (
       |  SELECT id, s, list_slice(uv, s * 4 + 1, s * 4 + 4) AS sv FROM un, ss
       |), binit AS (
       |  SELECT s, j AS cid, list_slice(uv, s * 4 + 1, s * 4 + 4) AS centv
       |  FROM (SELECT (row_number() OVER (ORDER BY id) - 1)::INT AS j, uv
       |        FROM (SELECT id, uv FROM un ORDER BY id LIMIT 32)), ss
       |), ptr AS (
       |  SELECT 0 AS it, s, cid, centv FROM binit
       |  UNION ALL
       |  SELECT it + 1, s, cid,
       |         CASE WHEN len(memb) = 0 THEN oldv
       |              ELSE list_transform(generate_series(1, 4), p ->
       |                     ${sqlFsum("list_transform(memb, m -> m.sv[p])")} / len(memb)) END
       |  FROM (
       |    SELECT it, s, u.cid AS cid, u.centv AS oldv,
       |           list_sort(list_filter(allm, m -> m.cid = u.cid)) AS memb
       |    FROM (
       |      SELECT it, s, any_value(allc) AS allc,
       |             list(struct_pack(id := id, cid := mcid, sv := sv)) AS allm
       |      FROM (
       |        SELECT pc.it, sb.id, sb.s, sb.sv,
       |               MIN(struct_pack(d2 := round(${sqlL2sq("sb.sv", "pc.centv")}, 9), cid := pc.cid)).cid AS mcid,
       |               list(struct_pack(cid := pc.cid, centv := pc.centv) ORDER BY pc.cid) AS allc
       |        FROM ptr pc JOIN subs sb ON sb.s = pc.s
       |        WHERE pc.it < 3
       |        GROUP BY pc.it, sb.id, sb.s, sb.sv
       |      )
       |      GROUP BY it, s
       |    ), UNNEST(allc) AS t(u)
       |  )
       |), book AS (
       |  SELECT s, cid, centv FROM ptr WHERE it = 3
       |), codes AS (
       |  SELECT id, list(cid ORDER BY s) AS codes
       |  FROM (
       |    SELECT sb.id, sb.s,
       |           MIN(struct_pack(d2 := round(${sqlL2sq("sb.sv", "b.centv")}, 9), cid := b.cid)).cid AS cid
       |    FROM subs sb JOIN book b USING (s)
       |    GROUP BY sb.id, sb.s
       |  )
       |  GROUP BY id
       |), lut AS (
       |  SELECT q.id AS query_id, q.s, b.cid, ${sqlL2sq("q.sv", "b.centv")} AS d2
       |  FROM (SELECT id, s, sv FROM subs WHERE id < 10) q JOIN book b USING (s)
       |)""".stripMargin

  /** Shared exact-re-rank tail over a `short`(query_id, corpus_id) CTE —
    * raw-vector cosine, round-6, id tie-break, top-5. */
  private val annRerank: String =
    s"""
       |SELECT query_id, rank::BIGINT AS rank, corpus_id, cos_sim
       |FROM (
       |  SELECT s.query_id, s.corpus_id,
       |         round(${sqlCos("cc.v", "qq.v")}, 6) AS cos_sim,
       |         row_number() OVER (PARTITION BY s.query_id
       |           ORDER BY round(${sqlCos("cc.v", "qq.v")}, 6) DESC, s.corpus_id ASC) AS rank
       |  FROM short s
       |  JOIN c cc ON cc.id = s.corpus_id
       |  JOIN c qq ON qq.id = s.query_id
       |) WHERE rank <= 5""".stripMargin

  /** The d27 IVF-PQ replay, shared verbatim by d80: serving STORED codes
    * under the same frozen model must be bit-identical to the in-query
    * index build, so one SQL gates both — equality for d80 proves the
    * persisted (id, bucket, codes) table and the serve-from-store path
    * add nothing and lose nothing. */
  private lazy val ivfPqReplaySql: String =
    s"""${annCoarseCte()}$annPqCte, cass AS (
       |  SELECT id, MIN(struct_pack(nc := -round(${sqlCos("cv.v", "f.centv")}, 6), cid := f.cid)).cid AS bucket
       |  FROM c cv, fcents f
       |  GROUP BY id
       |), qprob AS (
       |  SELECT id AS query_id, cid AS bucket
       |  FROM (
       |    SELECT cv.id, f.cid,
       |           row_number() OVER (PARTITION BY cv.id
       |             ORDER BY round(${sqlCos("cv.v", "f.centv")}, 6) DESC, f.cid ASC) AS rn
       |    FROM c cv, fcents f WHERE cv.id < 10
       |  ) WHERE rn <= 12
       |), adc AS (
       |  SELECT a.id AS corpus_id, q.query_id, ${sqlFsum("list(l.d2 ORDER BY l.s)")} AS adc
       |  FROM cass a
       |  JOIN qprob q USING (bucket)
       |  JOIN codes cd ON cd.id = a.id
       |  JOIN lut l ON l.query_id = q.query_id AND l.cid = cd.codes[l.s + 1]
       |  WHERE a.id <> q.query_id
       |  GROUP BY a.id, q.query_id
       |), short AS (
       |  SELECT query_id, corpus_id FROM (
       |    SELECT query_id, corpus_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, corpus_id ASC) AS srn
       |    FROM adc
       |  ) WHERE srn <= 100
       |)$annRerank""".stripMargin

  /** The whole-corpus d70 phrase replay over the d79/d81 phrase list —
    * shared verbatim by both anchor-served forms: the anchor probe is a
    * pure pre-filter (d79) and compaction is absorb-invariant (d81), so
    * one SQL gates both. */
  private lazy val anchorPhraseReplaySql: String =
    s"""${phraseCte(
           """(1::BIGINT, 'table table'),
             |    (2::BIGINT, 'fast table'),
             |    (3::BIGINT, 'key agg row scan'),
             |    (4::BIGINT, 'vector'),
             |    (5::BIGINT, 'spark missingterm')""".stripMargin)}
       |SELECT phrase_id, phrase, doc_id,
       |       COUNT(*)::BIGINT AS n_occurrences, MIN(anchor)::BIGINT AS first_pos
       |FROM occ WHERE n_off = p_len
       |GROUP BY 1, 2, 3
       |ORDER BY phrase_id, doc_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // Trained-ANN family: full SQL replays of the (now bit-reproducible)
    // k-means trainers + index/query chains — see the fragment doc above
    "d15_embed_ivf_trained" ->
      s"""${annCoarseCte()}, cass AS (
         |  SELECT id, MIN(struct_pack(nc := -round(${sqlCos("cv.v", "f.centv")}, 6), cid := f.cid)).cid AS bucket,
         |         any_value(v) AS v
         |  FROM c cv, fcents f
         |  GROUP BY id
         |), qprob AS (
         |  SELECT id AS query_id, v AS qvec, cid AS bucket
         |  FROM (
         |    SELECT cv.id, cv.v, f.cid,
         |           row_number() OVER (PARTITION BY cv.id
         |             ORDER BY round(${sqlCos("cv.v", "f.centv")}, 6) DESC, f.cid ASC) AS rn
         |    FROM c cv, fcents f WHERE cv.id < 10
         |  ) WHERE rn <= 12
         |), scored AS (
         |  SELECT DISTINCT q.query_id, a.id AS corpus_id, round(${sqlCos("a.v", "q.qvec")}, 6) AS cos_sim
         |  FROM cass a JOIN qprob q USING (bucket)
         |  WHERE a.id <> q.query_id
         |)
         |SELECT query_id, rank::BIGINT AS rank, corpus_id, cos_sim
         |FROM (
         |  SELECT query_id, corpus_id, cos_sim,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, corpus_id ASC) AS rank
         |  FROM scored
         |) WHERE rank <= 5""".stripMargin,
    "d26_pq_topk" ->
      s"""${annCoarseCte()}$annPqCte, adc AS (
         |  SELECT cd.id AS corpus_id, l.query_id, ${sqlFsum("list(l.d2 ORDER BY l.s)")} AS adc
         |  FROM codes cd JOIN lut l ON l.cid = cd.codes[l.s + 1]
         |  WHERE cd.id <> l.query_id
         |  GROUP BY cd.id, l.query_id
         |), short AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT query_id, corpus_id,
         |           row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, corpus_id ASC) AS srn
         |    FROM adc
         |  ) WHERE srn <= 100
         |)$annRerank""".stripMargin,
    "d27_ivf_pq" -> ivfPqReplaySql,
    // d80: the SAME replay — serve-from-stored-codes must be invisible
    "d80_ann_index_serve" -> ivfPqReplaySql,
    "d31_ivf_pq_residual" ->
      s"""${annCoarseCte()}, rcass AS (
         |  SELECT id, MIN(struct_pack(nc := -round(${sqlCos("cu.uv", "f.centv")}, 6), cid := f.cid)).cid AS bucket,
         |         any_value(uv) AS uv
         |  FROM un cu, fcents f
         |  GROUP BY id
         |), resid AS (
         |  SELECT r.id, r.bucket,
         |         list_transform(generate_series(1, 64), p -> r.uv[p] - f.centv[p]) AS rv
         |  FROM rcass r JOIN fcents f ON f.cid = r.bucket
         |), ss AS (
         |  SELECT UNNEST(generate_series(0, 15)) AS s
         |), rsubs AS (
         |  SELECT id, s, list_slice(rv, s * 4 + 1, s * 4 + 4) AS sv FROM resid, ss
         |), rbinit AS (
         |  SELECT s, j AS cid, list_slice(rv, s * 4 + 1, s * 4 + 4) AS centv
         |  FROM (SELECT (row_number() OVER (ORDER BY id) - 1)::INT AS j, rv
         |        FROM (SELECT id, rv FROM resid ORDER BY id LIMIT 32)), ss
         |), rptr AS (
         |  SELECT 0 AS it, s, cid, centv FROM rbinit
         |  UNION ALL
         |  SELECT it + 1, s, cid,
         |         CASE WHEN len(memb) = 0 THEN oldv
         |              ELSE list_transform(generate_series(1, 4), p ->
         |                     ${sqlFsum("list_transform(memb, m -> m.sv[p])")} / len(memb)) END
         |  FROM (
         |    SELECT it, s, u.cid AS cid, u.centv AS oldv,
         |           list_sort(list_filter(allm, m -> m.cid = u.cid)) AS memb
         |    FROM (
         |      SELECT it, s, any_value(allc) AS allc,
         |             list(struct_pack(id := id, cid := mcid, sv := sv)) AS allm
         |      FROM (
         |        SELECT pc.it, sb.id, sb.s, sb.sv,
         |               MIN(struct_pack(d2 := round(${sqlL2sq("sb.sv", "pc.centv")}, 9), cid := pc.cid)).cid AS mcid,
         |               list(struct_pack(cid := pc.cid, centv := pc.centv) ORDER BY pc.cid) AS allc
         |        FROM rptr pc JOIN rsubs sb ON sb.s = pc.s
         |        WHERE pc.it < 3
         |        GROUP BY pc.it, sb.id, sb.s, sb.sv
         |      )
         |      GROUP BY it, s
         |    ), UNNEST(allc) AS t(u)
         |  )
         |), rbook AS (
         |  SELECT s, cid, centv FROM rptr WHERE it = 3
         |), rcodes AS (
         |  SELECT id, list(cid ORDER BY s) AS codes
         |  FROM (
         |    SELECT sb.id, sb.s,
         |           MIN(struct_pack(d2 := round(${sqlL2sq("sb.sv", "b.centv")}, 9), cid := b.cid)).cid AS cid
         |    FROM rsubs sb JOIN rbook b USING (s)
         |    GROUP BY sb.id, sb.s
         |  )
         |  GROUP BY id
         |), qprob AS (
         |  SELECT id AS query_id, cid AS bucket
         |  FROM (
         |    SELECT cu.id, f.cid,
         |           row_number() OVER (PARTITION BY cu.id
         |             ORDER BY round(${sqlCos("cu.uv", "f.centv")}, 6) DESC, f.cid ASC) AS rn
         |    FROM un cu, fcents f WHERE cu.id < 10
         |  ) WHERE rn <= 12
         |), qresid AS (
         |  SELECT q.query_id, q.bucket,
         |         list_transform(generate_series(1, 64), p -> cu.uv[p] - f.centv[p]) AS qrv
         |  FROM qprob q
         |  JOIN un cu ON cu.id = q.query_id
         |  JOIN fcents f ON f.cid = q.bucket
         |), rlut AS (
         |  SELECT q.query_id, q.bucket, s.s, b.cid,
         |         ${sqlL2sq("list_slice(q.qrv, s.s * 4 + 1, s.s * 4 + 4)", "b.centv")} AS d2
         |  FROM qresid q, ss s
         |  JOIN rbook b ON b.s = s.s
         |), adc AS (
         |  SELECT a.id AS corpus_id, l.query_id, ${sqlFsum("list(l.d2 ORDER BY l.s)")} AS adc
         |  FROM rcass a
         |  JOIN rcodes cd ON cd.id = a.id
         |  JOIN rlut l ON l.bucket = a.bucket AND l.cid = cd.codes[l.s + 1]
         |  WHERE a.id <> l.query_id
         |  GROUP BY a.id, l.query_id
         |), short AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT query_id, corpus_id,
         |           row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, corpus_id ASC) AS srn
         |    FROM adc
         |  ) WHERE srn <= 100
         |)$annRerank""".stripMargin,
    // incremental append: the model trains on the BASE split; the fresh
    // split is routed (top-1 coarse cosine) and PQ-encoded under it —
    // per-row arithmetic, so the replay shares every fragment above
    "d56_index_append" ->
      s"""${annCoarseCte("WHERE vec_id < 400")}$annPqCte, freshc AS (
         |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id >= 400
         |), fun AS (
         |  SELECT id, v, CASE WHEN nrm = 0 THEN v ELSE list_transform(v, x -> x / nrm) END AS uv
         |  FROM (SELECT id, v, sqrt(${sqlFsum("list_transform(v, x -> x * x)")}) AS nrm FROM freshc)
         |), fsubs AS (
         |  SELECT id, s, list_slice(uv, s * 4 + 1, s * 4 + 4) AS sv FROM fun, ss
         |), fass AS (
         |  SELECT id, MIN(struct_pack(nc := -round(${sqlCos("fv.v", "f.centv")}, 6), cid := f.cid)).cid AS bucket
         |  FROM freshc fv, fcents f
         |  GROUP BY id
         |), fcodes AS (
         |  SELECT id, list(cid ORDER BY s) AS codes
         |  FROM (
         |    SELECT sb.id, sb.s,
         |           MIN(struct_pack(d2 := round(${sqlL2sq("sb.sv", "b.centv")}, 9), cid := b.cid)).cid AS cid
         |    FROM fsubs sb JOIN book b USING (s)
         |    GROUP BY sb.id, sb.s
         |  )
         |  GROUP BY id
         |)
         |SELECT a.id, a.bucket, array_to_string(c.codes, ',') AS codes
         |FROM fass a JOIN fcodes c USING (id)""".stripMargin,
    // BPE family: trained-model queries with a full SQL replay of the
    // trainer (bpeCte) — integer counts make these bit-exact, unlike the
    // float-trained ANN family
    "d42_bpe_merges" ->
      s"""$bpeCte
         |SELECT rank, l AS "left", r AS "right", l || r AS merged FROM fm""".stripMargin,
    "d43_bpe_tokens" ->
      s"""$bpeCte, enc AS (
         |  SELECT word, syms, 0 AS k FROM winit
         |  UNION ALL
         |  SELECT e.word,
         |         CASE WHEN len(e.syms) < 2 THEN e.syms ELSE
         |           list_reduce(list_transform(e.syms, s -> [s]), (acc, x) ->
         |             CASE WHEN len(acc) > 0 AND acc[-1] = m.l AND x[1] = m.r
         |                  THEN list_append(list_slice(acc, 1, len(acc) - 1), m.l || m.r)
         |                  ELSE list_concat(acc, x) END) END,
         |         e.k + 1
         |  FROM enc e JOIN fm m ON m.rank = e.k
         |), wordlens AS (
         |  SELECT word, len(arg_max(syms, k))::BIGINT AS n_subtok
         |  FROM enc GROUP BY word
         |), stream AS (
         |  SELECT doc_id, UNNEST($toks) AS word FROM documents
         |)
         |SELECT s.doc_id, COUNT(*)::BIGINT AS n_words, SUM(wl.n_subtok)::BIGINT AS n_bpe_tokens
         |FROM stream s JOIN wordlens wl USING (word)
         |WHERE length(s.word) > 0
         |GROUP BY s.doc_id""".stripMargin,
    "d1_text_stats" ->
      s"""SELECT doc_id, lang,
         |  len($toks)::BIGINT AS n_tokens,
         |  round(len(list_distinct($toks))::DOUBLE / len($toks), 6) AS distinct_ratio,
         |  round(len(list_filter($toks, t -> list_contains($enList, t)))::DOUBLE / len($toks), 6) AS stopword_ratio,
         |  round(0.4 * least(1.0, len($toks)::DOUBLE / 100.0)
         |      + 0.3 * (len(list_distinct($toks))::DOUBLE / len($toks))
         |      + 0.3 * least(1.0, (len(list_filter($toks, t -> list_contains($enList, t)))::DOUBLE / len($toks)) * 10.0),
         |    6) AS quality_score,
         |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS n_subtokens
         |FROM documents""".stripMargin,
    "d2_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
        |       MIN(doc_id) AS keep_id, COUNT(*) AS n_copies, COUNT(*) - 1 AS n_duplicates
        |FROM documents GROUP BY 1""".stripMargin,
    "d3_minhash_lsh" -> {
      val p = graft.functions.Dedup.minhashPrime
      val minList = graft.functions.Dedup
        .minhashCoeffs(16)
        .map { case (a, b) => s"MIN((h * $a + $b) % $p)" }
        .mkString("[", ", ", "]")
      s"""$shingleCte, hashed AS (
         |  SELECT doc_id, ('0x' || substr(md5(UNNEST(shingles)), 1, 7))::BIGINT AS h FROM sh
         |), sigs AS (
         |  SELECT doc_id, $minList AS sig FROM hashed GROUP BY doc_id
         |), banded AS (
         |  SELECT doc_id, b.band,
         |         ${phash("array_to_string(sig[b.band * 2 + 1 : b.band * 2 + 2], '_')")} AS bucket
         |  FROM sigs, (SELECT UNNEST(generate_series(0, 7)) AS band) b
         |), pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
         |  FROM banded a JOIN banded c ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id
         |)
         |SELECT p.id_a, p.id_b,
         |       round(len(list_filter(generate_series(1, 16), i -> sa.sig[i] = sb.sig[i]))::DOUBLE / 16, 6) AS est_jaccard
         |FROM pairs p
         |JOIN sigs sa ON sa.doc_id = p.id_a
         |JOIN sigs sb ON sb.doc_id = p.id_b""".stripMargin
    },
    "d55_threshold_sweep" -> {
      val p = graft.functions.Dedup.minhashPrime
      val minList = graft.functions.Dedup
        .minhashCoeffs(16)
        .map { case (a, b) => s"MIN((h * $a + $b) % $p)" }
        .mkString("[", ", ", "]")
      s"""$shingleCte, hashed AS (
         |  SELECT doc_id, ('0x' || substr(md5(UNNEST(shingles)), 1, 7))::BIGINT AS h FROM sh
         |), sigs AS (
         |  SELECT doc_id, $minList AS sig FROM hashed GROUP BY doc_id
         |), banded AS (
         |  SELECT doc_id, b.band,
         |         ${phash("array_to_string(sig[b.band * 2 + 1 : b.band * 2 + 2], '_')")} AS bucket
         |  FROM sigs, (SELECT UNNEST(generate_series(0, 7)) AS band) b
         |), pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
         |  FROM banded a JOIN banded c ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id
         |), scored AS (
         |  SELECT p.id_a, p.id_b,
         |         round(len(list_filter(generate_series(1, 16), i -> sa.sig[i] = sb.sig[i]))::DOUBLE / 16, 6) AS ej
         |  FROM pairs p
         |  JOIN sigs sa ON sa.doc_id = p.id_a
         |  JOIN sigs sb ON sb.doc_id = p.id_b
         |), swept AS (
         |  SELECT s.id_a, s.id_b, s.ej, t.threshold
         |  FROM scored s, (SELECT UNNEST([0.3, 0.5, 0.7, 0.9]) AS threshold) t
         |  WHERE s.ej >= t.threshold
         |)
         |, aff AS (
         |  SELECT threshold, COUNT(DISTINCT id) AS n_docs_affected
         |  FROM (SELECT threshold, UNNEST([id_a, id_b]) AS id FROM swept)
         |  GROUP BY threshold
         |), np AS (
         |  SELECT threshold, COUNT(*) AS n_pairs FROM swept GROUP BY threshold
         |)
         |SELECT round(np.threshold, 2) AS threshold, np.n_pairs, aff.n_docs_affected
         |FROM np JOIN aff USING (threshold)""".stripMargin
    },
    "d4_simhash" ->
      s"""WITH h AS (
         |  SELECT doc_id, list_transform($toks, t -> ${phash("t")}) AS hashes
         |  FROM documents
         |)
         |SELECT doc_id,
         |       CAST(list_sum(list_transform(generate_series(0, 59),
         |         b -> CASE WHEN 2 * len(list_filter(hashes, x -> (x >> b) & 1 = 1)) > len(hashes)
         |                   THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash
         |FROM h""".stripMargin,
    "d5_ngram_jaccard" -> {
      val p = graft.functions.Dedup.minhashPrime
      val minList = graft.functions.Dedup
        .minhashCoeffs(16)
        .map { case (a, b) => s"MIN((h * $a + $b) % $p)" }
        .mkString("[", ", ", "]")
      s"""$shingleCte, hashed AS (
         |  SELECT doc_id, ('0x' || substr(md5(UNNEST(shingles)), 1, 7))::BIGINT AS h FROM sh
         |), sigs AS (
         |  SELECT doc_id, $minList AS sig FROM hashed GROUP BY doc_id
         |), banded AS (
         |  SELECT doc_id, b.band,
         |         ${phash("array_to_string(sig[b.band * 2 + 1 : b.band * 2 + 2], '_')")} AS bucket
         |  FROM sigs, (SELECT UNNEST(generate_series(0, 7)) AS band) b
         |), pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
         |  FROM banded a JOIN banded c ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id
         |)
         |SELECT p.id_a, p.id_b,
         |       round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
         |             len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
         |FROM pairs p JOIN sh a ON a.doc_id = p.id_a JOIN sh b ON b.doc_id = p.id_b""".stripMargin
    },
    "d6_embed_topk" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |         round(list_sum(list_transform(generate_series(1, 64), i -> c.vec[i] * q.vec[i])) /
        |               (sqrt(list_sum(list_transform(generate_series(1, 64), i -> c.vec[i] * c.vec[i]))) *
        |                sqrt(list_sum(list_transform(generate_series(1, 64), i -> q.vec[i] * q.vec[i])))), 6) AS cos_sim
        |  FROM v c CROSS JOIN (SELECT * FROM v WHERE vec_id < 10) q
        |  WHERE c.vec_id <> q.vec_id
        |), ranked AS (
        |  SELECT query_id, corpus_id, cos_sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, corpus_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank::BIGINT AS rank, corpus_id, cos_sim FROM ranked WHERE rank <= 5""".stripMargin,
    "d45_jl_project" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
         |d AS (SELECT UNNEST(generate_series(0, 15)) AS dim)
         |SELECT v.vec_id, d.dim,
         |       round(list_sum(list_transform(generate_series(0, 63), i ->
         |               v.vec[i + 1] *
         |               (CASE WHEN ${phash("'jl:' || CAST(i AS VARCHAR) || ':' || CAST(d.dim AS VARCHAR)")} % 2 = 0
         |                     THEN 1.0 ELSE -1.0 END))) / sqrt(16.0), 6) AS value
         |FROM v CROSS JOIN d""".stripMargin,
    "d41_hard_negatives" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec, label FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, q.label AS query_label,
        |         c.vec_id AS corpus_id, c.label AS corpus_label,
        |         round(list_sum(list_transform(generate_series(1, 64), i -> c.vec[i] * q.vec[i])) /
        |               (sqrt(list_sum(list_transform(generate_series(1, 64), i -> c.vec[i] * c.vec[i]))) *
        |                sqrt(list_sum(list_transform(generate_series(1, 64), i -> q.vec[i] * q.vec[i])))), 6) AS cos_sim
        |  FROM v c CROSS JOIN (SELECT * FROM v WHERE vec_id < 10) q
        |  WHERE c.vec_id <> q.vec_id AND c.label <> q.label
        |), ranked AS (
        |  SELECT query_id, query_label, corpus_id, corpus_label, cos_sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, corpus_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, query_label, rank::BIGINT AS rank, corpus_id, corpus_label, cos_sim
        |FROM ranked WHERE rank <= 5""".stripMargin,
    // d64: the d14 banded-LSH candidate replay, then label filter, then
    // re-rank — candidates are ranked top-20 BEFORE the label filter
    // (exactly the Spark operator's order)
    "d64_hard_negatives_ann" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec, label FROM embeddings),
        |cb AS (
        |  SELECT vec_id, b.band,
        |         CAST(list_sum(list_transform(generate_series(0, 5),
        |           i -> CASE WHEN vec[b.band * 6 + i + 1] >= 0 THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS bucket
        |  FROM v, (SELECT UNNEST(generate_series(0, 9)) AS band) b
        |), qb AS (
        |  SELECT vec_id, band,
        |         UNNEST(list_concat([bucket],
        |           list_transform(generate_series(0, 5), i -> xor(bucket, 1::BIGINT << i)))) AS bucket
        |  FROM cb WHERE vec_id < 10
        |), pairs AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS corpus_id
        |  FROM cb c JOIN qb q ON c.band = q.band AND c.bucket = q.bucket
        |  WHERE c.vec_id <> q.vec_id
        |), scored AS (
        |  SELECT p.query_id, p.corpus_id,
        |         round(list_sum(list_transform(generate_series(1, 64), i -> cv.vec[i] * qv.vec[i])) /
        |               (sqrt(list_sum(list_transform(generate_series(1, 64), i -> cv.vec[i] * cv.vec[i]))) *
        |                sqrt(list_sum(list_transform(generate_series(1, 64), i -> qv.vec[i] * qv.vec[i])))), 6) AS cos_sim
        |  FROM pairs p JOIN v cv ON cv.vec_id = p.corpus_id JOIN v qv ON qv.vec_id = p.query_id
        |), cand AS (
        |  SELECT query_id, corpus_id, cos_sim FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, corpus_id ASC) AS r
        |    FROM scored) WHERE r <= 20
        |), negs AS (
        |  SELECT c.query_id, qv.label AS query_label, c.corpus_id,
        |         cv.label AS corpus_label, c.cos_sim
        |  FROM cand c
        |  JOIN v cv ON cv.vec_id = c.corpus_id
        |  JOIN v qv ON qv.vec_id = c.query_id
        |  WHERE cv.label <> qv.label
        |), ranked AS (
        |  SELECT query_id, query_label, corpus_id, corpus_label, cos_sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, corpus_id ASC) AS rank
        |  FROM negs
        |)
        |SELECT query_id, query_label, rank::BIGINT AS rank, corpus_id, corpus_label, cos_sim
        |FROM ranked WHERE rank <= 5""".stripMargin,
    "d7_embed_lsh" ->
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS vec,
        |         CAST(list_sum(list_transform(generate_series(0, 7),
        |           i -> CASE WHEN embedding[i + 1] >= 0 THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS bucket
        |  FROM embeddings
        |), scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |         round(list_sum(list_transform(generate_series(1, 64), i -> c.vec[i] * q.vec[i])) /
        |               (sqrt(list_sum(list_transform(generate_series(1, 64), i -> c.vec[i] * c.vec[i]))) *
        |                sqrt(list_sum(list_transform(generate_series(1, 64), i -> q.vec[i] * q.vec[i])))), 6) AS cos_sim
        |  FROM v c JOIN (SELECT * FROM v WHERE vec_id < 10) q ON c.bucket = q.bucket
        |  WHERE c.vec_id <> q.vec_id
        |), ranked AS (
        |  SELECT query_id, corpus_id, cos_sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, corpus_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank::BIGINT AS rank, corpus_id, cos_sim FROM ranked WHERE rank <= 5""".stripMargin,
    "d11_embed_ivf" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        |cents AS (SELECT vec_id AS cid, vec AS centv FROM v WHERE vec_id < 16),
        |cscore AS (
        |  SELECT v.vec_id, v.vec, c.cid,
        |         round(list_sum(list_transform(generate_series(1, 64), i -> v.vec[i] * c.centv[i])) /
        |               (sqrt(list_sum(list_transform(generate_series(1, 64), i -> v.vec[i] * v.vec[i]))) *
        |                sqrt(list_sum(list_transform(generate_series(1, 64), i -> c.centv[i] * c.centv[i])))), 6) AS ccos
        |  FROM v CROSS JOIN cents c
        |), assigned AS (
        |  SELECT vec_id AS corpus_id, vec AS cvec, cid AS bucket FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crn
        |    FROM cscore) WHERE crn <= 1
        |), probes AS (
        |  SELECT vec_id AS query_id, vec AS qvec, cid AS bucket FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crn
        |    FROM cscore WHERE vec_id < 10) WHERE crn <= 2
        |), scored AS (
        |  SELECT DISTINCT p.query_id, a.corpus_id,
        |         round(list_sum(list_transform(generate_series(1, 64), i -> a.cvec[i] * p.qvec[i])) /
        |               (sqrt(list_sum(list_transform(generate_series(1, 64), i -> a.cvec[i] * a.cvec[i]))) *
        |                sqrt(list_sum(list_transform(generate_series(1, 64), i -> p.qvec[i] * p.qvec[i])))), 6) AS cos_sim
        |  FROM assigned a JOIN probes p ON a.bucket = p.bucket
        |  WHERE a.corpus_id <> p.query_id
        |), ranked AS (
        |  SELECT query_id, corpus_id, cos_sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, corpus_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank::BIGINT AS rank, corpus_id, cos_sim FROM ranked WHERE rank <= 5""".stripMargin,
    "d14_embed_lsh_bands" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        |cb AS (
        |  SELECT vec_id, b.band,
        |         CAST(list_sum(list_transform(generate_series(0, 5),
        |           i -> CASE WHEN vec[b.band * 6 + i + 1] >= 0 THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS bucket
        |  FROM v, (SELECT UNNEST(generate_series(0, 9)) AS band) b
        |), qb AS (
        |  SELECT vec_id, band,
        |         UNNEST(list_concat([bucket],
        |           list_transform(generate_series(0, 5), i -> xor(bucket, 1::BIGINT << i)))) AS bucket
        |  FROM cb WHERE vec_id < 10
        |), pairs AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS corpus_id
        |  FROM cb c JOIN qb q ON c.band = q.band AND c.bucket = q.bucket
        |  WHERE c.vec_id <> q.vec_id
        |), scored AS (
        |  SELECT p.query_id, p.corpus_id,
        |         round(list_sum(list_transform(generate_series(1, 64), i -> cv.vec[i] * qv.vec[i])) /
        |               (sqrt(list_sum(list_transform(generate_series(1, 64), i -> cv.vec[i] * cv.vec[i]))) *
        |                sqrt(list_sum(list_transform(generate_series(1, 64), i -> qv.vec[i] * qv.vec[i])))), 6) AS cos_sim
        |  FROM pairs p JOIN v cv ON cv.vec_id = p.corpus_id JOIN v qv ON qv.vec_id = p.query_id
        |), ranked AS (
        |  SELECT query_id, corpus_id, cos_sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, corpus_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank::BIGINT AS rank, corpus_id, cos_sim FROM ranked WHERE rank <= 5""".stripMargin,
    "d10_embed_neardup" ->
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS vec,
        |         CAST(list_sum(list_transform(generate_series(0, 5),
        |           i -> CASE WHEN embedding[i + 1] >= 0 THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS bucket
        |  FROM embeddings
        |)
        |SELECT * FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         round(list_sum(list_transform(generate_series(1, 64), i -> a.vec[i] * b.vec[i])) /
        |               (sqrt(list_sum(list_transform(generate_series(1, 64), i -> a.vec[i] * a.vec[i]))) *
        |                sqrt(list_sum(list_transform(generate_series(1, 64), i -> b.vec[i] * b.vec[i])))), 6) AS cos_sim
        |  FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |) WHERE cos_sim >= 0.3""".stripMargin,
    "d16_embed_neardup_bands" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        |cb AS (
        |  SELECT vec_id, b.band,
        |         CAST(list_sum(list_transform(generate_series(0, 3),
        |           i -> CASE WHEN vec[b.band * 4 + i + 1] >= 0 THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS bucket
        |  FROM v, (SELECT UNNEST(generate_series(0, 15)) AS band) b
        |), pairs AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM cb a JOIN cb b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
        |)
        |SELECT * FROM (
        |  SELECT p.id_a, p.id_b,
        |         round(list_sum(list_transform(generate_series(1, 64), i -> av.vec[i] * bv.vec[i])) /
        |               (sqrt(list_sum(list_transform(generate_series(1, 64), i -> av.vec[i] * av.vec[i]))) *
        |                sqrt(list_sum(list_transform(generate_series(1, 64), i -> bv.vec[i] * bv.vec[i])))), 6) AS cos_sim
        |  FROM pairs p JOIN v av ON av.vec_id = p.id_a JOIN v bv ON bv.vec_id = p.id_b
        |) WHERE cos_sim >= 0.3""".stripMargin,
    "d25_embed_dedup_groups" ->
      """WITH RECURSIVE v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        |cb AS (
        |  SELECT vec_id, b.band,
        |         CAST(list_sum(list_transform(generate_series(0, 3),
        |           i -> CASE WHEN vec[b.band * 4 + i + 1] >= 0 THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS bucket
        |  FROM v, (SELECT UNNEST(generate_series(0, 15)) AS band) b
        |), cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM cb a JOIN cb b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
        |), pairs AS (
        |  SELECT * FROM (
        |    SELECT p.id_a, p.id_b,
        |           round(list_sum(list_transform(generate_series(1, 64), i -> av.vec[i] * bv.vec[i])) /
        |                 (sqrt(list_sum(list_transform(generate_series(1, 64), i -> av.vec[i] * av.vec[i]))) *
        |                  sqrt(list_sum(list_transform(generate_series(1, 64), i -> bv.vec[i] * bv.vec[i])))), 6) AS cos_sim
        |    FROM cand p JOIN v av ON av.vec_id = p.id_a JOIN v bv ON bv.vec_id = p.id_b
        |  ) WHERE cos_sim >= 0.3
        |), edges AS (
        |  SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs
        |), reach(u, v) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u
        |), comp AS (
        |  SELECT u AS id, least(u, MIN(v)) AS group_id FROM reach GROUP BY u
        |), g AS (
        |  SELECT e.vec_id, coalesce(c.group_id, e.vec_id) AS group_id
        |  FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.id
        |)
        |SELECT vec_id, group_id,
        |       COUNT(*) OVER (PARTITION BY group_id) AS group_size,
        |       CASE WHEN vec_id = group_id THEN 1::BIGINT ELSE 0::BIGINT END AS is_canonical
        |FROM g""".stripMargin,
    "d12_tfidf" ->
      s"""WITH dt AS (
         |  SELECT doc_id AS id, UNNEST($toks) AS term FROM documents
         |), doc_terms AS (
         |  SELECT id, term, COUNT(*) AS tf FROM dt GROUP BY id, term
         |), doc_freq AS (
         |  SELECT term, COUNT(*) AS df FROM doc_terms GROUP BY term
         |), n AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents),
         |scored AS (
         |  SELECT t.id, t.term, t.tf, f.df, t.tf * ln(n.n_docs / f.df) AS tfidf
         |  FROM doc_terms t JOIN doc_freq f USING (term) CROSS JOIN n
         |), ranked AS (
         |  SELECT id, term, tf, df, round(tfidf, 6) AS tfidf,
         |         row_number() OVER (PARTITION BY id ORDER BY round(tfidf, 6) DESC, term ASC) AS term_rank
         |  FROM scored
         |)
         |SELECT id AS doc_id, term, tf, df, tfidf, term_rank FROM ranked WHERE term_rank <= 3""".stripMargin,
    // d66: full BM25 replay — identical postings/df/avgdl tables, the
    // per-term contribution integerized to micro-units in BOTH engines
    // (order-free integer sum), idf/tf_part float ops mirrored
    // textually in Spark's evaluation order, every literal ::DOUBLE
    // (the q45 decimal trap)
    "d66_bm25" ->
      s"""$bm25Cte
         |SELECT query_id, query, doc_id, n_terms_matched,
         |       round(su::DOUBLE / 1e6, 6) AS score, rank
         |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // d67: the d66 pipeline replayed, then the metric fold — AND-
    // relevance qrels, micro-unit DCG gains (ln at round-6 micro
    // granularity, the d12 contract), integer DCG/IDCG sums, NULL
    // recall/ndcg for the empty-qrel query
    "d67_retrieval_eval" ->
      s"""$bm25Cte, ranked AS (
         |  SELECT query_id, doc_id, rank FROM rk WHERE rank <= 5
         |), nqv AS (
         |  SELECT query_id, COUNT(DISTINCT term) AS nq FROM qt GROUP BY 1
         |), dterm AS (
         |  SELECT DISTINCT doc_id, UNNEST(toks) AS term FROM dt
         |), qrel AS (
         |  SELECT c.query_id, c.doc_id FROM (
         |    SELECT qt2.query_id, d.doc_id, COUNT(DISTINCT d.term) AS nm
         |    FROM dterm d JOIN (SELECT DISTINCT query_id, term FROM qt) qt2
         |      ON d.term = qt2.term
         |    GROUP BY 1, 2) c
         |  JOIN nqv ON nqv.query_id = c.query_id
         |  WHERE c.nm = nqv.nq
         |), nrel AS (
         |  SELECT query_id, COUNT(*)::BIGINT AS n_rel FROM qrel GROUP BY 1
         |), j AS (
         |  SELECT r.query_id, r.rank,
         |         CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
         |  FROM ranked r
         |  LEFT JOIN qrel g ON g.query_id = r.query_id AND g.doc_id = r.doc_id
         |), pq AS (
         |  SELECT query_id, SUM(rel)::BIGINT AS hits,
         |         MIN(CASE WHEN rel = 1 THEN rank END) AS first_rel_rank,
         |         SUM(CASE WHEN rel = 1 THEN
         |           CAST(round(1e6::DOUBLE / (ln((rank + 1)::DOUBLE) / ln(2::DOUBLE))) AS BIGINT)
         |           ELSE 0 END)::BIGINT AS dcg_u
         |  FROM j GROUP BY 1
         |), idcg AS (
         |  SELECT n.query_id,
         |         SUM(CAST(round(1e6::DOUBLE / (ln((p.p + 1)::DOUBLE) / ln(2::DOUBLE))) AS BIGINT))::BIGINT AS idcg_u
         |  FROM nrel n JOIN (SELECT UNNEST(range(1, 6)) AS p) p
         |    ON p.p <= LEAST(n.n_rel, 5)
         |  GROUP BY 1
         |)
         |-- FULL join mirrors Spark's full_outer: a query with qrels but
         |-- ZERO ranked rows must surface as hits=0 / recall=0 / rr=0 /
         |-- ndcg=0 (unreachable under today's AND-relevance qrels, which
         |-- guarantee ranked candidates, but the library explicitly
         |-- supports the zero-ranked edge — so the gate replays it too)
         |SELECT COALESCE(p.query_id, n.query_id) AS query_id,
         |       COALESCE(n.n_rel, 0)::BIGINT AS n_rel,
         |       COALESCE(p.hits, 0)::BIGINT AS hits,
         |       round(COALESCE(p.hits, 0)::DOUBLE / 5, 6) AS precision_at_k,
         |       CASE WHEN n.n_rel > 0
         |            THEN round(COALESCE(p.hits, 0)::DOUBLE / n.n_rel, 6) END AS recall_at_k,
         |       round(COALESCE(1.0::DOUBLE / p.first_rel_rank, 0::DOUBLE), 6) AS rr,
         |       CASE WHEN n.n_rel > 0
         |            THEN round(COALESCE(p.dcg_u, 0)::DOUBLE / i.idcg_u, 6) END AS ndcg_at_k
         |FROM pq p
         |FULL JOIN nrel n ON n.query_id = p.query_id
         |LEFT JOIN idcg i ON i.query_id = COALESCE(p.query_id, n.query_id)
         |ORDER BY 1""".stripMargin,
    // d68: both rankers replayed (BM25 from rk, Jaccard from the same
    // dt/qt), micro-unit RRF contributions, integer fused sums
    "d68_rrf_hybrid" ->
      s"""$bm25Cte, jd AS (
         |  SELECT doc_id, len(list_distinct(toks))::BIGINT AS dn,
         |         UNNEST(list_distinct(toks)) AS term
         |  FROM dt
         |), qdist AS (
         |  SELECT DISTINCT query_id, term FROM qt
         |), jqn AS (
         |  SELECT query_id, COUNT(*)::BIGINT AS nq FROM qdist GROUP BY 1
         |), jm AS (
         |  SELECT q2.query_id, d.doc_id, d.dn, n.nq, COUNT(*)::BIGINT AS nm
         |  FROM jd d
         |  JOIN qdist q2 ON d.term = q2.term
         |  JOIN jqn n ON n.query_id = q2.query_id
         |  GROUP BY 1, 2, 3, 4
         |), jrk AS (
         |  SELECT query_id, doc_id,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY (nm::DOUBLE / (dn + nq - nm)) DESC, doc_id ASC)::BIGINT AS rank
         |  FROM jm
         |), ju AS (
         |  SELECT query_id, doc_id,
         |         CAST(round(1e6::DOUBLE / (60::DOUBLE + rank::DOUBLE)) AS BIGINT) AS cu
         |  FROM jrk WHERE rank <= 20
         |  UNION ALL
         |  SELECT query_id, doc_id,
         |         CAST(round(1e6::DOUBLE / (60::DOUBLE + rank::DOUBLE)) AS BIGINT)
         |  FROM rk WHERE rank <= 20
         |), fused AS (
         |  SELECT query_id, doc_id, SUM(cu)::BIGINT AS su, COUNT(*)::BIGINT AS n_lists
         |  FROM ju GROUP BY 1, 2
         |), frk AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |           ORDER BY su DESC, doc_id ASC)::BIGINT AS rank
         |  FROM fused
         |)
         |SELECT query_id, doc_id, n_lists,
         |       round(su::DOUBLE / 1e6, 6) AS rrf_score, rank
         |FROM frk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // d69: the oracle is the WHOLE-corpus d66 replay — Spark computes
    // the ranking from three doc-disjoint index splits with additively
    // folded stats, so equality IS the split-invariance proof
    "d69_bm25_index" ->
      s"""$bm25Cte
         |SELECT query_id, query, doc_id, n_terms_matched,
         |       round(su::DOUBLE / 1e6, 6) AS score, rank
         |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // d70: positional postings via DuckDB's zipped parallel UNNESTs,
    // the same anchor trick (a posting for offset-j at position p
    // witnesses anchor p−j; an occurrence = an anchor with ALL
    // distinct offsets witnessed) — all-integer, bit-exact
    "d70_phrase" ->
      s"""${phraseCte(
             """(1::BIGINT, 'table table'),
               |    (2::BIGINT, 'fast table'),
               |    (3::BIGINT, 'key agg row scan'),
               |    (4::BIGINT, 'vector'),
               |    (5::BIGINT, 'spark missingterm')""".stripMargin)}
         |SELECT phrase_id, phrase, doc_id,
         |       COUNT(*)::BIGINT AS n_occurrences, MIN(anchor)::BIGINT AS first_pos
         |FROM occ WHERE n_off = p_len
         |GROUP BY 1, 2, 3
         |ORDER BY phrase_id, doc_id""".stripMargin,
    // d73: the d70 chain reduced to first hits, then an in-row list
    // slice clamped to the doc bounds — integer offsets, bit-stable
    // snippet strings
    "d73_snippets" ->
      s"""${phraseCte(
             """(1::BIGINT, 'table table'),
               |    (2::BIGINT, 'fast table'),
               |    (3::BIGINT, 'key agg row scan')""".stripMargin)}, res AS (
         |  SELECT phrase_id, phrase, p_len, doc_id, MIN(anchor)::BIGINT AS first_pos
         |  FROM occ WHERE n_off = p_len
         |  GROUP BY 1, 2, 3, 4
         |), sn AS (
         |  SELECT r.phrase_id, r.phrase, r.doc_id, r.first_pos, r.p_len,
         |         GREATEST(r.first_pos - 3, 0)::BIGINT AS snippet_start, d.toks
         |  FROM res r JOIN dt d ON d.doc_id = r.doc_id
         |)
         |SELECT phrase_id, phrase, doc_id, first_pos, snippet_start,
         |       array_to_string(
         |         toks[(snippet_start + 1)::INT : (first_pos + p_len + 3)::INT],
         |         ' ') AS snippet
         |FROM sn ORDER BY phrase_id, doc_id""".stripMargin,
    // d77: the oracle is the SAME whole-corpus replay as d69 — Spark
    // serves from the compacted on-disk store (manifest-resolved c-dir
    // + the live newest b-dir, stored additive df), so equality is the
    // absorb-invariance proof for the whole disk layer
    "d77_bm25_compacted" ->
      s"""$bm25Cte
         |SELECT query_id, query, doc_id, n_terms_matched,
         |       round(su::DOUBLE / 1e6, 6) AS score, rank
         |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // d78: the whole-corpus d70 replay — Spark serves the phrase audit
    // from the compacted positional store (term-re-clustered on merge)
    "d78_phrase_compacted" ->
      s"""${phraseCte(
             """(1::BIGINT, 'table table'),
               |    (2::BIGINT, 'fast table'),
               |    (3::BIGINT, 'key agg row scan'),
               |    (4::BIGINT, 'vector'),
               |    (5::BIGINT, 'spark missingterm')""".stripMargin)}
         |SELECT phrase_id, phrase, doc_id,
         |       COUNT(*)::BIGINT AS n_occurrences, MIN(anchor)::BIGINT AS first_pos
         |FROM occ WHERE n_off = p_len
         |GROUP BY 1, 2, 3
         |ORDER BY phrase_id, doc_id""".stripMargin,
    // d79: the whole-corpus d70 replay again — Spark serves through the
    // anchor-fp candidate probe + exact verify, so equality proves the
    // anchor layer has no false negatives and every collision dies in
    // the verify
    "d79_phrase_anchors" -> anchorPhraseReplaySql,
    // d81: the SAME replay — serving through compacted anchor +
    // positional c-dirs must be invisible
    "d81_phrase_anchors_compacted" -> anchorPhraseReplaySql,
    // d75: the oracle is the WHOLE-corpus d70 replay — Spark scores
    // from three doc-disjoint positional-postings splits, so equality
    // IS the split-invariance proof for the positional index
    "d75_phrase_index" ->
      s"""${phraseCte(
             """(1::BIGINT, 'table table'),
               |    (2::BIGINT, 'fast table'),
               |    (3::BIGINT, 'key agg row scan'),
               |    (4::BIGINT, 'vector'),
               |    (5::BIGINT, 'spark missingterm')""".stripMargin)}
         |SELECT phrase_id, phrase, doc_id,
         |       COUNT(*)::BIGINT AS n_occurrences, MIN(anchor)::BIGINT AS first_pos
         |FROM occ WHERE n_off = p_len
         |GROUP BY 1, 2, 3
         |ORDER BY phrase_id, doc_id""".stripMargin,
    // d76: the d73 snippet replay — Spark reassembles the window from
    // stored positional postings instead of slicing the token array;
    // the strings must match byte-for-byte
    "d76_snippets_index" ->
      s"""${phraseCte(
             """(1::BIGINT, 'table table'),
               |    (2::BIGINT, 'fast table'),
               |    (3::BIGINT, 'key agg row scan')""".stripMargin)}, res AS (
         |  SELECT phrase_id, phrase, p_len, doc_id, MIN(anchor)::BIGINT AS first_pos
         |  FROM occ WHERE n_off = p_len
         |  GROUP BY 1, 2, 3, 4
         |), sn AS (
         |  SELECT r.phrase_id, r.phrase, r.doc_id, r.first_pos, r.p_len,
         |         GREATEST(r.first_pos - 3, 0)::BIGINT AS snippet_start, d.toks
         |  FROM res r JOIN dt d ON d.doc_id = r.doc_id
         |)
         |SELECT phrase_id, phrase, doc_id, first_pos, snippet_start,
         |       array_to_string(
         |         toks[(snippet_start + 1)::INT : (first_pos + p_len + 3)::INT],
         |         ' ') AS snippet
         |FROM sn ORDER BY phrase_id, doc_id""".stripMargin,
    // d74: per-doc distinct shingles (the shared 3-gram form) → df
    // counts → df==1 fold; exact integers, one rounded division
    "d74_novelty" ->
      s"""WITH sh AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(0, greatest(len($toks) - 3, 0)),
         |    i -> array_to_string(($toks)[i + 1 : i + 3], ' '))) AS shingles
         |  FROM documents
         |), ex AS (
         |  SELECT doc_id, UNNEST(shingles) AS g FROM sh
         |), dfv AS (
         |  SELECT g, COUNT(*)::BIGINT AS df FROM ex GROUP BY 1
         |)
         |SELECT e.doc_id,
         |       COUNT(*)::BIGINT AS n_shingles,
         |       SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_novel,
         |       round(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 6) AS novelty
         |FROM ex e JOIN dfv d ON d.g = e.g
         |GROUP BY 1""".stripMargin,
    // d72: exact integer counts, the PMI argument in ONE pinned float
    // order (cab·T·T)/(B·ca·cb), one ln, round-6 ordering with term
    // tie-breaks; bigrams via zipped parallel UNNESTs of the two
    // array slices
    "d72_pmi" ->
      s"""WITH dt AS (
         |  SELECT $toks AS toks FROM documents
         |), uni AS (
         |  SELECT UNNEST(toks) AS term FROM dt
         |), uc AS (
         |  SELECT term, COUNT(*)::BIGINT AS c FROM uni GROUP BY 1
         |), bgall AS (
         |  SELECT t1, t2, COUNT(*)::BIGINT AS c_ab FROM (
         |    SELECT UNNEST(toks[1:len(toks) - 1]) AS t1,
         |           UNNEST(toks[2:len(toks)]) AS t2
         |    FROM dt WHERE len(toks) >= 2
         |  ) GROUP BY 1, 2
         |), tot AS (
         |  SELECT (SELECT SUM(c) FROM uc)::BIGINT AS t_total,
         |         (SELECT SUM(c_ab) FROM bgall)::BIGINT AS b_total
         |), scored AS (
         |  SELECT b.t1, b.t2, b.c_ab, a.c AS c_a, c.c AS c_b,
         |         round(ln((b.c_ab::DOUBLE * t.t_total::DOUBLE * t.t_total::DOUBLE)
         |                  / (t.b_total::DOUBLE * a.c::DOUBLE * c.c::DOUBLE)), 6) AS pmi
         |  FROM bgall b
         |  JOIN uc a ON a.term = b.t1
         |  JOIN uc c ON c.term = b.t2
         |  CROSS JOIN tot t
         |  WHERE b.c_ab >= 5
         |)
         |SELECT t1, t2, c_ab, c_a, c_b, pmi FROM scored
         |ORDER BY pmi DESC, t1 ASC, t2 ASC
         |LIMIT 50""".stripMargin,
    // d71: the d66 pipeline re-parameterized with seed-doc texts as
    // queries (lexical leg, self dropped after ranking), the d6 cosine
    // convention for the semantic leg, the d68 RRF fold to fuse
    "d71_more_like_this" ->
      s"""${bm25CteWith("SELECT doc_id, text FROM documents WHERE doc_id IN (7, 123, 321)")}, lex AS (
         |  SELECT query_id, doc_id,
         |         CAST(round(1e6::DOUBLE / (60::DOUBLE + rank::DOUBLE)) AS BIGINT) AS cu
         |  FROM rk WHERE rank <= 21 AND doc_id <> query_id
         |), v AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
         |), sem_scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         |         round(list_sum(list_transform(generate_series(1, 64), i -> c.vec[i] * q.vec[i])) /
         |               (sqrt(list_sum(list_transform(generate_series(1, 64), i -> c.vec[i] * c.vec[i]))) *
         |                sqrt(list_sum(list_transform(generate_series(1, 64), i -> q.vec[i] * q.vec[i])))), 6) AS cos_sim
         |  FROM v c CROSS JOIN (SELECT * FROM v WHERE vec_id IN (7, 123, 321)) q
         |  WHERE c.vec_id <> q.vec_id
         |), sem AS (
         |  SELECT query_id, doc_id,
         |         CAST(round(1e6::DOUBLE / (60::DOUBLE + rank::DOUBLE)) AS BIGINT) AS cu
         |  FROM (
         |    SELECT query_id, doc_id,
         |           row_number() OVER (PARTITION BY query_id
         |             ORDER BY cos_sim DESC, doc_id ASC)::BIGINT AS rank
         |    FROM sem_scored)
         |  WHERE rank <= 20
         |), fused AS (
         |  SELECT query_id, doc_id, SUM(cu)::BIGINT AS su, COUNT(*)::BIGINT AS n_lists
         |  FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem) u
         |  GROUP BY 1, 2
         |), frk AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |           ORDER BY su DESC, doc_id ASC)::BIGINT AS rank
         |  FROM fused
         |)
         |SELECT query_id, doc_id, n_lists,
         |       round(su::DOUBLE / 1e6, 6) AS rrf_score, rank
         |FROM frk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "d8_lang_id" -> {
      def hits(l: String) = {
        val list = TF.stopwords(l).map(w => s"'$w'").mkString("[", ", ", "]")
        s"len(list_filter($toks, t -> list_contains($list, t)))"
      }
      s"""WITH scored AS (
         |  SELECT lang, ${hits("en")} AS s_en, ${hits("de")} AS s_de,
         |         ${hits("fr")} AS s_fr, ${hits("es")} AS s_es
         |  FROM documents
         |), pred AS (
         |  SELECT lang,
         |         CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und'
         |              WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
         |              WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
         |              WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
         |              WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
         |              ELSE 'und' END AS predicted
         |  FROM scored
         |)
         |SELECT lang, predicted, COUNT(*) AS n_docs FROM pred GROUP BY 1, 2""".stripMargin
    },
    "d9_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |FROM documents""".stripMargin,
    "d13_curation" -> {
      val p = graft.functions.Dedup.minhashPrime
      val minList = graft.functions.Dedup
        .minhashCoeffs(16)
        .map { case (a, b) => s"MIN((h * $a + $b) % $p)" }
        .mkString("[", ", ", "]")
      def hits(l: String) = {
        val list = TF.stopwords(l).map(w => s"'$w'").mkString("[", ", ", "]")
        s"len(list_filter($toks, t -> list_contains($list, t)))"
      }
      s"""$shingleCte, hashed AS (
         |  SELECT doc_id, ('0x' || substr(md5(UNNEST(shingles)), 1, 7))::BIGINT AS h FROM sh
         |), sigs AS (
         |  SELECT doc_id, $minList AS sig FROM hashed GROUP BY doc_id
         |), banded AS (
         |  SELECT doc_id, b.band,
         |         ${phash("array_to_string(sig[b.band * 2 + 1 : b.band * 2 + 2], '_')")} AS bucket
         |  FROM sigs, (SELECT UNNEST(generate_series(0, 7)) AS band) b
         |), pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
         |  FROM banded a JOIN banded c ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id
         |), drops AS (
         |  SELECT DISTINCT p.id_b AS drop_id FROM pairs p
         |  JOIN sigs sa ON sa.doc_id = p.id_a
         |  JOIN sigs sb ON sb.doc_id = p.id_b
         |  WHERE len(list_filter(generate_series(1, 16), i -> sa.sig[i] = sb.sig[i]))::DOUBLE / 16 >= 0.5
         |), scored AS (
         |  SELECT doc_id, source,
         |    round(0.4 * least(1.0, len($toks)::DOUBLE / 100.0)
         |        + 0.3 * (len(list_distinct($toks))::DOUBLE / len($toks))
         |        + 0.3 * least(1.0, (len(list_filter($toks, t -> list_contains($enList, t)))::DOUBLE / len($toks)) * 10.0),
         |      6) AS quality,
         |    CASE WHEN greatest(${hits("en")}, ${hits("de")}, ${hits("fr")}, ${hits("es")}) <= 0 THEN 'und'
         |         WHEN ${hits("en")} = greatest(${hits("en")}, ${hits("de")}, ${hits("fr")}, ${hits("es")}) THEN 'en'
         |         WHEN ${hits("de")} = greatest(${hits("en")}, ${hits("de")}, ${hits("fr")}, ${hits("es")}) THEN 'de'
         |         WHEN ${hits("fr")} = greatest(${hits("en")}, ${hits("de")}, ${hits("fr")}, ${hits("es")}) THEN 'fr'
         |         WHEN ${hits("es")} = greatest(${hits("en")}, ${hits("de")}, ${hits("fr")}, ${hits("es")}) THEN 'es'
         |         ELSE 'und' END AS predicted
         |  FROM documents
         |)
         |SELECT s.source, COUNT(*) AS n_docs,
         |       COUNT(CASE WHEN s.quality >= 0.6 AND s.predicted = 'en' AND d.drop_id IS NULL THEN 1 END) AS n_kept,
         |       round(AVG(s.quality), 6) AS avg_quality
         |FROM scored s LEFT JOIN drops d ON d.drop_id = s.doc_id
         |GROUP BY s.source""".stripMargin
    },
    "d17_hash_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${phash("CAST(doc_id AS VARCHAR)")} <
         |      CAST((CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
         |                      WHEN 'fr' THEN 0.125 ELSE 0.0 END)
         |           * 1152921504606846976 AS BIGINT)""".stripMargin,
    "d32_exact_sample" ->
      s"""WITH h AS (
         |  SELECT source, doc_id, ${phash("CAST(doc_id AS VARCHAR)")} AS ph FROM documents
         |), r AS (
         |  SELECT source, doc_id,
         |         row_number() OVER (PARTITION BY source ORDER BY ph, doc_id) AS rn
         |  FROM h
         |)
         |SELECT source, doc_id FROM r WHERE rn <= 25""".stripMargin,
    "d18_mixture" ->
      s"""WITH t AS (
         |  SELECT source AS stratum,
         |         CAST(SUM(len($toks)) AS BIGINT) AS stratum_tokens
         |  FROM documents GROUP BY source
         |), w AS (
         |  SELECT stratum, stratum_tokens,
         |         round(CASE stratum WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.3
         |                            WHEN 'src2' THEN 0.3 ELSE 0.0 END, 6) AS weight,
         |         round(least(1.0, CASE stratum WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.3
         |                                       WHEN 'src2' THEN 0.3 ELSE 0.0 END
         |                          * 10000 / stratum_tokens), 6) AS sample_rate
         |  FROM t
         |)
         |SELECT stratum, stratum_tokens, weight, sample_rate,
         |       CAST(round(sample_rate * stratum_tokens) AS BIGINT) AS expected_tokens
         |FROM w""".stripMargin,
    "d19_decontam" ->
      s"""WITH sh AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(0, greatest(len($toks) - 3, 0)),
         |    i -> array_to_string(($toks)[i + 1 : i + 3], ' '))) AS shingles
         |  FROM documents
         |), ev AS (
         |  SELECT DISTINCT UNNEST(shingles) AS g FROM sh WHERE doc_id % 97 = 0
         |), tr AS (
         |  SELECT doc_id, UNNEST(shingles) AS g FROM sh WHERE doc_id % 97 <> 0
         |), agg AS (
         |  SELECT t.doc_id, COUNT(*) AS n_grams, COUNT(e.g) AS n_contaminated
         |  FROM tr t LEFT JOIN ev e USING (g) GROUP BY t.doc_id
         |)
         |SELECT doc_id, n_grams, n_contaminated,
         |       round(n_contaminated::DOUBLE / n_grams, 6) AS contamination
         |FROM agg WHERE n_contaminated::DOUBLE >= n_grams * 0.03""".stripMargin,
    "d50_setsim_join" ->
      s"""$shingleCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
         |             len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE /
         |      len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.4""".stripMargin,
    "d49_domain_cap" ->
      s"""WITH scored AS (
         |  SELECT doc_id, source,
         |    round(0.4 * least(1.0, len($toks)::DOUBLE / 100.0)
         |        + 0.3 * (len(list_distinct($toks))::DOUBLE / len($toks))
         |        + 0.3 * least(1.0, (len(list_filter($toks, t -> list_contains($enList, t)))::DOUBLE / len($toks)) * 10.0),
         |      6) AS quality_score
         |  FROM documents
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY quality_score DESC, doc_id ASC) AS group_rank
         |  FROM scored
         |)
         |SELECT doc_id, source, quality_score, CAST(group_rank AS INTEGER) AS group_rank
         |FROM ranked WHERE group_rank <= 10""".stripMargin,
    "d48_fuzzy_decontam" -> {
      val p = graft.functions.Dedup.minhashPrime
      val minList = graft.functions.Dedup
        .minhashCoeffs(16)
        .map { case (a, b) => s"MIN((h * $a + $b) % $p)" }
        .mkString("[", ", ", "]")
      s"""$shingleCte, hashed AS (
         |  SELECT doc_id, ('0x' || substr(md5(UNNEST(shingles)), 1, 7))::BIGINT AS h FROM sh
         |), sigs AS (
         |  SELECT doc_id, $minList AS sig FROM hashed GROUP BY doc_id
         |), banded AS (
         |  SELECT doc_id, b.band,
         |         ${phash("array_to_string(sig[b.band * 2 + 1 : b.band * 2 + 2], '_')")} AS bucket
         |  FROM sigs, (SELECT UNNEST(generate_series(0, 7)) AS band) b
         |), cand AS (
         |  SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
         |  FROM banded t JOIN banded e ON t.band = e.band AND t.bucket = e.bucket
         |  WHERE t.doc_id % 10 <> 0 AND e.doc_id % 10 = 0
         |), scored AS (
         |  SELECT c.train_id, c.eval_id,
         |         len(list_intersect(a.shingles, b.shingles))::DOUBLE /
         |         len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
         |  FROM cand c JOIN sh a ON a.doc_id = c.train_id JOIN sh b ON b.doc_id = c.eval_id
         |)
         |SELECT train_id, COUNT(*) AS n_eval_matches, round(MAX(jaccard), 6) AS max_jaccard
         |FROM scored WHERE jaccard >= 0.2 GROUP BY train_id""".stripMargin
    },
    "d20_repetition" ->
      s"""WITH g2 AS (
         |  SELECT doc_id, UNNEST(list_transform(
         |    generate_series(0, greatest(len($toks) - 2, 0)),
         |    i -> array_to_string(($toks)[i + 1 : i + 2], ' '))) AS g
         |  FROM documents
         |), cnt AS (
         |  SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2
         |), top AS (
         |  SELECT doc_id, round(MAX(c)::DOUBLE / SUM(c)::DOUBLE, 6) AS top_bigram_frac
         |  FROM cnt GROUP BY 1
         |), s3 AS (
         |  SELECT doc_id, len($toks)::BIGINT AS n_tokens, list_transform(
         |    generate_series(0, greatest(len($toks) - 3, 0)),
         |    i -> array_to_string(($toks)[i + 1 : i + 3], ' ')) AS a3
         |  FROM documents
         |), dup AS (
         |  SELECT doc_id, n_tokens,
         |         round(1.0 - len(list_distinct(a3))::DOUBLE / len(a3), 6) AS dup_3gram_frac
         |  FROM s3
         |)
         |SELECT d.doc_id, d.n_tokens, d.dup_3gram_frac, t.top_bigram_frac,
         |       CASE WHEN d.n_tokens >= 20
         |             AND (t.top_bigram_frac > 0.08 OR d.dup_3gram_frac > 0.02)
         |            THEN 1::BIGINT ELSE 0::BIGINT END AS repetition_flag
         |FROM dup d JOIN top t USING (doc_id)""".stripMargin,
    "d28_vocab_stats" ->
      s"""WITH t AS (
         |  SELECT doc_id, UNNEST($toks) AS token FROM documents
         |), v AS (
         |  SELECT token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
         |  FROM t GROUP BY 1
         |)
         |SELECT token, n_occurrences, n_docs,
         |       (ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token ASC))::BIGINT AS freq_rank,
         |       round(n_occurrences::DOUBLE / SUM(n_occurrences) OVER (), 6) AS corpus_share
         |FROM v""".stripMargin,
    "d24_gopher_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, $toks AS tk, string_split(text, chr(10)) AS lines,
         |         (length(text) - length(replace(text, '#', '')))
         |           + (length(text) - length(replace(text, '...', ''))) // 3 AS n_symbols
         |  FROM documents
         |), m AS (
         |  SELECT doc_id,
         |         len(tk)::BIGINT AS n_words,
         |         CAST(list_sum(list_transform(tk, t -> length(t))) AS BIGINT) AS sum_len,
         |         len(list_filter(tk, t -> regexp_matches(t, '[a-z]')))::BIGINT AS n_alpha_words,
         |         len(list_filter(['the','be','to','of','and','that','have','with'],
         |                         w -> list_contains(tk, w)))::BIGINT AS n_stopwords_hit,
         |         len(lines)::BIGINT AS n_lines,
         |         len(list_filter(lines,
         |                         l -> list_contains(['-','*','•'], substr(ltrim(l), 1, 1))))::BIGINT AS n_bullet_lines,
         |         len(list_filter(lines, l -> ends_with(l, '...')))::BIGINT AS n_ellipsis_lines,
         |         n_symbols::BIGINT AS n_symbols
         |  FROM t
         |)
         |SELECT doc_id, n_words,
         |       round(sum_len::DOUBLE / n_words, 6) AS mean_word_len,
         |       round(n_symbols::DOUBLE / n_words, 6) AS symbol_ratio,
         |       round(n_bullet_lines::DOUBLE / n_lines, 6) AS bullet_line_frac,
         |       round(n_ellipsis_lines::DOUBLE / n_lines, 6) AS ellipsis_line_frac,
         |       round(n_alpha_words::DOUBLE / n_words, 6) AS alpha_word_frac,
         |       n_stopwords_hit,
         |       CASE WHEN n_words >= 50 AND n_words <= 100000
         |             AND sum_len >= n_words * 3 AND sum_len <= n_words * 10
         |             AND n_symbols * 10 < n_words
         |             AND n_bullet_lines * 10 <= n_lines * 9
         |             AND n_ellipsis_lines * 10 <= n_lines * 3
         |             AND n_alpha_words * 5 >= n_words * 4
         |             AND n_stopwords_hit >= 2
         |            THEN 1::BIGINT ELSE 0::BIGINT END AS gopher_pass
         |FROM m""".stripMargin,
    "d23_dedup_groups" ->
      s"""$dedupClosureCtes
         |SELECT doc_id, group_id,
         |       COUNT(*) OVER (PARTITION BY group_id) AS group_size,
         |       CASE WHEN doc_id = group_id THEN 1::BIGINT ELSE 0::BIGINT END AS is_canonical
         |FROM g""".stripMargin,
    "d29_dedup_apply" ->
      s"""$dedupClosureCtes, gg AS (
         |  SELECT g.doc_id, g.group_id, d.source, len($toks)::BIGINT AS n_tokens
         |  FROM g JOIN documents d ON d.doc_id = g.doc_id
         |)
         |SELECT source, COUNT(*) AS n_docs,
         |       CAST(SUM(CASE WHEN doc_id = group_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       CAST(COUNT(*) - SUM(CASE WHEN doc_id = group_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |       CAST(SUM(CASE WHEN doc_id = group_id THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
         |       CAST(SUM(CASE WHEN doc_id <> group_id THEN n_tokens ELSE 0 END) AS BIGINT) AS dropped_tokens
         |FROM gg GROUP BY source""".stripMargin,
    "d30_substring_dup" ->
      s"""WITH w AS (
         |  SELECT doc_id, $toks AS ws FROM documents
         |), g0 AS (
         |  SELECT doc_id, list_transform(generate_series(0, greatest(len(ws) - 8, 0)),
         |                                i -> array_to_string(ws[i + 1 : i + 8], ' ')) AS grams
         |  FROM w
         |), g AS (
         |  SELECT doc_id, UNNEST(grams) AS gram FROM g0
         |), shared AS (
         |  SELECT gram FROM (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY gram)
         |  WHERE nd >= 2
         |), dup AS (
         |  SELECT doc_id, COUNT(*) AS n_dup FROM g JOIN shared USING (gram) GROUP BY doc_id
         |), base AS (
         |  SELECT doc_id, len(grams)::BIGINT AS n_grams FROM g0
         |)
         |SELECT b.doc_id, b.n_grams,
         |       COALESCE(d.n_dup, 0)::BIGINT AS n_dup_grams,
         |       round(COALESCE(d.n_dup, 0)::DOUBLE / b.n_grams, 6) AS dup_fraction,
         |       (CASE WHEN COALESCE(d.n_dup, 0) * 5 >= b.n_grams THEN 1 ELSE 0 END)::BIGINT AS dup_flag
         |FROM base b LEFT JOIN dup d USING (doc_id)""".stripMargin,
    "d21_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, len($toks)::BIGINT AS n_tokens FROM documents
         |), c AS (
         |  SELECT *, SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING) AS tok_end
         |  FROM t
         |)
         |SELECT source, doc_id, n_tokens,
         |       (tok_end - n_tokens)::BIGINT AS tok_start,
         |       ((tok_end - n_tokens) // 256)::BIGINT AS start_seq,
         |       (greatest(tok_end - 1, tok_end - n_tokens) // 256)::BIGINT AS end_seq,
         |       ((tok_end - n_tokens) % 256)::BIGINT AS seq_offset
         |FROM c""".stripMargin,
    "d82_pipeline_composed" ->
      s"""WITH keep AS (
         |  SELECT MIN(doc_id) AS doc_id FROM documents
         |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         |), sh AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(0, greatest(len($toks) - 3, 0)),
         |    i -> array_to_string(($toks)[i + 1 : i + 3], ' '))) AS shingles
         |  FROM documents
         |), ev AS (
         |  SELECT DISTINCT UNNEST(shingles) AS g FROM sh WHERE doc_id % 97 = 0
         |), tr AS (
         |  SELECT doc_id, UNNEST(shingles) AS g FROM sh
         |  WHERE doc_id % 97 <> 0 AND doc_id IN (SELECT doc_id FROM keep)
         |), agg AS (
         |  SELECT t.doc_id, COUNT(*) AS n_grams, COUNT(e.g) AS n_contaminated
         |  FROM tr t LEFT JOIN ev e USING (g) GROUP BY t.doc_id
         |), s2 AS (
         |  SELECT d.doc_id, d.source, d.text
         |  FROM documents d JOIN keep k ON k.doc_id = d.doc_id
         |  WHERE d.doc_id % 97 <> 0 AND d.doc_id NOT IN (
         |    SELECT doc_id FROM agg WHERE n_contaminated::DOUBLE >= n_grams * 0.03)
         |), scored AS (
         |  SELECT doc_id, source, text,
         |    round(0.4 * least(1.0, len($toks)::DOUBLE / 100.0)
         |        + 0.3 * (len(list_distinct($toks))::DOUBLE / len($toks))
         |        + 0.3 * least(1.0, (len(list_filter($toks, t -> list_contains($enList, t)))::DOUBLE / len($toks)) * 10.0),
         |      6) AS quality_score
         |  FROM s2
         |), s3 AS (
         |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY quality_score DESC, doc_id ASC) AS rn
         |  FROM scored WHERE quality_score >= 0.6
         |), s4 AS (
         |  SELECT doc_id, source, text FROM s3 WHERE rn <= 150
         |), t AS (
         |  SELECT doc_id, source, len($toks)::BIGINT AS n_tokens FROM s4
         |), c AS (
         |  SELECT *, SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING) AS tok_end
         |  FROM t
         |)
         |SELECT source, doc_id, n_tokens,
         |       (tok_end - n_tokens)::BIGINT AS tok_start,
         |       ((tok_end - n_tokens) // 256)::BIGINT AS start_seq,
         |       (greatest(tok_end - 1, tok_end - n_tokens) // 256)::BIGINT AS end_seq,
         |       ((tok_end - n_tokens) % 256)::BIGINT AS seq_offset
         |FROM c""".stripMargin,
    "d22_chunk" ->
      s"""WITH t AS (
         |  SELECT doc_id, $toks AS tk FROM documents
         |)
         |SELECT doc_id, len(tk)::BIGINT AS n_tokens,
         |       ((s - 1) // 24)::BIGINT AS chunk_id,
         |       (s - 1)::BIGINT AS tok_offset,
         |       array_to_string(tk[s : s + 31], ' ') AS chunk_text
         |FROM t, UNNEST(generate_series(1, greatest(len(tk) - 8, 1), 24)) AS u(s)""".stripMargin,
    "d51_int8_quant" ->
      """WITH v AS (
        |  SELECT vec_id, embedding,
        |         list_max(list_transform(embedding, x -> abs(x)))::DOUBLE / 127.0 AS scale
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id, scale, embedding,
        |         CASE WHEN scale = 0
        |              THEN list_transform(embedding, x -> 0)
        |              ELSE list_transform(embedding, x ->
        |                least(greatest(floor(x::DOUBLE / scale + 0.5), -127.0), 127.0)::INT)
        |         END AS qs
        |  FROM v
        |)
        |SELECT vec_id, round(scale, 9) AS scale,
        |       list_sum(list_transform(qs, x -> x::BIGINT))::BIGINT AS q_sum,
        |       list_sum(list_transform(qs, x -> abs(x)::BIGINT))::BIGINT AS q_abs_sum,
        |       round(list_sum(list_transform(generate_series(1, 64), i ->
        |               (qs[i]::DOUBLE * scale - embedding[i]::DOUBLE) *
        |               (qs[i]::DOUBLE * scale - embedding[i]::DOUBLE))) / len(qs), 9) AS mse
        |FROM q""".stripMargin,
    "d52_url_extract" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         text || ' see https://site' || CAST(doc_id % 50 AS VARCHAR)
        |              || '.example-' || CAST(doc_id % 3 AS VARCHAR)
        |              || '.com/p/' || CAST(doc_id AS VARCHAR)
        |              || ' and http://cdn' || CAST(doc_id % 4 AS VARCHAR)
        |              || '.assets.net/r/' || CAST(doc_id % 7 AS VARCHAR) AS txt
        |  FROM documents
        |), u AS (
        |  SELECT doc_id, UNNEST(regexp_extract_all(txt, 'https?://[A-Za-z0-9.-]+(/[A-Za-z0-9./_-]*)?')) AS url
        |  FROM p
        |), d AS (
        |  SELECT doc_id, regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1) AS domain FROM u
        |)
        |SELECT domain, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_urls,
        |       domain LIKE 'cdn%' AS blocked
        |FROM d GROUP BY domain""".stripMargin,
    "d54_corpus_report" -> {
      val t = "string_split_regex(lower(trim(text)), '\\s+')"
      s"""WITH per AS (
         |  SELECT doc_id, source, lang,
         |         len($t)::BIGINT AS n_tokens,
         |         round(round(0.4 * least(1.0, len($t)::DOUBLE / 100.0)
         |             + 0.3 * (len(list_distinct($t))::DOUBLE / len($t))
         |             + 0.3 * least(1.0, (len(list_filter($t, tok -> list_contains($enList, tok)))::DOUBLE / len($t)) * 10.0),
         |           6) * 1e6, 0)::BIGINT AS q6,
         |         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents
         |)
         |SELECT source,
         |       COUNT(*) AS n_docs,
         |       SUM(n_tokens)::BIGINT AS total_tokens,
         |       round(quantile_cont(n_tokens, 0.5), 6) AS median_tokens,
         |       round((SUM(q6)::DOUBLE / 1e6) / COUNT(*), 6) AS avg_quality,
         |       (COUNT(*) - COUNT(DISTINCT fp))::BIGINT AS n_dup_docs,
         |       round(COUNT(CASE WHEN n_tokens < 50 THEN 1 END)::DOUBLE / COUNT(*), 6) AS short_frac,
         |       COUNT(DISTINCT lang)::BIGINT AS n_langs
         |FROM per GROUP BY source""".stripMargin
    },
    "x1_multimodal_meta" ->
      """SELECT doc_id,
        |       octet_length(encode(text))::BIGINT AS n_bytes,
        |       md5(text) AS checksum,
        |       (octet_length(encode(text)) % 640)::BIGINT AS width,
        |       (octet_length(encode(text)) * 7 % 480)::BIGINT AS height,
        |       (octet_length(encode(text)) % 24)::BIGINT AS n_frames
        |FROM documents""".stripMargin,
    // payloads are ASCII here, so VARCHAR substring = byte slicing (the
    // Spark side slices real bytes; equality holds for this corpus)
    "x2_frame_sample" ->
      """WITH p AS (
        |  SELECT doc_id, text, length(text) AS n, length(text) % 24 AS nf
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, text, i AS frame_idx, (n + nf - 1) // nf AS chunk
        |  FROM p, UNNEST(generate_series(0, nf - 1)) AS t(i)
        |  WHERE nf > 0 AND i % 2 = 0
        |)
        |SELECT doc_id, frame_idx,
        |       CAST(length(substring(text, CAST(frame_idx * chunk + 1 AS BIGINT),
        |                             CAST(chunk AS BIGINT))) AS BIGINT) AS n_bytes,
        |       md5(substring(text, CAST(frame_idx * chunk + 1 AS BIGINT),
        |           CAST(chunk AS BIGINT))) AS checksum
        |FROM f""".stripMargin,
    // x3: the codec-free recomputation of the decoded pixel stats — the
    // Spark side round-trips every pixel through real PNG bytes
    // (javax.imageio encode → binary column → decode); this side just
    // evaluates the closed-form pixel functions over the (x, y) grid
    "x3_image_decode" ->
      """WITH px AS (
        |  SELECT doc_id, (doc_id % 7 + 2) AS w, (doc_id % 4 + 2) AS h, x, y
        |  FROM documents,
        |       UNNEST(generate_series(0, (doc_id % 7 + 2) - 1)) AS tx(x),
        |       UNNEST(generate_series(0, (doc_id % 4 + 2) - 1)) AS ty(y)
        |), agg AS (
        |  SELECT doc_id, any_value(w)::BIGINT AS width, any_value(h)::BIGINT AS height,
        |         (any_value(w) * any_value(h))::BIGINT AS n_pixels,
        |         SUM((doc_id + 7 * x + 13 * y) % 256)::BIGINT AS sum_r,
        |         SUM((3 * doc_id + 5 * x + 11 * y) % 256)::BIGINT AS sum_g,
        |         SUM((doc_id + x * y) % 256)::BIGINT AS sum_b
        |  FROM px GROUP BY doc_id
        |)
        |SELECT doc_id, width, height, n_pixels, sum_r, sum_g, sum_b,
        |       round(sum_r::DOUBLE / n_pixels, 6) AS mean_r,
        |       round(sum_g::DOUBLE / n_pixels, 6) AS mean_g,
        |       round(sum_b::DOUBLE / n_pixels, 6) AS mean_b
        |FROM agg""".stripMargin,
    // x4: the codec-free recomputation of the decoded amplitude stats —
    // the Spark side round-trips every sample through real RIFF/WAV
    // bytes (javax.sound encode → binary column → decode); this side
    // just evaluates the closed-form sample function over 0..n-1
    "x4_audio_decode" ->
      """WITH sm AS (
        |  SELECT doc_id, (doc_id * 31 + i * 17) % 256 AS amp
        |  FROM documents,
        |       UNNEST(generate_series(0, (doc_id % 40 + 8) - 1)) AS t(i)
        |)
        |SELECT doc_id, COUNT(*)::BIGINT AS n_samples, 8000::BIGINT AS sample_rate,
        |       SUM(amp)::BIGINT AS sum_amp,
        |       MIN(amp)::BIGINT AS min_amp, MAX(amp)::BIGINT AS max_amp,
        |       round(SUM(amp)::DOUBLE / COUNT(*), 6) AS mean_amp
        |FROM sm GROUP BY doc_id""".stripMargin,
    // x5: the codec-free recomputation of the demuxed per-frame pixel
    // stats — the Spark side round-trips every frame through real
    // animated-GIF bytes (javax.imageio sequence encode → binary column
    // → frame-indexed demux + decode); this side just evaluates the
    // closed-form pixel functions over the (frame, x, y) grid
    "x5_video_decode" ->
      """WITH px AS (
        |  SELECT doc_id, f, (doc_id % 6 + 2) AS w, (doc_id % 3 + 2) AS h, x, y
        |  FROM documents,
        |       UNNEST(generate_series(0, (doc_id % 4 + 2) - 1)) AS tf(f),
        |       UNNEST(generate_series(0, (doc_id % 6 + 2) - 1)) AS tx(x),
        |       UNNEST(generate_series(0, (doc_id % 3 + 2) - 1)) AS ty(y)
        |), agg AS (
        |  SELECT doc_id, f, any_value(w)::BIGINT AS width, any_value(h)::BIGINT AS height,
        |         (any_value(w) * any_value(h))::BIGINT AS n_pixels,
        |         SUM((doc_id + 7 * x + 13 * y + 29 * f) % 256)::BIGINT AS sum_v
        |  FROM px GROUP BY doc_id, f
        |)
        |SELECT doc_id, f::BIGINT AS frame_idx, width, height, n_pixels, sum_v,
        |       round(sum_v::DOUBLE / n_pixels, 6) AS mean_v
        |FROM agg""".stripMargin,
    // x6: the x5 closed form over the NON-poisoned ids, unioned with one
    // all-null 'corrupt' row per poisoned id — the tolerant decoder's
    // whole observable contract (statuses, per-frame stats, corrupt
    // collapse) recomputed codec-free
    "x6_video_quarantine" ->
      """WITH px AS (
        |  SELECT doc_id, f, (doc_id % 6 + 2) AS w, (doc_id % 3 + 2) AS h, x, y
        |  FROM documents,
        |       UNNEST(generate_series(0, (doc_id % 4 + 2) - 1)) AS tf(f),
        |       UNNEST(generate_series(0, (doc_id % 6 + 2) - 1)) AS tx(x),
        |       UNNEST(generate_series(0, (doc_id % 3 + 2) - 1)) AS ty(y)
        |  WHERE doc_id % 17 <> 0
        |), agg AS (
        |  SELECT doc_id, f, any_value(w)::BIGINT AS width, any_value(h)::BIGINT AS height,
        |         (any_value(w) * any_value(h))::BIGINT AS n_pixels,
        |         SUM((doc_id + 7 * x + 13 * y + 29 * f) % 256)::BIGINT AS sum_v
        |  FROM px GROUP BY doc_id, f
        |)
        |SELECT doc_id, 'ok' AS status, f::BIGINT AS frame_idx,
        |       width, height, n_pixels, sum_v
        |FROM agg
        |UNION ALL
        |SELECT doc_id, 'corrupt' AS status, NULL::BIGINT AS frame_idx,
        |       NULL::BIGINT AS width, NULL::BIGINT AS height,
        |       NULL::BIGINT AS n_pixels, NULL::BIGINT AS sum_v
        |FROM documents WHERE doc_id % 17 = 0""".stripMargin,
    // x7: the x3 closed form over the NON-poisoned ids ∪ one all-null
    // 'corrupt' row per poisoned id — the tolerant image decoder's
    // whole observable contract recomputed codec-free
    "x7_image_quarantine" ->
      """WITH px AS (
        |  SELECT doc_id, (doc_id % 7 + 2) AS w, (doc_id % 4 + 2) AS h, x, y
        |  FROM documents,
        |       UNNEST(generate_series(0, (doc_id % 7 + 2) - 1)) AS tx(x),
        |       UNNEST(generate_series(0, (doc_id % 4 + 2) - 1)) AS ty(y)
        |  WHERE doc_id % 17 <> 0
        |), agg AS (
        |  SELECT doc_id, any_value(w)::BIGINT AS width, any_value(h)::BIGINT AS height,
        |         (any_value(w) * any_value(h))::BIGINT AS n_pixels,
        |         SUM((doc_id + 7 * x + 13 * y) % 256)::BIGINT AS sum_r,
        |         SUM((3 * doc_id + 5 * x + 11 * y) % 256)::BIGINT AS sum_g,
        |         SUM((doc_id + x * y) % 256)::BIGINT AS sum_b
        |  FROM px GROUP BY doc_id
        |)
        |SELECT doc_id, 'ok' AS status, width, height, n_pixels, sum_r, sum_g, sum_b
        |FROM agg
        |UNION ALL
        |SELECT doc_id, 'corrupt' AS status, NULL::BIGINT AS width,
        |       NULL::BIGINT AS height, NULL::BIGINT AS n_pixels,
        |       NULL::BIGINT AS sum_r, NULL::BIGINT AS sum_g, NULL::BIGINT AS sum_b
        |FROM documents WHERE doc_id % 17 = 0""".stripMargin,
    // x8: the x4 closed form over the NON-poisoned ids ∪ one all-null
    // 'corrupt' row per poisoned id — the tolerant audio decoder's
    // whole observable contract recomputed codec-free
    "x8_audio_quarantine" ->
      """WITH sm AS (
        |  SELECT doc_id, (doc_id * 31 + i * 17) % 256 AS amp
        |  FROM documents,
        |       UNNEST(generate_series(0, (doc_id % 40 + 8) - 1)) AS t(i)
        |  WHERE doc_id % 17 <> 0
        |)
        |SELECT doc_id, 'ok' AS status, COUNT(*)::BIGINT AS n_samples,
        |       8000::BIGINT AS sample_rate, SUM(amp)::BIGINT AS sum_amp,
        |       MIN(amp)::BIGINT AS min_amp, MAX(amp)::BIGINT AS max_amp
        |FROM sm GROUP BY doc_id
        |UNION ALL
        |SELECT doc_id, 'corrupt' AS status, NULL::BIGINT AS n_samples,
        |       NULL::BIGINT AS sample_rate, NULL::BIGINT AS sum_amp,
        |       NULL::BIGINT AS min_amp, NULL::BIGINT AS max_amp
        |FROM documents WHERE doc_id % 17 = 0""".stripMargin,
    // x9: the dispatch contract recomputed codec-free — the x3/x4/x5
    // closed forms routed by id mod 4, poisoned media (id mod 17 = 0)
    // as format-tagged corrupt rows, headerless text as unknown_format
    "x9_media_dispatch" ->
      """WITH img AS (
        |  SELECT doc_id,
        |         any_value(w)::BIGINT AS width, any_value(h)::BIGINT AS height,
        |         (any_value(w) * any_value(h))::BIGINT AS n_pixels,
        |         SUM((doc_id + 7 * x + 13 * y) % 256)::BIGINT AS sum_r,
        |         SUM((3 * doc_id + 5 * x + 11 * y) % 256)::BIGINT AS sum_g,
        |         SUM((doc_id + x * y) % 256)::BIGINT AS sum_b
        |  FROM (
        |    SELECT doc_id, (doc_id % 7 + 2) AS w, (doc_id % 4 + 2) AS h, x, y
        |    FROM documents,
        |         UNNEST(generate_series(0, (doc_id % 7 + 2) - 1)) AS tx(x),
        |         UNNEST(generate_series(0, (doc_id % 4 + 2) - 1)) AS ty(y)
        |    WHERE doc_id % 4 = 0 AND doc_id % 17 <> 0
        |  ) GROUP BY doc_id
        |), aud AS (
        |  SELECT doc_id, COUNT(*)::BIGINT AS n_samples, 8000::BIGINT AS sample_rate,
        |         SUM(amp)::BIGINT AS sum_amp,
        |         MIN(amp)::BIGINT AS min_amp, MAX(amp)::BIGINT AS max_amp
        |  FROM (
        |    SELECT doc_id, (doc_id * 31 + i * 17) % 256 AS amp
        |    FROM documents,
        |         UNNEST(generate_series(0, (doc_id % 40 + 8) - 1)) AS t(i)
        |    WHERE doc_id % 4 = 1 AND doc_id % 17 <> 0
        |  ) GROUP BY doc_id
        |), vid AS (
        |  SELECT doc_id,
        |         any_value(w)::BIGINT AS width, any_value(h)::BIGINT AS height,
        |         COUNT(*)::BIGINT AS n_pixels,
        |         (doc_id % 4 + 2)::BIGINT AS n_frames,
        |         SUM((doc_id + 7 * x + 13 * y + 29 * f) % 256)::BIGINT AS sum_v
        |  FROM (
        |    SELECT doc_id, f, (doc_id % 6 + 2) AS w, (doc_id % 3 + 2) AS h, x, y
        |    FROM documents,
        |         UNNEST(generate_series(0, (doc_id % 4 + 2) - 1)) AS tf(f),
        |         UNNEST(generate_series(0, (doc_id % 6 + 2) - 1)) AS tx(x),
        |         UNNEST(generate_series(0, (doc_id % 3 + 2) - 1)) AS ty(y)
        |    WHERE doc_id % 4 = 2 AND doc_id % 17 <> 0
        |  ) GROUP BY doc_id
        |)
        |SELECT doc_id, 'png' AS format, 'ok' AS status,
        |       width, height, n_pixels, sum_r, sum_g, sum_b,
        |       NULL::BIGINT AS n_samples, NULL::BIGINT AS sample_rate,
        |       NULL::BIGINT AS sum_amp, NULL::BIGINT AS min_amp,
        |       NULL::BIGINT AS max_amp, NULL::BIGINT AS n_frames,
        |       NULL::BIGINT AS sum_v
        |FROM img
        |UNION ALL
        |SELECT doc_id, 'wav', 'ok',
        |       NULL::BIGINT, NULL::BIGINT, NULL::BIGINT,
        |       NULL::BIGINT, NULL::BIGINT, NULL::BIGINT,
        |       n_samples, sample_rate, sum_amp, min_amp, max_amp,
        |       NULL::BIGINT, NULL::BIGINT
        |FROM aud
        |UNION ALL
        |SELECT doc_id, 'gif', 'ok',
        |       width, height, n_pixels,
        |       NULL::BIGINT, NULL::BIGINT, NULL::BIGINT,
        |       NULL::BIGINT, NULL::BIGINT, NULL::BIGINT,
        |       NULL::BIGINT, NULL::BIGINT,
        |       n_frames, sum_v
        |FROM vid
        |UNION ALL
        |SELECT doc_id,
        |       CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'gif' END,
        |       'corrupt',
        |       NULL::BIGINT, NULL::BIGINT, NULL::BIGINT,
        |       NULL::BIGINT, NULL::BIGINT, NULL::BIGINT,
        |       NULL::BIGINT, NULL::BIGINT, NULL::BIGINT,
        |       NULL::BIGINT, NULL::BIGINT, NULL::BIGINT, NULL::BIGINT
        |FROM documents WHERE doc_id % 17 = 0 AND doc_id % 4 <> 3
        |UNION ALL
        |SELECT doc_id, 'unknown', 'unknown_format',
        |       NULL::BIGINT, NULL::BIGINT, NULL::BIGINT,
        |       NULL::BIGINT, NULL::BIGINT, NULL::BIGINT,
        |       NULL::BIGINT, NULL::BIGINT, NULL::BIGINT,
        |       NULL::BIGINT, NULL::BIGINT, NULL::BIGINT, NULL::BIGINT
        |FROM documents WHERE doc_id % 4 = 3""".stripMargin,
    "d34_fuzzy_join" ->
      s"""WITH v AS (
         |  SELECT tok, COUNT(*) AS n FROM (SELECT UNNEST($toks) AS tok FROM documents)
         |  GROUP BY tok
         |)
         |SELECT a.tok AS tok_a, b.tok AS tok_b,
         |       CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS edit_distance,
         |       a.n AS n_a, b.n AS n_b
         |FROM v a JOIN v b
         |  ON a.tok < b.tok
         | AND abs(len(a.tok) - len(b.tok)) <= 2
         | AND levenshtein(a.tok, b.tok) <= 2""".stripMargin,
    "d33_pii" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |              || ' call 555-123-4567 from host 10.0.'
        |              || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) AS txt
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, txt,
        |         regexp_replace(
        |           regexp_replace(
        |             regexp_replace(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |             '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}', '<PHONE>', 'g'),
        |           '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS redacted
        |  FROM p
        |)
        |SELECT doc_id,
        |       len(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        |       len(regexp_extract_all(txt, '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}'))::BIGINT AS n_phones,
        |       len(regexp_extract_all(txt, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))::BIGINT AS n_ips,
        |       md5(redacted) AS redacted_md5,
        |       (len(regexp_extract_all(redacted, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) = 0
        |        AND len(regexp_extract_all(redacted, '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}')) = 0
        |        AND len(regexp_extract_all(redacted, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) = 0) AS clean_after
        |FROM r""".stripMargin,
    "d35_incr_dedup" ->
      s"""WITH sh AS (
         |  SELECT doc_id, list_transform(
         |    generate_series(0, greatest(len($toks) - 8, 0)),
         |    i -> array_to_string(($toks)[i + 1 : i + 8], ' ')) AS grams
         |  FROM documents),
         |fps AS (
         |  SELECT doc_id, ${phash("UNNEST(grams)")} AS fp FROM sh),
         |idx AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 5 < 4),
         |newb AS (
         |  SELECT doc_id, fp, (fp IN (SELECT fp FROM idx)) AS is_dup
         |  FROM fps WHERE doc_id % 5 = 4)
         |SELECT doc_id,
         |       COUNT(*) AS n_shingles,
         |       SUM(CASE WHEN is_dup THEN 1 ELSE 0 END)::BIGINT AS n_dup_shingles,
         |       round(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 6) AS dup_fraction,
         |       round(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 6) < 0.5 AS keep
         |FROM newb GROUP BY doc_id""".stripMargin,
    "d37_split_export" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |         ${phash("'split:' || CAST(doc_id AS VARCHAR)")} % 10000 AS hs,
         |         ${phash("'shuffle:' || CAST(doc_id AS VARCHAR)")} AS shuffle_ord
         |  FROM documents)
         |SELECT doc_id,
         |       CASE WHEN hs < 9000 THEN 'train'
         |            WHEN hs < 9500 THEN 'val'
         |            ELSE 'test' END AS split,
         |       shuffle_ord,
         |       shuffle_ord % 8 AS shard
         |FROM h""".stripMargin,
    "d44_dist_shift" ->
      s"""WITH c AS (
         |  SELECT tok AS token,
         |         CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |         CAST(SUM(CASE WHEN source = 'src0' THEN 0 ELSE 1 END) AS BIGINT) AS cb
         |  FROM (SELECT source, UNNEST($toks) AS tok FROM documents)
         |  GROUP BY tok
         |), t AS (
         |  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
         |         COUNT(*) AS v
         |  FROM c
         |), s AS (
         |  SELECT c.token, c.ca, c.cb,
         |         round(((c.ca + 0.5) / (t.na + 0.5 * t.v)) *
         |               ln(((c.ca + 0.5) / (t.na + 0.5 * t.v)) /
         |                  ((c.cb + 0.5) / (t.nb + 0.5 * t.v))), 9) AS kl_term,
         |         round(abs((c.ca + 0.5) / (t.na + 0.5 * t.v) -
         |                   (c.cb + 0.5) / (t.nb + 0.5 * t.v)) / 2, 9) AS tv_term
         |  FROM c CROSS JOIN t
         |), o AS (
         |  SELECT round(CAST(SUM(CAST(kl_term AS DECIMAL(28,9))) AS DOUBLE), 6) AS kl_total,
         |         round(CAST(SUM(CAST(tv_term AS DECIMAL(28,9))) AS DOUBLE), 6) AS tv_total
         |  FROM s
         |)
         |SELECT s.token, s.ca, s.cb, round(s.kl_term, 6) AS kl_contrib,
         |       o.kl_total, o.tv_total
         |FROM s CROSS JOIN o
         |ORDER BY s.kl_term DESC, s.token ASC LIMIT 20""".stripMargin,
    "d39_weighted_sample" ->
      s"""WITH h AS (
         |  SELECT source, doc_id, n_chars,
         |         -ln((${phash("'es:' || CAST(doc_id AS VARCHAR)")}::DOUBLE + 0.5)
         |             / 1152921504606846976.0) / CAST(n_chars AS DOUBLE) AS es_key
         |  FROM documents WHERE n_chars > 0
         |), r AS (
         |  SELECT source, doc_id, n_chars, es_key,
         |         row_number() OVER (PARTITION BY source ORDER BY es_key, doc_id) AS rn
         |  FROM h)
         |SELECT source, doc_id, n_chars, round(es_key, 6) AS es_key
         |FROM r WHERE rn <= 25""".stripMargin,
    "d47_token_budget_sample" ->
      s"""WITH h AS (
         |  SELECT source, doc_id, CAST(len($toks) AS BIGINT) AS n_tokens,
         |         -ln((${phash("'es:' || CAST(doc_id AS VARCHAR)")}::DOUBLE + 0.5)
         |             / 1152921504606846976.0) / CAST(n_chars AS DOUBLE) AS es_key
         |  FROM documents WHERE n_chars > 0
         |), r AS (
         |  SELECT source, doc_id, n_tokens, es_key,
         |         SUM(n_tokens) OVER (PARTITION BY source ORDER BY es_key, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM h)
         |SELECT source, doc_id, n_tokens, round(es_key, 6) AS es_key
         |FROM r WHERE cum - n_tokens < 500""".stripMargin,
    "d46_lm_heldout" ->
      s"""WITH toksed_tr AS (
         |  SELECT doc_id, $toks AS toks FROM documents
         |  WHERE len($toks) >= 2 AND doc_id % 2 = 0
         |), toksed_all AS (
         |  SELECT doc_id, $toks AS toks FROM documents WHERE len($toks) >= 2
         |), uni AS (
         |  SELECT doc_id, UNNEST(toks) AS tok FROM toksed_tr
         |), vocab AS (
         |  SELECT tok FROM (SELECT tok, COUNT(*) AS n FROM uni GROUP BY tok)
         |  ORDER BY n DESC, tok ASC LIMIT 64
         |), mstream AS (
         |  SELECT u.doc_id, CASE WHEN v.tok IS NULL THEN '<unk>' ELSE u.tok END AS w
         |  FROM uni u LEFT JOIN vocab v ON u.tok = v.tok
         |), vsz AS (
         |  SELECT COUNT(DISTINCT w) AS v FROM mstream
         |), ex_tr AS (
         |  SELECT doc_id,
         |         UNNEST(toks[1:len(toks)-1]) AS t1,
         |         UNNEST(toks[2:len(toks)]) AS t2
         |  FROM toksed_tr
         |), big_tr AS (
         |  SELECT e.doc_id,
         |         CASE WHEN v1.tok IS NULL THEN '<unk>' ELSE e.t1 END AS w1,
         |         CASE WHEN v2.tok IS NULL THEN '<unk>' ELSE e.t2 END AS w2
         |  FROM ex_tr e LEFT JOIN vocab v1 ON e.t1 = v1.tok
         |               LEFT JOIN vocab v2 ON e.t2 = v2.tok
         |), c1 AS (
         |  SELECT w1, COUNT(*) AS c1 FROM big_tr GROUP BY w1
         |), c12 AS (
         |  SELECT w1, w2, COUNT(*) AS c12 FROM big_tr GROUP BY w1, w2
         |), model AS (
         |  SELECT c12.w1, c12.w2,
         |         round(ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * vsz.v)), 6) AS lp
         |  FROM c12 JOIN c1 USING (w1) CROSS JOIN vsz
         |), ex_all AS (
         |  SELECT doc_id,
         |         UNNEST(toks[1:len(toks)-1]) AS t1,
         |         UNNEST(toks[2:len(toks)]) AS t2
         |  FROM toksed_all
         |), big_all AS (
         |  SELECT e.doc_id,
         |         CASE WHEN v1.tok IS NULL THEN '<unk>' ELSE e.t1 END AS w1,
         |         CASE WHEN v2.tok IS NULL THEN '<unk>' ELSE e.t2 END AS w2
         |  FROM ex_all e LEFT JOIN vocab v1 ON e.t1 = v1.tok
         |                LEFT JOIN vocab v2 ON e.t2 = v2.tok
         |), bigc AS (
         |  SELECT doc_id, w1, w2, COUNT(*) AS cnt FROM big_all GROUP BY doc_id, w1, w2
         |), agg AS (
         |  SELECT b.doc_id, CAST(SUM(b.cnt) AS BIGINT) AS n_bigrams,
         |         CAST(SUM(b.cnt * CAST(m.lp AS DECIMAL(28,6))) AS DOUBLE)
         |           / CAST(SUM(b.cnt) AS DOUBLE) AS avg_lp_raw
         |  FROM bigc b JOIN model m USING (w1, w2) GROUP BY b.doc_id
         |)
         |SELECT doc_id, n_bigrams, round(avg_lp_raw, 6) AS avg_logprob,
         |       round(exp(-round(avg_lp_raw, 6)), 6) AS ppl
         |FROM agg""".stripMargin,
    "d40_ngram_lm" ->
      s"""WITH toksed AS (
         |  SELECT doc_id, $toks AS toks FROM documents WHERE len($toks) >= 2
         |), uni AS (
         |  SELECT doc_id, UNNEST(toks) AS tok FROM toksed
         |), vocab AS (
         |  SELECT tok FROM (SELECT tok, COUNT(*) AS n FROM uni GROUP BY tok)
         |  ORDER BY n DESC, tok ASC LIMIT 64
         |), mstream AS (
         |  SELECT u.doc_id, CASE WHEN v.tok IS NULL THEN '<unk>' ELSE u.tok END AS w
         |  FROM uni u LEFT JOIN vocab v ON u.tok = v.tok
         |), vsz AS (
         |  SELECT COUNT(DISTINCT w) AS v FROM mstream
         |), ex AS (
         |  SELECT doc_id,
         |         UNNEST(toks[1:len(toks)-1]) AS t1,
         |         UNNEST(toks[2:len(toks)]) AS t2
         |  FROM toksed
         |), big AS (
         |  SELECT e.doc_id,
         |         CASE WHEN v1.tok IS NULL THEN '<unk>' ELSE e.t1 END AS w1,
         |         CASE WHEN v2.tok IS NULL THEN '<unk>' ELSE e.t2 END AS w2
         |  FROM ex e LEFT JOIN vocab v1 ON e.t1 = v1.tok
         |            LEFT JOIN vocab v2 ON e.t2 = v2.tok
         |), c1 AS (
         |  SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1
         |), c12 AS (
         |  SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2
         |), model AS (
         |  SELECT c12.w1, c12.w2,
         |         round(ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * vsz.v)), 6) AS lp
         |  FROM c12 JOIN c1 USING (w1) CROSS JOIN vsz
         |), bigc AS (
         |  SELECT doc_id, w1, w2, COUNT(*) AS cnt FROM big GROUP BY doc_id, w1, w2
         |), agg AS (
         |  SELECT b.doc_id, CAST(SUM(b.cnt) AS BIGINT) AS n_bigrams,
         |         CAST(SUM(b.cnt * CAST(m.lp AS DECIMAL(28,6))) AS DOUBLE)
         |           / CAST(SUM(b.cnt) AS DOUBLE) AS avg_lp_raw
         |  FROM bigc b JOIN model m USING (w1, w2) GROUP BY b.doc_id
         |)
         |SELECT doc_id, n_bigrams, round(avg_lp_raw, 6) AS avg_logprob,
         |       round(exp(-round(avg_lp_raw, 6)), 6) AS ppl
         |FROM agg""".stripMargin,
    "d38_passage_dedup_apply" ->
      s"""WITH d AS (
         |  SELECT doc_id, $toks AS toks FROM documents),
         |p AS (
         |  SELECT doc_id, i AS pos,
         |         array_to_string(toks[i * 10 + 1 : i * 10 + 10], ' ') AS passage
         |  FROM d, UNNEST(generate_series(
         |    0, greatest(CAST(ceil(len(toks) / 10.0) AS INT) - 1, 0))) AS t(i)),
         |k AS (
         |  SELECT doc_id, pos, passage,
         |         ROW_NUMBER() OVER (
         |           PARTITION BY ${phash("passage")}
         |           ORDER BY doc_id, pos) = 1 AS keep
         |  FROM p)
         |SELECT doc_id,
         |       COUNT(*) AS n_passages,
         |       SUM(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
         |       round(1.0 - SUM(CASE WHEN keep THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 6)
         |         AS dedup_fraction,
         |       COALESCE(string_agg(passage, ' ' ORDER BY pos) FILTER (WHERE keep), '')
         |         AS cleaned_text
         |FROM k GROUP BY doc_id""".stripMargin,
    "d57_span_dedup_apply" ->
      s"""WITH w AS (
         |  SELECT doc_id, $toks AS tk FROM documents
         |), g AS (
         |  SELECT doc_id, i AS pos, array_to_string(tk[i + 1 : i + 8], ' ') AS gram
         |  FROM w, UNNEST(generate_series(0, len(tk) - 8)) AS u(i)
         |  WHERE len(tk) >= 8
         |), dup AS (
         |  SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos,
         |           row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rk
         |    FROM g)
         |  WHERE rk > 1
         |), isl AS (
         |  SELECT doc_id, pos, pos + 7 AS e,
         |         max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |  FROM dup
         |), isl2 AS (
         |  SELECT doc_id, pos, e,
         |         SUM(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
         |  FROM isl
         |), spans AS (
         |  SELECT doc_id, island, min(pos) AS s, max(e) AS e
         |  FROM isl2 GROUP BY doc_id, island
         |), st AS (
         |  SELECT doc_id, COUNT(*)::BIGINT AS n_spans, SUM(e - s + 1)::BIGINT AS removed
         |  FROM spans GROUP BY doc_id
         |), cov AS (
         |  SELECT doc_id, UNNEST(generate_series(s, e)) AS pos FROM spans
         |), tokpos AS (
         |  SELECT doc_id, i - 1 AS pos, tk[i] AS tok
         |  FROM w, UNNEST(generate_series(1, len(tk))) AS u(i)
         |), kept AS (
         |  SELECT t.doc_id,
         |         COUNT(*)::BIGINT AS n_tokens,
         |         COALESCE(string_agg(t.tok, ' ' ORDER BY t.pos)
         |                    FILTER (WHERE c.pos IS NULL), '') AS cleaned_text
         |  FROM tokpos t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
         |  GROUP BY t.doc_id
         |)
         |SELECT k.doc_id, k.n_tokens,
         |       COALESCE(st.n_spans, 0)::BIGINT AS n_spans,
         |       COALESCE(st.removed, 0)::BIGINT AS removed_tokens,
         |       round(COALESCE(st.removed, 0)::DOUBLE / k.n_tokens, 6) AS removed_fraction,
         |       k.cleaned_text
         |FROM kept k LEFT JOIN st USING (doc_id)""".stripMargin,
    "d58_split_leakage" ->
      s"""$dedupClosureCtes, a AS (
         |  SELECT doc_id, group_id, 'by_doc' AS scheme,
         |         ${phash("'split:' || CAST(doc_id AS VARCHAR)")} % 10000 AS hs
         |  FROM g
         |  UNION ALL
         |  SELECT doc_id, group_id, 'by_group',
         |         ${phash("'split:' || CAST(group_id AS VARCHAR)")} % 10000
         |  FROM g
         |), sp AS (
         |  SELECT scheme, doc_id, group_id,
         |         CASE WHEN hs < 9000 THEN 'train'
         |              WHEN hs < 9500 THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM a
         |), pg AS (
         |  SELECT scheme, group_id, COUNT(*) AS sz,
         |         COUNT(DISTINCT split) AS n_splits,
         |         SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_train
         |  FROM sp GROUP BY scheme, group_id
         |), gs AS (
         |  SELECT scheme,
         |         SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END)::BIGINT AS n_multi_groups,
         |         SUM(CASE WHEN sz > 1 AND n_splits > 1 THEN 1 ELSE 0 END)::BIGINT
         |           AS n_leaking_groups
         |  FROM pg GROUP BY scheme
         |), ds AS (
         |  SELECT sp.scheme,
         |         SUM(CASE WHEN sp.split <> 'train' THEN 1 ELSE 0 END)::BIGINT AS n_eval_docs,
         |         SUM(CASE WHEN sp.split <> 'train' AND pg.n_train > 0 THEN 1 ELSE 0 END)::BIGINT
         |           AS n_contaminated_eval_docs
         |  FROM sp JOIN pg ON pg.scheme = sp.scheme AND pg.group_id = sp.group_id
         |  GROUP BY sp.scheme
         |)
         |SELECT gs.scheme, gs.n_multi_groups, gs.n_leaking_groups,
         |       ds.n_eval_docs, ds.n_contaminated_eval_docs
         |FROM gs JOIN ds USING (scheme)""".stripMargin,
    "d61_bitext_mining" ->
      """WITH v AS (
        |  SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS vec, d.lang
        |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
        |), x AS (SELECT id AS src_id, vec AS xv FROM v WHERE lang = 'en'),
        |y AS (SELECT id AS tgt_id, vec AS yv FROM v WHERE lang = 'de'),
        |scored AS (
        |  SELECT src_id, tgt_id,
        |         round(list_sum(list_transform(generate_series(1, 64), i -> xv[i] * yv[i])) /
        |               (sqrt(list_sum(list_transform(generate_series(1, 64), i -> xv[i] * xv[i]))) *
        |                sqrt(list_sum(list_transform(generate_series(1, 64), i -> yv[i] * yv[i])))), 6)
        |           AS cos
        |  FROM x CROSS JOIN y
        |), su AS (
        |  SELECT src_id, tgt_id, cos,
        |         CASE WHEN isnan(cos) THEN 0
        |              ELSE CAST(round(cos * 1e6) AS BIGINT) END AS cos_u FROM scored
        |), ax AS (
        |  SELECT src_id, SUM(cos_u)::DOUBLE / COUNT(*) AS ax FROM (
        |    SELECT src_id, cos_u,
        |           row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, tgt_id) AS r
        |    FROM su)
        |  WHERE r <= 4 GROUP BY src_id
        |), ay AS (
        |  SELECT tgt_id, SUM(cos_u)::DOUBLE / COUNT(*) AS ay FROM (
        |    SELECT tgt_id, cos_u,
        |           row_number() OVER (PARTITION BY tgt_id ORDER BY cos DESC, src_id) AS r
        |    FROM su)
        |  WHERE r <= 4 GROUP BY tgt_id
        |), m AS (
        |  SELECT s.src_id, s.tgt_id, s.cos,
        |         CASE WHEN ax.ax + ay.ay > 0
        |              THEN round(s.cos_u::DOUBLE / ((ax.ax + ay.ay) / 2), 6)
        |              ELSE 0.0 END AS margin
        |  FROM su s JOIN ax USING (src_id) JOIN ay USING (tgt_id)
        |), r AS (
        |  SELECT *,
        |         row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS fwd,
        |         row_number() OVER (PARTITION BY tgt_id ORDER BY margin DESC, src_id) AS bwd
        |  FROM m
        |)
        |SELECT src_id, tgt_id, cos, margin,
        |       (CASE WHEN bwd = 1 THEN 1 ELSE 0 END)::BIGINT AS mutual,
        |       (CASE WHEN margin >= 1.0 THEN 1 ELSE 0 END)::BIGINT AS accepted
        |FROM r WHERE fwd = 1""".stripMargin,
    // d62: the d14 banded-LSH candidate replay (10 bands x 6 sign bits,
    // 1-bit-flip multi-probe on the src side) feeding the d61 margin
    // pipeline over the top-16 candidates per src doc
    "d62_bitext_ann" ->
      """WITH v AS (
        |  SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS vec, d.lang
        |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
        |), x AS (SELECT id AS src_id, vec AS xv FROM v WHERE lang = 'en'),
        |y AS (SELECT id AS tgt_id, vec AS yv FROM v WHERE lang = 'de'),
        |cb AS (
        |  SELECT tgt_id, b.band,
        |         CAST(list_sum(list_transform(generate_series(0, 5),
        |           i -> CASE WHEN yv[b.band * 6 + i + 1] >= 0 THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS bucket
        |  FROM y, (SELECT UNNEST(generate_series(0, 9)) AS band) b
        |), qb0 AS (
        |  SELECT src_id, b.band,
        |         CAST(list_sum(list_transform(generate_series(0, 5),
        |           i -> CASE WHEN xv[b.band * 6 + i + 1] >= 0 THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS bucket
        |  FROM x, (SELECT UNNEST(generate_series(0, 9)) AS band) b
        |), qb AS (
        |  SELECT src_id, band,
        |         UNNEST(list_concat([bucket],
        |           list_transform(generate_series(0, 5), i -> xor(bucket, 1::BIGINT << i)))) AS bucket
        |  FROM qb0
        |), pairs AS (
        |  SELECT DISTINCT q.src_id, c.tgt_id
        |  FROM cb c JOIN qb q ON c.band = q.band AND c.bucket = q.bucket
        |  WHERE c.tgt_id <> q.src_id
        |), cscored AS (
        |  SELECT p.src_id, p.tgt_id,
        |         round(list_sum(list_transform(generate_series(1, 64), i -> xv.xv[i] * yv.yv[i])) /
        |               (sqrt(list_sum(list_transform(generate_series(1, 64), i -> xv.xv[i] * xv.xv[i]))) *
        |                sqrt(list_sum(list_transform(generate_series(1, 64), i -> yv.yv[i] * yv.yv[i])))), 6)
        |           AS cos
        |  FROM pairs p JOIN x xv ON xv.src_id = p.src_id JOIN y yv ON yv.tgt_id = p.tgt_id
        |), su AS (
        |  SELECT src_id, tgt_id, cos,
        |         CASE WHEN isnan(cos) THEN 0
        |              ELSE CAST(round(cos * 1e6) AS BIGINT) END AS cos_u FROM (
        |    SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, tgt_id) AS r
        |    FROM cscored) WHERE r <= 16
        |), ax AS (
        |  SELECT src_id, SUM(cos_u)::DOUBLE / COUNT(*) AS ax FROM (
        |    SELECT src_id, cos_u,
        |           row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, tgt_id) AS r
        |    FROM su)
        |  WHERE r <= 4 GROUP BY src_id
        |), ay AS (
        |  SELECT tgt_id, SUM(cos_u)::DOUBLE / COUNT(*) AS ay FROM (
        |    SELECT tgt_id, cos_u,
        |           row_number() OVER (PARTITION BY tgt_id ORDER BY cos DESC, src_id) AS r
        |    FROM su)
        |  WHERE r <= 4 GROUP BY tgt_id
        |), m AS (
        |  SELECT s.src_id, s.tgt_id, s.cos,
        |         CASE WHEN ax.ax + ay.ay > 0
        |              THEN round(s.cos_u::DOUBLE / ((ax.ax + ay.ay) / 2), 6)
        |              ELSE 0.0 END AS margin
        |  FROM su s JOIN ax USING (src_id) JOIN ay USING (tgt_id)
        |), r AS (
        |  SELECT *,
        |         row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS fwd,
        |         row_number() OVER (PARTITION BY tgt_id ORDER BY margin DESC, src_id) AS bwd
        |  FROM m
        |)
        |SELECT src_id, tgt_id, cos, margin,
        |       (CASE WHEN bwd = 1 THEN 1 ELSE 0 END)::BIGINT AS mutual,
        |       (CASE WHEN margin >= 1.0 THEN 1 ELSE 0 END)::BIGINT AS accepted
        |FROM r WHERE fwd = 1""".stripMargin,
    // d63: full train→predict replay of the Hellinger nearest-centroid
    // classifier — per-doc √frequency vectors and per-class means in
    // integer micro-units (only correctly-rounded ops: ÷, sqrt, round),
    // scores exact integer folds, so DuckDB reproduces every prediction
    // bit-for-bit
    "d63_centroid_classifier" ->
      s"""WITH tk AS (
         |  SELECT doc_id, source, UNNEST($toks) AS term FROM documents
         |), cnt AS (
         |  SELECT doc_id, source, (${phash("term")} % 1024)::INT AS bucket,
         |         COUNT(*)::BIGINT AS c
         |  FROM tk GROUP BY 1, 2, 3
         |), tot AS (
         |  SELECT doc_id, SUM(c)::BIGINT AS n FROM cnt GROUP BY 1
         |), xu AS (
         |  SELECT c0.doc_id, c0.source, c0.bucket,
         |         CAST(round(sqrt(c0.c::DOUBLE / t.n) * 1e6) AS BIGINT) AS xu
         |  FROM cnt c0 JOIN tot t USING (doc_id)
         |), cls AS (
         |  SELECT source AS label, COUNT(*)::BIGINT AS n_docs FROM documents GROUP BY 1
         |), cenu AS (
         |  SELECT label, bucket, CAST(round(s::DOUBLE / n_docs) AS BIGINT) AS cu
         |  FROM (SELECT source AS label, bucket, SUM(xu)::BIGINT AS s FROM xu GROUP BY 1, 2)
         |  JOIN cls USING (label)
         |), nrm AS (
         |  SELECT label, SUM(cu * cu)::BIGINT AS norm2 FROM cenu GROUP BY 1
         |), dots AS (
         |  SELECT x.doc_id, u.label, SUM(x.xu * u.cu)::BIGINT AS dot
         |  FROM xu x JOIN cenu u USING (bucket) GROUP BY 1, 2
         |), grid AS (
         |  SELECT d.doc_id, d.source, c.label FROM documents d CROSS JOIN cls c
         |), best AS (
         |  SELECT g.doc_id, g.source, g.label,
         |         row_number() OVER (PARTITION BY g.doc_id ORDER BY
         |           2 * COALESCE(dt.dot, 0) - n.norm2 DESC, g.label ASC) AS r
         |  FROM grid g
         |  LEFT JOIN dots dt ON dt.doc_id = g.doc_id AND dt.label = g.label
         |  JOIN nrm n ON n.label = g.label
         |)
         |SELECT doc_id, source, label AS predicted_source,
         |       (CASE WHEN label = source THEN 1 ELSE 0 END)::BIGINT AS correct
         |FROM best WHERE r = 1""".stripMargin,
    // d65: full SEQUENTIAL train→predict replay of the fixed-point
    // averaged perceptron. The recursive CTE steps one training example
    // per iteration over a FULLY RELATIONAL dense state grid — one row
    // per (class, bucket-touched-by-any-sampled-doc), pre-seeded at 0 so
    // a mistake update never has to CREATE a row (two earlier shapes
    // measured catastrophically slower: carrying the state as a struct
    // list re-evaluates the lateral-UNNESTed expression per element
    // ~20s/step, and plain CTEs get re-inlined into every recursive
    // iteration — hence AS MATERIALIZED on all the prep tables, ~50x).
    // Each step scores the example via one window per class partition,
    // picks argmax with the (−score, label) struct-MIN tie-break, and
    // applies the ±feature deltas in place. Every quantity is int64
    // (+ − × only), so the replay is bit-exact: measured 0 prediction
    // diffs over all 500 sf0.01 docs.
    "d65_perceptron_classifier" ->
      s"""WITH RECURSIVE big AS MATERIALIZED (
         |  SELECT doc_id, list_concat($toks, list_transform(
         |    generate_series(0, greatest(len($toks) - 2, 0)),
         |    i -> array_to_string(($toks)[i + 1 : i + 2], ' '))) AS terms
         |  FROM documents
         |), feat AS MATERIALIZED (
         |  SELECT doc_id AS id, (${phash("term")} % 1024)::INT AS bucket,
         |         COUNT(*)::BIGINT AS c
         |  FROM (SELECT doc_id, UNNEST(terms) AS term FROM big) GROUP BY 1, 2
         |  UNION ALL
         |  SELECT doc_id, (-1)::INT, 1::BIGINT FROM documents
         |), smp AS MATERIALIZED (
         |  SELECT doc_id, source FROM documents
         |  WHERE ${phash("CAST(doc_id AS VARCHAR)")}
         |          % (SELECT greatest(1, COUNT(*) // 240) FROM documents) = 0
         |), ord2 AS MATERIALIZED (
         |  SELECT doc_id, source, row_number() OVER (ORDER BY doc_id) AS rnk,
         |         (SELECT COUNT(*) FROM smp) AS ntr
         |  FROM smp
         |), ex AS MATERIALIZED (
         |  SELECT (e.ep - 1) * o.ntr + o.rnk AS t, o.source AS y, f.bucket, f.c
         |  FROM ord2 o
         |  JOIN feat f ON f.id = o.doc_id
         |  CROSS JOIN (SELECT UNNEST(generate_series(1, 4)) AS ep) e
         |), exy AS MATERIALIZED (
         |  SELECT t, any_value(y) AS y FROM ex GROUP BY t
         |), cls AS MATERIALIZED (SELECT DISTINCT source AS label FROM documents),
         |tmax AS MATERIALIZED (SELECT max(t) AS mt FROM ex),
         |tr AS (
         |  SELECT 1::BIGINT AS t, c.label, b.bucket, 0::BIGINT AS w, 0::BIGINT AS u
         |  FROM cls c, (SELECT DISTINCT bucket FROM ex) b
         |  UNION ALL
         |  SELECT x.t + 1, x.label, x.bucket,
         |         x.w + CASE WHEN x.bst.lb <> x.yy AND x.label = x.yy THEN x.cc
         |                    WHEN x.bst.lb <> x.yy AND x.label = x.bst.lb THEN -x.cc
         |                    ELSE 0 END,
         |         x.u + CASE WHEN x.bst.lb <> x.yy AND x.label = x.yy THEN x.t * x.cc
         |                    WHEN x.bst.lb <> x.yy AND x.label = x.bst.lb THEN -x.t * x.cc
         |                    ELSE 0 END
         |  FROM (
         |    SELECT i.t, i.label, i.bucket, i.w, i.u, i.cc, i.yy,
         |           MIN(struct_pack(ns := -i.score, lb := i.label)) OVER (PARTITION BY i.t) AS bst
         |    FROM (
         |      SELECT tr.t, tr.label, tr.bucket, tr.w, tr.u,
         |             COALESCE(f.c, 0)::BIGINT AS cc, ey.y AS yy,
         |             SUM(tr.w * COALESCE(f.c, 0)) OVER (PARTITION BY tr.t, tr.label) AS score
         |      FROM tr
         |      CROSS JOIN tmax
         |      LEFT JOIN ex f ON f.t = tr.t AND f.bucket = tr.bucket
         |      LEFT JOIN exy ey ON ey.t = tr.t
         |      WHERE tr.t <= tmax.mt
         |    ) i
         |  ) x
         |), mdl AS (
         |  SELECT tr.label, tr.bucket, (tmax.mt * w - u) AS a
         |  FROM tr CROSS JOIN tmax
         |  WHERE t = tmax.mt + 1 AND (tmax.mt * w - u) != 0
         |), dots AS (
         |  SELECT f.id, m.label, SUM(m.a * f.c)::BIGINT AS s
         |  FROM feat f JOIN mdl m USING (bucket) GROUP BY 1, 2
         |), grid AS (
         |  SELECT d.doc_id, d.source, c.label FROM documents d CROSS JOIN cls c
         |), bst AS (
         |  SELECT g.doc_id, g.source, g.label,
         |         row_number() OVER (PARTITION BY g.doc_id ORDER BY
         |           COALESCE(dt.s, 0) DESC, g.label ASC) AS r
         |  FROM grid g LEFT JOIN dots dt ON dt.id = g.doc_id AND dt.label = g.label
         |)
         |SELECT doc_id, source, label AS predicted_source,
         |       (CASE WHEN label = source THEN 1 ELSE 0 END)::BIGINT AS correct
         |FROM bst WHERE r = 1""".stripMargin,
    "d60_source_overlap" -> {
      val p = graft.functions.Dedup.minhashPrime
      val minList = graft.functions.Dedup
        .minhashCoeffs(16)
        .map { case (a, b) => s"MIN((h * $a + $b) % $p)" }
        .mkString("[", ", ", "]")
      s"""$shingleCte, g AS (
         |  SELECT DISTINCT source AS grp, UNNEST(shingles) AS s FROM sh
         |), hh AS (
         |  SELECT grp, s, ('0x' || substr(md5(s), 1, 7))::BIGINT AS h FROM g
         |), sigs AS (
         |  SELECT grp, $minList AS sig, COUNT(*)::BIGINT AS n_grams FROM hh GROUP BY grp
         |), inter AS (
         |  SELECT a.grp AS grp_a, b.grp AS grp_b, COUNT(*)::BIGINT AS n_common
         |  FROM g a JOIN g b ON a.s = b.s AND a.grp < b.grp
         |  GROUP BY grp_a, grp_b
         |)
         |SELECT i.grp_a, i.grp_b, sa.n_grams AS n_grams_a, sb.n_grams AS n_grams_b,
         |       i.n_common,
         |       round(i.n_common::DOUBLE / (sa.n_grams + sb.n_grams - i.n_common), 6)
         |         AS jaccard,
         |       round(len(list_filter(generate_series(1, 16),
         |                             x -> sa.sig[x] = sb.sig[x]))::DOUBLE / 16, 6)
         |         AS est_jaccard
         |FROM inter i
         |JOIN sigs sa ON sa.grp = i.grp_a
         |JOIN sigs sb ON sb.grp = i.grp_b""".stripMargin
    },
    "d59_dimsum_terms" ->
      s"""WITH e AS (
         |  SELECT CAST(doc_id AS VARCHAR) AS doc, tok AS term, COUNT(*)::BIGINT AS tf
         |  FROM (SELECT doc_id, UNNEST($toks) AS tok FROM documents)
         |  GROUP BY doc, tok
         |), p AS (
         |  SELECT term, sqrt(SUM(tf * tf)::DOUBLE) AS nrm,
         |         least(1.0, 30.0 / sqrt(SUM(tf * tf)::DOUBLE)) AS pmin
         |  FROM e GROUP BY term
         |), smp AS (
         |  SELECT e.doc, e.term, e.tf
         |  FROM e JOIN p USING (term)
         |  WHERE ${phash("e.doc || ':' || e.term")}::DOUBLE
         |          / 1152921504606846976.0 < p.pmin
         |), ex AS (
         |  SELECT a.term AS term_a, b.term AS term_b, SUM(a.tf * b.tf)::BIGINT AS dot
         |  FROM e a JOIN e b ON a.doc = b.doc AND a.term < b.term
         |  GROUP BY term_a, term_b
         |), est AS (
         |  SELECT a.term AS term_a, b.term AS term_b, SUM(a.tf * b.tf)::BIGINT AS sdot
         |  FROM smp a JOIN smp b ON a.doc = b.doc AND a.term < b.term
         |  GROUP BY term_a, term_b
         |), j AS (
         |  SELECT ex.term_a, ex.term_b, ex.dot,
         |         round(ex.dot::DOUBLE / (pa.nrm * pb.nrm), 6) AS cos,
         |         round(COALESCE(est.sdot::DOUBLE / (pa.pmin * pb.pmin), 0.0)
         |                 / (pa.nrm * pb.nrm), 6) AS est_cos
         |  FROM ex
         |  LEFT JOIN est ON est.term_a = ex.term_a AND est.term_b = ex.term_b
         |  JOIN p pa ON pa.term = ex.term_a
         |  JOIN p pb ON pb.term = ex.term_b
         |)
         |SELECT term_a, term_b, dot, cos, est_cos,
         |       round(abs(est_cos - cos), 6) AS abs_err
         |FROM j""".stripMargin
  )
}
