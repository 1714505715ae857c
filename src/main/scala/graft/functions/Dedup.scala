package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design (100 TB):
  *   - exact dedup is one hash aggregate on the fingerprint — fully
  *     partial-aggregated, no skew risk beyond genuinely hot documents;
  *   - MinHash LSH avoids the O(n²) all-pairs comparison: signatures are
  *     computed per row (map-side), candidates come from an equi-join on
  *     (band_id, band_hash) buckets, and exact Jaccard verification runs
  *     only on candidates;
  *   - SimHash reduces each doc to a 60-bit value; near-dup = equal bucket
  *     (or small Hamming distance) — again an equi-join, not a cross join;
  *   - plain n-gram Jaccard is exposed for *bucketed* pair generation
  *     only (never unbucketed all-pairs).
  */
object Dedup {

  /** Exact dedup: one row per distinct fingerprint, keeping the lowest id
    * as the canonical document, with the duplicate count. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextFunctions.fingerprint(col(textCol)).as("fingerprint"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"),
        (count(lit(1)) - 1).as("n_duplicates"))

  /** MinHash universe: a prime modulus below 2^28 and a fixed family of
    * affine hash functions h_i(x) = (A_i·x + B_i) mod P over a 28-bit base
    * hash. Products stay below 2^56 — no 64-bit overflow in Spark OR the
    * DuckDB oracle (which errors on BIGINT overflow rather than wrapping).
    * ONE md5 per shingle; the per-seed hashes are cheap arithmetic. */
  val minhashPrime: Long = 268435399L // largest prime < 2^28
  def minhashCoeffs(numHashes: Int): Seq[(Long, Long)] =
    (1 to numHashes).map { i =>
      ((1234567L * i) % minhashPrime | 1L, (7654321L * i) % minhashPrime)
    }

  /** Exact Jaccard of two DISTINCT-element arrays: |A∪B| is computed
    * arithmetically as |A| + |B| − |A∩B| instead of materializing the
    * union array per candidate pair — the counts are identical integers
    * (both inputs are [[TextFunctions.shinglesOf]] sets), so the
    * division is bit-identical, and the verify step builds one array
    * per pair instead of two (per-task-work cut; the intersect
    * subexpression is eliminated by codegen CSE in the Project). */
  private def setJaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** 28-bit portable base hash (first 7 hex chars of md5). */
  def baseHash(c: Column): Column =
    // fused digest→long (≡ conv(substring(md5(c), 1, 7), 16, 10) bit-
    // for-bit, locked by Md5PrefixLongSpec) — no hex/conv string stages
    graft.functions.expressions.Md5PrefixLong.col(c.cast("string"), 7)

  /** Per-document MinHash signatures via explode + ONE hash aggregate:
    * rows (id, shingle) → base hash → groupBy(id) with numHashes `min`
    * aggregates. Fully partial-aggregated (map-side combine), no nested
    * lambda re-evaluation, one shuffle by id. Documents with no shingles
    * (empty text) drop out. */
  def minhashSignatures(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int,
      numHashes: Int): DataFrame = {
    val hashed = df
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(
        col("id"),
        explode(TextFunctions.shinglesOf(col("__toks"), shingleSize)).as("s"))
      .select(col("id"), baseHash(col("s")).as("h"))
    sigFromHashed(hashed, "id", numHashes, countAs = None)
  }

  /** Shared MinHash signature tail: per-key `sig` array (and optional
    * row count) from base-hashed shingle rows — the ONE place the
    * signature contract (coeffs × prime over `h`) is spelled out, so the
    * d3/d23 doc-level family and d60's group-level signatures cannot
    * silently diverge. */
  private def sigFromHashed(
      hashed: DataFrame,
      keyCol: String,
      numHashes: Int,
      countAs: Option[String]): DataFrame = {
    val coeffs = minhashCoeffs(numHashes)
    val aggs = coeffs.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % minhashPrime).as(s"m$i")
    } ++ countAs.map(n => count(lit(1)).as(n)).toSeq
    val out = Seq(col(keyCol), array(coeffs.indices.map(i => col(s"m$i")): _*).as("sig")) ++
      countAs.map(col).toSeq
    hashed.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*).select(out: _*)
  }

  /** MinHash-LSH candidate pairs: band the signature, bucket-join on
    * (band index, band hash), emit distinct (id_a < id_b) pairs with their
    * estimated Jaccard (fraction of matching signature positions).
    *
    * rowsPerBand=2, numHashes=16 → 8 bands: pairs with Jaccard ~>0.3 are
    * likely candidates. The signature table (one short row per doc) is
    * cached — it is read four times (two band sides, two est-join sides);
    * at production scale persist it to storage instead. */
  def minhashLshPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 2): DataFrame = {
    val (sigs, pairs) =
      lshSignaturesAndPairs(df, textCol, idCol, shingleSize, numHashes, rowsPerBand, cacheSigs = true)
    pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), m => m))
          .cast("double") / size(col("sig_a"))).as("est_jaccard"))
  }

  /** Shared LSH core: signature table + banded-bucket candidate pairs
    * (id_a < id_b, distinct). The pair-generation join is on
    * (band, bucket) — candidate count scales with the number of TRUE
    * near-dup groups, not with any coarse attribute's group size.
    * `cacheSigs`: cache the signature table when the caller reads it
    * several times (minhashLshPairs: 4 reads); the cache lives until
    * `spark.catalog.clearCache()`, so callers that only need the pairs
    * pass false and pay one recompute instead of an unbounded leak. */
  private def lshSignaturesAndPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int,
      numHashes: Int,
      rowsPerBand: Int,
      cacheSigs: Boolean): (DataFrame, DataFrame) = {
    val numBands = numHashes / rowsPerBand
    val raw = minhashSignatures(df, textCol, idCol, shingleSize, numHashes)
    val sigs = if (cacheSigs) raw.cache() else raw
    val banded = bandBuckets(sigs, numBands, rowsPerBand)
    val pairs = banded.as("a")
      .join(banded.as("b"), col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    (sigs, pairs)
  }

  /** Band a signature table (id, sig) into LSH buckets: one row per
    * (id, band) with the band's portable hash — the equi-join key for all
    * candidate generation. */
  private def bandBuckets(sigs: DataFrame, numBands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(
      col("id"),
      explode(
        transform(
          sequence(lit(0), lit(numBands - 1)),
          b =>
            struct(
              b.as("band"),
              TextFunctions
                .portableHash(
                  array_join(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), "_"))
                .as("bucket")))).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

  /** EXACT set-similarity self-join via prefix filtering (AllPairs /
    * PPJoin family): every pair with shingle Jaccard >= `minJaccard`,
    * with NO false negatives — the deterministic complement to the
    * probabilistic [[minhashLshPairs]] path (LSH misses pairs a band
    * never catches; audits and dedup-correctness gates want the exact
    * set).
    *
    * Candidate generation: order the token universe rarest-first, re-sort
    * each doc's shingle set in that order, and emit only each doc's first
    * s − ceil(t·s) + 1 tokens as join keys: two sets with Jaccard >= t
    * MUST share a prefix token (if all prefix tokens differed, the
    * overlap cannot reach the threshold), so joining prefixes loses
    * nothing. Pair pruning adds the length filter t·|a| <= |b| (a
    * shorter set can never clear t against a much longer one). Skew-safe
    * by construction: prefixes hold each doc's RAREST tokens, so hot
    * tokens never become join keys. Exact Jaccard verifies candidates,
    * as in [[ngramJaccardViaLsh]].
    *
    * The order is (document frequency asc, token asc) compared DIRECTLY
    * as a struct sort key — the prefix theorem needs a consistent total
    * order, not a materialized global RANK, so no global numbering, no
    * driver action, no cached vocabulary table: one df aggregate and one
    * join-back, all lazy. (Measured: an eager localCheckpoint of the
    * prefix table to dodge the self-join's double compute was SLOWER
    * than recomputing — block materialization cost more than the
    * pipeline.) */
  def setSimJoinExact(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      minJaccard: Double = 0.4): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1, s"minJaccard in (0,1], got $minJaccard")
    val sets = df
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("id"), TextFunctions.shinglesOf(col("__toks"), shingleSize).as("sh"))
    val toks = sets.select(col("id"), explode(col("sh")).as("g"))
    val dfTab = toks.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val ranked = toks
      .join(dfTab, Seq("g"))
      .groupBy(col("id"))
      .agg(
        sort_array(collect_list(struct(col("df"), col("g")))).as("rtoks"),
        count(lit(1)).as("s"))
    val prefix = ranked.select(
      col("id"),
      col("s"),
      posexplode(slice(
        col("rtoks"),
        lit(1),
        (col("s") - ceil(col("s") * minJaccard) + 1).cast("int"))).as(Seq("pos0", "tokStruct")))
      .select(
        col("id"), col("s"), (col("pos0") + 1).as("pos"), col("tokStruct.g").as("tok"))
    // PPJoin's POSITIONAL filter on top of prefix + length (Xiao et al.
    // 2008, public paper): a token match at prefix positions (i, j) can
    // contribute at most 1 + min(s_a−i, s_b−j) to the overlap (both
    // prefixes are in the same global (df, g) order, so every LATER
    // shared token sits after i AND after j), and J ≥ t needs overlap
    // ≥ ⌈t/(1+t)·(s_a+s_b)⌉. A true pair's FIRST shared prefix token
    // always passes its own bound, so pruning matches that fail it is
    // lossless — it only drops candidate pairs whose every prefix
    // collision sits too deep to reach the threshold.
    val alpha = ceil((col("a.s") + col("b.s")) * (minJaccard / (1.0 + minJaccard)))
    val candidates = prefix.as("a")
      .join(
        prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          col("b.s") * minJaccard <= col("a.s") && col("a.s") * minJaccard <= col("b.s") &&
          lit(1) + least(col("a.s") - col("a.pos"), col("b.s") - col("b.pos")) >= alpha)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    candidates
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        setJaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** FUZZY train-vs-eval contamination ([[contaminationReport]] is the
    * exact-n-gram form): MinHash-band the two corpora separately, take
    * candidate (train, eval) pairs from shared (band, bucket) keys, score
    * ONLY the candidates with exact shingle-set Jaccard, and report per
    * train doc how many eval docs it near-duplicates and how closely.
    * Catches paraphrased/partially-edited benchmark leakage that exact
    * n-gram overlap underweights.
    *
    * Shape at scale: the eval side (benchmark suites — MBs against a
    * 100 TB corpus) is BROADCAST twice (banded keys, then shingle sets);
    * the train side pays one signature aggregate and never joins against
    * itself — candidate count scales with true cross-corpus overlap. */
  def fuzzyContamination(
      train: DataFrame,
      evalSet: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 2,
      minJaccard: Double = 0.2): DataFrame = {
    val numBands = numHashes / rowsPerBand
    def banded(df: DataFrame) = bandBuckets(
      minhashSignatures(df, textCol, idCol, shingleSize, numHashes), numBands, rowsPerBand)
    val candidates = banded(train)
      .join(broadcast(banded(evalSet).withColumnRenamed("id", "eval_id")), Seq("band", "bucket"))
      .select(col("id").as("train_id"), col("eval_id"))
      .distinct()
    val trainSh = train
      .select(col(idCol).as("train_id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("train_id"), TextFunctions.shinglesOf(col("__toks"), shingleSize).as("sh_t"))
    val evalSh = evalSet
      .select(col(idCol).as("eval_id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("eval_id"), TextFunctions.shinglesOf(col("__toks"), shingleSize).as("sh_e"))
    candidates
      .join(trainSh, Seq("train_id"))
      .join(broadcast(evalSh), Seq("eval_id"))
      .select(
        col("train_id"),
        col("eval_id"),
        setJaccard(col("sh_t"), col("sh_e")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
      .groupBy(col("train_id"))
      .agg(
        count(lit(1)).as("n_eval_matches"),
        max(col("jaccard")).as("max_jaccard"))
  }

  /** Exact n-gram Jaccard over LSH-BAND candidate pairs: pair generation
    * is the MinHash banded bucket join (sub-quadratic — a hot attribute
    * bucket costs nothing unless its members really are near-duplicates),
    * then the exact shingle-set Jaccard is verified only on candidates.
    * This replaces attribute-bucketed all-pairs ([[ngramJaccardPairs]])
    * as the 100 TB path: with B-row buckets that one is O(B²) per bucket,
    * this one is O(candidates). */
  def ngramJaccardViaLsh(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 2): DataFrame = {
    // signatures feed only the band self-join here (two reads): recompute
    // rather than leak an uncollectable cached table into the session
    val (_, pairs) =
      lshSignaturesAndPairs(df, textCol, idCol, shingleSize, numHashes, rowsPerBand, cacheSigs = false)
    val sh = df
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("id"), TextFunctions.shinglesOf(col("__toks"), shingleSize).as("sh"))
    pairs
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        setJaccard(col("sh_a"), col("sh_b")).as("jaccard"))
  }

  /** SimHash: majority vote over token-hash bits, packed into a 60-bit
    * long. Near-duplicates share the value (or differ in few bits —
    * compare with bit_count(a ^ b)). */
  def simhash(textCol: String, bits: Int = 60): Column = {
    val hashes = transform(TextFunctions.tokens(col(textCol)), t => TextFunctions.portableHash(t))
    val n = size(hashes)
    // 2^b as long (exact: powers of two are exactly representable doubles;
    // the Scala DSL's shiftleft only accepts a literal Int shift)
    def bit(b: Column): Column = pow(lit(2.0), b.cast("double")).cast("long")
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, b) =>
        acc + when(size(filter(hashes, h => h.bitwiseAND(bit(b)) =!= 0)) * 2 > n, bit(b))
          .otherwise(0L))
  }

  /** Connected components over an undirected pair list, via the
    * alternating large-star / small-star algorithm (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", ACM SoCC 2014 —
    * public paper). Returns `(id, component)` where `component` is the
    * minimum id in the component; vertices that appear in no pair are
    * absent (callers coalesce missing ids to themselves).
    *
    * Why not plain min-label propagation: its round count is the graph
    * DIAMETER — a transitive near-dup chain (A~B~C~...) across a 100 TB
    * corpus can be arbitrarily long. Star alternation converges in
    * O(log²ⁿ) rounds regardless of diameter; each round is two
    * groupBy-min + equi-join passes (4 shuffles), and `localCheckpoint`
    * truncates the iterative plan so round N's lineage doesn't stack on
    * N−1's. The per-round convergence check is a count + except — a
    * driver-side scalar per round, like any iterative graph algorithm,
    * never a collect of the data. */
  def connectedComponents(
      pairs: DataFrame,
      leftCol: String,
      rightCol: String,
      maxIter: Int = 50): DataFrame = {
    // Two-step init: checkpoint the bare projection FIRST, so the
    // caller's plan is flattened to a leaf before distinct() runs.
    // Computing an Aggregate's constraints directly over some caller
    // plans (e.g. a union of projected ranges) trips Spark's
    // Union.rewriteConstraints ("key not found" on the aliased
    // attribute); a leaf input sidesteps the whole constraint rewrite.
    val raw = pairs
      .select(col(leftCol).cast("long").as("u"), col(rightCol).cast("long").as("v"))
      .localCheckpoint()
    var b = raw
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    // large-star: every neighbor v > u re-points to the minimum of u's
    // closed neighborhood — long chains contract toward the component min
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.join(m, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // small-star: orient edges high→low, re-point every low endpoint (and
    // the center) to the minimum — flattens local trees into stars
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      val m = dir.groupBy("u").agg(min(col("v")).as("m"))
      dir.join(m, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    var done = b.isEmpty
    var iter = 0
    while (!done && iter < maxIter) {
      val next = smallStar(largeStar(b)).localCheckpoint()
      done = next.count() == b.count() && next.except(b).isEmpty
      b = next
      iter += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "raise maxIter (rounds grow O(log² n), so this indicates a pathological input)")
    // fixpoint is a star forest: every edge is (member, root) with
    // root = component minimum
    b.select(col("u").as("id"), col("v").as("component"))
      .union(b.select(col("v").as("id"), col("v").as("component")))
      .distinct()
  }

  /** Near-duplicate GROUP resolution — the step after candidate pairs in
    * a production dedup pipeline: LSH pairs at/above `minEstJaccard` →
    * connected components → one canonical doc per transitive cluster.
    * A~B and B~C land A, B, C in ONE group even when A and C share no
    * LSH bucket ([[nearDupIdsToDrop]]'s per-pair keep-first cannot see
    * that). Returns one row per input doc: `(idCol, group_id,
    * group_size, is_canonical)`; docs with no near-dup form singleton
    * groups. The components table is tiny next to the corpus (only docs
    * that appear in a pair), so the join back is broadcast-able / AQE
    * territory, never a corpus-vs-corpus shuffle. */
  def nearDupGroups(
      df: DataFrame,
      textCol: String,
      idCol: String,
      minEstJaccard: Double = 0.5,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 2): DataFrame =
    groupsFromPairs(
      df, idCol,
      minhashLshPairs(df, textCol, idCol, shingleSize, numHashes, rowsPerBand)
        .filter(col("est_jaccard") >= minEstJaccard))

  /** Attach transitive group ids from an undirected pair list to EVERY
    * row of `df`: connected components over the pairs, then a left join
    * back (rows in no pair become singleton groups). Output per row:
    * `(idCol, group_id, group_size, is_canonical)` with group_id = the
    * component minimum. Shared tail of [[nearDupGroups]] and
    * [[graft.functions.Similarity.embeddingNearDupGroups]]. */
  def groupsFromPairs(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      leftCol: String = "id_a",
      rightCol: String = "id_b"): DataFrame = {
    val cc = connectedComponents(pairs, leftCol, rightCol)
    df.select(col(idCol))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("component"), col(idCol)).cast("long").as("group_id"))
      .withColumn(
        "group_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("group_id"))))
      .withColumn("is_canonical", when(col(idCol) === col("group_id"), 1L).otherwise(0L))
  }

  /** Keep-first near-dup removal: from the LSH candidate pairs at or
    * above `minEstJaccard`, drop the higher id of each pair (every
    * cluster keeps its lowest id). Returns the ids to DROP. */
  def nearDupIdsToDrop(
      df: DataFrame,
      textCol: String,
      idCol: String,
      minEstJaccard: Double): DataFrame =
    minhashLshPairs(df, textCol, idCol)
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("id_b").as("drop_id"))
      .distinct()

  /** Exact n-gram Jaccard for candidate pairs within a bucket column
    * (e.g. same source, same LSH bucket): |A ∩ B| / |A ∪ B| over distinct
    * shingles. Bucketed by design — never call on an unbucketed table.
    * NOTE this is O(B²) within a B-row bucket: for near-dup detection at
    * scale prefer [[ngramJaccardViaLsh]], whose candidate generation is
    * the banded MinHash join (a hot attribute bucket costs nothing).
    * Kept for genuinely small, semantically meaningful buckets where ALL
    * pair scores are wanted, not just near-duplicates'. */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      bucketCol: String,
      shingleSize: Int = 3): DataFrame = {
    val sh = df
      .select(
        col(bucketCol).as("bucket"),
        col(idCol).as("id"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(
        col("bucket"),
        col("id"),
        TextFunctions.shinglesOf(col("__toks"), shingleSize).as("sh"))
    val a = sh.select(col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(
        col("bucket"),
        col("id_a"),
        col("id_b"),
        setJaccard(col("sh_a"), col("sh_b")).as("jaccard"))
  }

  /** Benchmark decontamination: per training document, the fraction of its
    * distinct word n-grams that also appear anywhere in an evaluation set
    * (the standard n-gram-overlap contamination check of public pipeline
    * reports — GPT-3 appendix C, Dolma §4, both public papers). Returns
    * `(id, n_grams, n_contaminated, contamination)` for docs at or above
    * `minContamination`.
    *
    * Shape at scale: the eval side (benchmark suites — MBs against a
    * 100 TB corpus) collapses to DISTINCT n-grams and BROADCASTS; the
    * train side explodes once and aggregates by doc id — one shuffle of
    * the gram table, no join of corpus against corpus. The threshold
    * compares raw counts (`n_hit >= n_total * frac`), not a rounded
    * ratio, so flagging is bit-stable across engines. */
  def contaminationReport(
      train: DataFrame,
      evalSet: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      minContamination: Double = 0.0): DataFrame = {
    val evalGrams = evalSet
      .select(TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(explode(TextFunctions.shinglesOf(col("__toks"), shingleSize)).as("g"))
      .distinct()
      .withColumn("hit", lit(1L))
    train
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(TextFunctions.shinglesOf(col("__toks"), shingleSize)).as("g"))
      .join(broadcast(evalGrams), Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        count(col("hit")).as("n_contaminated"))
      .filter(col("n_contaminated").cast("double") >= col("n_grams") * lit(minContamination))
      .withColumn(
        "contamination",
        round(col("n_contaminated").cast("double") / col("n_grams"), 6))
  }

  /** Passage-level dedup APPLY: split every document into consecutive
    * `passageTokens`-token passages, keep only the corpus-wide FIRST
    * occurrence of each passage (ordered by doc id, then position), and
    * reassemble the cleaned documents — the ccnet/RefinedWeb-style
    * remove-duplicated-paragraphs stage ([[crossDocSubstringStats]] is
    * its measurement half). A fully deduplicated document comes back
    * with empty `cleaned_text`, not dropped — the caller decides.
    *
    * Scale shape: one explode (n_tokens/passageTokens rows per doc), one
    * window over the passage fingerprint (shuffle by fp — skew-free:
    * a fingerprint's group is exactly its duplicate set), one group-back
    * by doc. No joins, no driver state. */
  def passageDedupApply(
      df: DataFrame,
      textCol: String,
      idCol: String,
      passageTokens: Int = 10): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val nChunks = ceil(size(toks).cast("double") / passageTokens).cast("int")
    val passages = transform(
      sequence(lit(0), greatest(nChunks, lit(1)) - 1),
      i => array_join(slice(toks, i * passageTokens + 1, lit(passageTokens)), " "))
    val w = Window
      .partitionBy(col("fp"))
      .orderBy(col("id").asc, col("pos").asc)
    df.select(col(idCol).as("id"), posexplode(passages).as(Seq("pos", "passage")))
      .withColumn("fp", TextFunctions.portableHash(col("passage")))
      .withColumn("keep", row_number().over(w) === 1)
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_passages"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"), struct(col("pos"), col("passage"))))),
            s => s.getField("passage")),
          " ").as("cleaned_text"))
      .withColumn("dedup_fraction",
        round(lit(1.0) - col("n_kept").cast("double") / col("n_passages"), 6))
  }

  /** Cross-group corpus overlap (source ↔ source): for every pair of
    * groups, the exact Jaccard of their distinct-shingle sets alongside
    * the MinHash-signature estimate — the "how much does source A repeat
    * source B" matrix that decides dedup ordering and mixture weights in
    * a multi-source corpus.
    *
    * Scale shape: the per-group signature is `numHashes` longs of
    * MERGEABLE aggregate state (one hash agg over the distinct gram
    * table) — at 100 TB that is the production path, 16 longs per source
    * regardless of corpus size. The exact intersection self-joins the
    * (group, gram) table on the gram: a gram fans out only to the groups
    * containing it (<= |groups|, never |docs|), so the join is bounded by
    * vocabulary × groups; it rides along here as the estimate's verifier
    * (same split as d6 / m32). */
  def groupOverlap(
      df: DataFrame,
      textCol: String,
      groupCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16): DataFrame = {
    val grams = df
      .select(col(groupCol).as("grp"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(
        col("grp"),
        explode(TextFunctions.shinglesOf(col("__toks"), shingleSize)).as("s"))
      .distinct()
    val sigs = sigFromHashed(
      grams.select(col("grp"), baseHash(col("s")).as("h")),
      "grp", numHashes, countAs = Some("n_grams"))
    val inter = grams.as("a")
      .join(grams.as("b"), col("a.s") === col("b.s") && col("a.grp") < col("b.grp"))
      .groupBy(col("a.grp").as("grp_a"), col("b.grp").as("grp_b"))
      .agg(count(lit(1)).as("n_common"))
    val matches = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0),
      (acc, e) => acc + e)
    inter
      .join(
        sigs.select(
          col("grp").as("grp_a"), col("sig").as("sig_a"), col("n_grams").as("n_grams_a")),
        Seq("grp_a"))
      .join(
        sigs.select(
          col("grp").as("grp_b"), col("sig").as("sig_b"), col("n_grams").as("n_grams_b")),
        Seq("grp_b"))
      .select(
        col("grp_a"),
        col("grp_b"),
        col("n_grams_a"),
        col("n_grams_b"),
        col("n_common"),
        round(
          col("n_common").cast("double")
            / (col("n_grams_a") + col("n_grams_b") - col("n_common")), 6).as("jaccard"),
        round(matches.cast("double") / numHashes, 6).as("est_jaccard"))
  }

  /** Span-level exact-substring dedup APPLY (the ExactSubstr operator of
    * Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better" — public paper), at word-`k`-gram granularity: every maximal
    * duplicated run of >= k consecutive tokens is removed wherever it is
    * NOT the corpus-wide first occurrence (lowest `(doc_id, pos)`).
    * Unlike [[passageDedupApply]]'s fixed disjoint chunks, spans here
    * start at ANY token offset — sliding k-grams — so a phrase repeated
    * mid-sentence is caught regardless of passage alignment, and
    * overlapping duplicated grams merge into one maximal span
    * (gaps-and-islands over their `[pos, pos+k-1]` covers; contiguous
    * spans merge too).
    *
    * Scale shape (100 TB): the paper builds a monolithic suffix array —
    * inherently single-machine. The relational equivalent: (1) sliding
    * k-grams with positions (one explode, ~n_tokens rows/doc); (2) first
    * occurrence per gram via `min(struct(id, pos))` — a PARTIAL-AGGREGATED
    * hash agg, deliberately NOT a `row_number` window: a boilerplate gram
    * repeated 10M times would pile one window partition 10M rows deep,
    * while map-side `min` combines it away; (3) join grams back to the
    * duplicated-gram dictionary (skew-safe: per-gram state is one row);
    * (4) per-DOC windows to merge islands (bounded by doc length);
    * (5) the cleaned text is rebuilt IN-ROW — span lists join back to
    * the token arrays and an indexed filter lambda drops covered
    * positions — so no token-level explode or shuffle ever happens;
    * only docs that contain duplicated spans join anything. */
  def spanDedupApply(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, s"span gram size must be >= 2, got $k")
    val base = df.select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("tk"))
    // sliding k-grams with 0-based start positions; docs shorter than k
    // emit none (Spark's sequence(0, negative) would count DOWN — guard it)
    val gramArr = when(
      size(col("tk")) >= k,
      transform(
        sequence(lit(0), size(col("tk")) - k),
        p => array_join(slice(col("tk"), p + 1, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))
    // the gram STRING never shuffles: a 128-bit fingerprint — two
    // differently-seeded xxhash64 values — is the agg and join key
    // (16 bytes vs ~8 words of text — the NgramLm narrow-key lesson).
    // One 64-bit hash would collide with odds ~B²/2^65 (~1e-4 at 100M
    // distinct grams) and a collision silently over-removes a span,
    // breaking the bit-exactness contract with the oracle (which groups
    // by the gram TEXT). The salted second hash is the SAME xxhash64
    // family, so the pair isn't two independent draws and the clean
    // 2^-129 birthday figure doesn't strictly apply — but a pair
    // collision still needs one gram pair to collide in BOTH seeded
    // values, which is effectively 128-bit in practice: unobservable at
    // any corpus size.
    val grams = base
      .select(col("id"), posexplode(gramArr).as(Seq("pos", "gram")))
      .select(
        col("id"), col("pos"),
        xxhash64(col("gram")).as("fp"),
        xxhash64(lit("graft.span.fp2"), col("gram")).as("fp2"))
    // corpus-wide first occurrence per duplicated gram: min(struct) orders
    // lexicographically by (id, pos) — exactly ORDER BY doc_id, pos
    val firstOcc = grams
      .groupBy(col("fp"), col("fp2"))
      .agg(min(struct(col("id"), col("pos"))).as("f"), count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .select(col("fp"), col("fp2"), col("f.id").as("fid"), col("f.pos").as("fpos"))
    val dupStarts = grams
      .join(firstOcc, Seq("fp", "fp2"))
      .filter(!(col("id") === col("fid") && col("pos") === col("fpos")))
      .select(col("id"), col("pos"))
    // merge overlapping/contiguous [pos, pos+k-1] covers into maximal spans
    val wDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    val spans = dupStarts
      .withColumn("e", col("pos") + (k - 1))
      .withColumn(
        "prev_end",
        max(col("e")).over(wDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn(
        "new_island",
        when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1L).otherwise(0L))
      .withColumn(
        "island",
        sum(col("new_island")).over(wDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("id"), col("island"))
      .agg(min(col("pos")).as("span_start"), max(col("e")).as("span_end"))
    // per-doc span list (few rows per affected doc) joined back to the
    // token ARRAYS: the cleaned text is rebuilt by an indexed filter
    // lambda per row — codegen'd, NO token-level explode or shuffle.
    // Only docs that actually contain duplicated spans join anything.
    val spansPerDoc = spans
      .groupBy(col("id"))
      .agg(
        collect_list(struct(col("span_start"), col("span_end"))).as("sp"),
        count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start") + 1).as("removed_tokens"))
    base
      .join(spansPerDoc, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        size(col("tk")).cast("long").as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("removed_tokens"), lit(0L)).as("removed_tokens"),
        round(
          coalesce(col("removed_tokens"), lit(0L)).cast("double") / size(col("tk")), 6)
          .as("removed_fraction"),
        array_join(
          when(col("sp").isNull, col("tk")).otherwise(
            filter(
              col("tk"),
              (_, i) =>
                !exists(
                  col("sp"),
                  s => i >= s.getField("span_start") && i <= s.getField("span_end")))),
          " ").as("cleaned_text"))
  }
}
