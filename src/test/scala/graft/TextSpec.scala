package graft

import graft.functions.{Dedup, Similarity, TextFunctions => TF}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "a"),
    (2L, "the quick brown fox jumps over the lazy cat", "a"),
    (3L, "completely different words entirely unrelated content here", "a"),
    (4L, "THE  Quick   Brown fox jumps over the lazy dog", "b"), // = doc 1 normalized
    (5L, "der hund ist nicht ein problem und das ist gut", "b")
  ).toDF("doc_id", "text", "source")

  test("tokenCount and shingles") {
    val r = docs.select(TF.tokenCount($"text").as("n"), TF.shingles($"text", 3).as("sh"))
      .filter(docs("doc_id") === 1).head()
    assert(r.getAs[Int]("n") == 9)
    val sh = r.getAs[scala.collection.Seq[String]]("sh")
    assert(sh.contains("the quick brown") && sh.contains("the lazy dog"))
    assert(sh.length == 7) // 9 tokens -> 7 trigrams, all distinct
  }

  test("exact dedup groups whitespace/case variants") {
    val d = Dedup.exactDedup(docs, "text", "doc_id").filter($"n_copies" > 1).head()
    assert(d.getAs[Long]("keep_id") == 1L && d.getAs[Long]("n_copies") == 2L)
  }

  test("minhash est_jaccard high for near-dups, low for unrelated") {
    val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id")
      .select($"id_a", $"id_b", $"est_jaccard").as[(Long, Long, Double)].collect().toMap2
    // exact normalized duplicates agree on every signature position
    assert(pairs.get((1L, 4L)).exists(_ == 1.0), s"pairs=$pairs")
    // near-dup docs 1-2 share most shingles -> high estimate when candidate
    pairs.get((1L, 2L)).foreach(j => assert(j > 0.3))
    // unrelated doc 3 must not pair with 1 at high similarity
    pairs.get((1L, 3L)).foreach(j => assert(j < 0.3))
  }

  private implicit class ToMap2(a: Array[(Long, Long, Double)]) {
    def toMap2: Map[(Long, Long), Double] = a.map { case (x, y, j) => ((x, y), j) }.toMap
  }

  test("minhash estimate tracks exact shingle jaccard") {
    // generate doc pairs with controlled overlap: doc i shares a prefix of
    // the vocabulary with doc 0
    val vocab = (1 to 120).map(i => s"w$i")
    val docs2 = (0 until 12).map { i =>
      val words = vocab.drop(i * 10) ++ vocab.take(i * 2) // varying overlap
      (i.toLong, words.mkString(" "), "b")
    }.toDF("doc_id", "text", "source")
    val exact = Dedup.ngramJaccardPairs(docs2, "text", "doc_id", "source")
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => ((a, b), j) }.toMap
    val est = Dedup.minhashLshPairs(docs2, "text", "doc_id")
      .select($"id_a", $"id_b", $"est_jaccard").as[(Long, Long, Double)].collect()
    assert(est.nonEmpty)
    // 16-hash signatures: estimates are coarse but must track the exact
    // value within a wide statistical band
    est.foreach { case (a, b, e) =>
      exact.get((a, b)).foreach { j =>
        assert(math.abs(e - j) < 0.35, s"pair ($a,$b): est=$e exact=$j")
      }
    }
  }

  test("simhash: identical normalized docs hash equal; unrelated differ") {
    val m = docs.select($"doc_id", Dedup.simhash("text").as("s")).as[(Long, Long)].collect().toMap
    assert(m(1L) == m(4L))
    assert(m(1L) != m(3L))
  }

  test("ngram jaccard: near-dups score high within bucket") {
    val j = Dedup.ngramJaccardPairs(docs, "text", "doc_id", "source")
      .filter($"id_a" === 1 && $"id_b" === 2)
      .select($"jaccard").as[Double].head()
    assert(j > 0.5 && j < 1.0)
  }

  test("LSH-band pair generation stays sub-quadratic on a hot attribute bucket") {
    // 200 distinct docs ALL in one source bucket + 5 exact duplicates:
    // attribute-bucketed all-pairs scores every pair (O(B²) in the hot
    // bucket); LSH-band candidates scale with the true near-dup count.
    val distinct = (1 to 200).map { i =>
      (i.toLong, (1 to 12).map(j => s"w${i}x$j").mkString(" "), "hot")
    }
    val dups = (1 to 5).map { i =>
      (200L + i, (1 to 12).map(j => s"w${i}x$j").mkString(" "), "hot")
    }
    val df = (distinct ++ dups).toDF("doc_id", "text", "source")
    val allPairs = Dedup.ngramJaccardPairs(df, "text", "doc_id", "source").count()
    assert(allPairs == 205L * 204 / 2) // the quadratic blowup this replaces
    val viaLsh = Dedup.ngramJaccardViaLsh(df, "text", "doc_id").cache()
    val n = viaLsh.count()
    assert(n < allPairs / 20, s"LSH candidates $n not sub-quadratic vs $allPairs")
    // and every true duplicate pair is still found, at jaccard 1.0
    val found = viaLsh.filter($"jaccard" === 1.0)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    (1 to 5).foreach { i => assert(found.contains((i.toLong, 200L + i))) }
    viaLsh.unpersist()
  }

  test("lang id: english vs german stopwords") {
    val m = docs.select($"doc_id", TF.predictLang($"text").as("l")).as[(Long, String)].collect().toMap
    assert(m(1L) == "en")
    assert(m(5L) == "de")
  }

  test("cosine topk: self-similar vectors rank first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.05f, 0.0f))
    ).toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", 2)
      .select($"rank", $"corpus_id").as[(Long, Long)].collect().toMap
    assert(topk(1L) == 1L) // nearest is the almost-parallel vector
    assert(topk(2L) == 2L) // then the orthogonal one beats the antiparallel
  }

  test("embedding near-dup groups: similar vectors cluster, anti-parallel stays out") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.01f)),
      (2L, Array(0.97f, 0.15f, 0.02f)),
      (3L, Array(-1.0f, 0.05f, 0.0f))
    ).toDF("vec_id", "embedding")
    val g = Similarity.embeddingNearDupGroups(vecs, "vec_id", "embedding", 0.9, nBits = 1, nBands = 3)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(Seq(0L, 1L, 2L).forall(id => g(id).getAs[Long]("group_id") == 0L))
    assert(g(0L).getAs[Long]("group_size") == 3L && g(0L).getAs[Long]("is_canonical") == 1L)
    assert(g(3L).getAs[Long]("group_id") == 3L && g(3L).getAs[Long]("group_size") == 1L)
  }

  test("lsh topk is a subset of brute-force candidates with same scores") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 5)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 3)
      .select($"query_id", $"corpus_id", $"cos_sim").as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => ((a, b), c) }.toMap
    val lsh = Similarity.lshTopK(e, q, "vec_id", "embedding", 3, nBits = 4)
      .select($"query_id", $"corpus_id", $"cos_sim").as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    // any pair also present in brute force must carry the identical score
    lsh.foreach { case (a, b, c) => bf.get((a, b)).foreach(s => assert(s == c)) }
  }

  test("ivf topk candidates score identically to brute force where they overlap") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 8)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select($"query_id", $"corpus_id", $"cos_sim").as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => ((a, b), c) }.toMap
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding", 5)
      .select($"query_id", $"corpus_id", $"cos_sim").as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case (a, b, c) => bf.get((a, b)).foreach(s => assert(s == c)) }
    // probing 2 of 16 lists should still recover a fair share of true top-5
    val recall = ivf.count { case (a, b, _) => bf.contains((a, b)) }.toDouble / bf.size
    assert(recall > 0.2, s"recall=$recall")
  }

  test("multimodal: payload roundtrip and deterministic stub features") {
    val feats = Multimodal
      .extractFeatures(Multimodal.withBinaryPayload(docs, "text"), "doc_id", "payload")
      .collect()
      .map(f => f.id -> f)
      .toMap
    assert(feats(1L).n_bytes == docs.filter($"doc_id" === 1).head().getAs[String]("text").length)
    assert(feats(1L).feature.length == 8)
    assert(math.abs(feats(1L).feature.sum - 1.0) < 1e-9) // histogram normalized
  }

  test("JL projection approximately preserves pairwise squared distances") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter($"vec_id" < 30)
    val orig = e.select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .as[(Long, Array[Double])].collect().toMap
    val proj = graft.functions.Similarity
      .jlProjected(e, "vec_id", "embedding", 64, 16)
      .as[(Long, Array[Double])].collect().toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- orig.keys.toSeq.sorted; j <- orig.keys.toSeq.sorted if i < j
    } yield d2(proj(i), proj(j)) / d2(orig(i), orig(j))
    // E[ratio] = 1 by the JL lemma; at outDim=16 per-pair std ~ sqrt(2/16)
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.2, s"mean distance ratio $mean")
    val inBand = ratios.count(r => r > 0.3 && r < 1.9).toDouble / ratios.size
    assert(inBand > 0.8, s"only ${inBand * 100}%% of pairs within the JL band")
  }

  test("multimodal: frame sampling slices, samples, and checksums bytes") {
    // 10-byte payload, 4 frames -> chunk=3: [abc][def][ghi][j]; every 2nd
    // frame keeps idx 0 and 2
    val d = Seq((1L, "abcdefghij", 4), (2L, "xy", 0)).toDF("doc_id", "text", "nf")
    val frames = Multimodal.sampleFrames(
      d.withColumn("payload", $"text".cast("binary")), "doc_id", "payload", "nf", 2)
      .collect().map(f => (f.id, f.frame_idx) -> f).toMap
    assert(frames.keySet == Set((1L, 0L), (1L, 2L)), "nf=0 docs emit nothing")
    assert(frames((1L, 0L)).n_bytes == 3L && frames((1L, 2L)).n_bytes == 3L)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(frames((1L, 0L)).checksum == md5hex("abc"))
    assert(frames((1L, 2L)).checksum == md5hex("ghi"))
  }

  test("repetition metrics: repeated spans flagged, diverse text passes") {
    val rep = ("spam " * 20).trim                       // 20 tokens, all repeated
    val div = (1 to 20).map(i => s"w$i").mkString(" ")  // 20 tokens, all distinct
    val d = Seq(
      (1L, rep),
      (2L, div),
      (3L, "one two three four five six seven eight nine ten") // short: never flagged
    ).toDF("doc_id", "text")
    val m = TF.repetitionMetrics(d, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: every bigram is "spam spam" -> top fraction 1.0, all 3-grams dup
    assert(m(1L).getAs[Double]("top_bigram_frac") == 1.0)
    assert(m(1L).getAs[Double]("dup_3gram_frac") > 0.8)
    assert(m(1L).getAs[Long]("repetition_flag") == 1L)
    // doc 2: long enough for the thresholds but fully diverse -> clean
    assert(m(2L).getAs[Double]("dup_3gram_frac") == 0.0)
    assert(m(2L).getAs[Long]("repetition_flag") == 0L)
    // doc 3: below minTokens — top_bigram_frac has a 1/9 floor (> 0.08),
    // but the short-doc guard keeps the flag off (metrics still reported)
    assert(m(3L).getAs[Double]("top_bigram_frac") > 0.08)
    assert(m(3L).getAs[Long]("n_tokens") == 10L)
    assert(m(3L).getAs[Long]("repetition_flag") == 0L)
  }

  test("vocab stats: counts, doc frequency, Zipf rank, shares sum to 1") {
    val d = Seq(
      (1L, "alpha alpha beta"),
      (2L, "alpha gamma")
    ).toDF("doc_id", "text")
    val v = TF.vocabStats(d, "text", "doc_id")
      .collect().map(r => r.getAs[String]("token") -> r).toMap
    assert(v("alpha").getAs[Long]("n_occurrences") == 3L)
    assert(v("alpha").getAs[Long]("n_docs") == 2L)
    assert(v("alpha").getAs[Long]("freq_rank") == 1L)
    assert(v("beta").getAs[Long]("n_docs") == 1L)
    // ties on count rank by token: beta before gamma
    assert(v("beta").getAs[Long]("freq_rank") == 2L)
    assert(v("gamma").getAs[Long]("freq_rank") == 3L)
    assert(math.abs(v.values.map(_.getAs[Double]("corpus_share")).sum - 1.0) < 1e-9)
  }

  test("gopher rules: clean prose passes, structural defects fail the right gates") {
    // 60 words of plausible prose incl. >=2 required stopwords, no symbols
    val clean = ("the quick brown fox jumps over that lazy dog with " * 6).trim
    val bullets = (1 to 5).map(i => s"- item $i of the list").mkString("\n")
    val symbols = ("the tag#one tag#two " * 20).trim // >10% hash-to-word
    val short = "the cat sat with that hat"
    val d = Seq((1L, clean), (2L, bullets), (3L, symbols), (4L, short))
      .toDF("doc_id", "text")
    val g = TF.gopherRules(d, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(g(1L).getAs[Long]("gopher_pass") == 1L)
    assert(g(1L).getAs[Long]("n_words") == 60L)
    assert(g(1L).getAs[Long]("n_stopwords_hit") >= 2L)
    // every line is a bullet -> bullet_line_frac = 1.0 > 0.9 cap
    assert(g(2L).getAs[Double]("bullet_line_frac") == 1.0)
    assert(g(2L).getAs[Long]("gopher_pass") == 0L)
    // 40 of 60 words carry '#'-symbols -> ratio well above 0.1
    assert(g(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(g(3L).getAs[Long]("gopher_pass") == 0L)
    // under the 50-word floor
    assert(g(4L).getAs[Long]("gopher_pass") == 0L)
  }

  test("connected components match union-find on random graphs") {
    // brute-force referee: path-compressed union-find
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
      ids.map(x => x -> find(x)).toMap
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 20
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val got = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(n, edges)
      assert(got == want, s"trial $trial: components diverge from union-find")
    }
  }

  test("connected components: 200-node chain converges in O(log n) star rounds") {
    // worst case for label propagation (diameter = n); the alternating
    // star algorithm must still resolve it within the default round cap
    val chain = (0L until 199L).map(i => (i, i + 1))
    val got = Dedup.connectedComponents(chain.toDF("a", "b"), "a", "b").collect()
    assert(got.length == 200 && got.forall(_.getLong(1) == 0L))
  }

  test("near-dup groups are transitive: A~B, B~C puts A,B,C in one group") {
    // B overlaps heavily with both A and C, but A and C share little —
    // the per-pair keep-first view cannot merge them; components must
    val a = (1 to 12).map(i => s"tok$i").mkString(" ")
    val b = (3 to 14).map(i => s"tok$i").mkString(" ")
    val c = (5 to 16).map(i => s"tok$i").mkString(" ")
    val d = Seq((10L, a), (20L, b), (30L, c), (40L, "totally unrelated other words entirely"))
      .toDF("doc_id", "text")
    val g = Dedup.nearDupGroups(d, "text", "doc_id", minEstJaccard = 0.2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(g.size == 4, "one row per input doc")
    val cluster = Seq(10L, 20L, 30L).map(id => g(id).getAs[Long]("group_id")).distinct
    assert(cluster == Seq(10L), s"expected one group rooted at 10, got roots $cluster")
    assert(Seq(10L, 20L, 30L).map(id => g(id).getAs[Long]("group_size")).forall(_ == 3L))
    assert(g(10L).getAs[Long]("is_canonical") == 1L)
    assert(g(20L).getAs[Long]("is_canonical") == 0L)
    assert(g(40L).getAs[Long]("group_id") == 40L && g(40L).getAs[Long]("group_size") == 1L)
  }

  test("contamination: overlap with the eval set, eval grams broadcast") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // shares grams with eval
      (2L, "uno dos tres cuatro cinco seis")         // disjoint
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, "alpha beta gamma delta unrelated tail")).toDF("doc_id", "text")
    val all = Dedup.contaminationReport(train, eval_, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: 4 of its 4-token prefix trigrams hit ("alpha beta gamma",
    // "beta gamma delta" present; others not) — just assert directionally
    assert(all(1L).getAs[Long]("n_contaminated") >= 2L)
    assert(all(1L).getAs[Double]("contamination") > 0.0)
    assert(all(2L).getAs[Long]("n_contaminated") == 0L)
    // threshold keeps only contaminated docs, comparing raw counts
    val flagged = Dedup.contaminationReport(train, eval_, "text", "doc_id",
      minContamination = 0.1).collect()
    assert(flagged.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    // the plan must broadcast the eval-gram side, not shuffle-join it
    val plan = Dedup.contaminationReport(train, eval_, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("setSimJoinExact is lossless vs brute-force all-pairs on random docs") {
    // 60 random docs over a 30-word vocab with planted near-dups: the
    // prefix-filtered join must return EXACTLY the brute-force result
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 30).map(i => s"w$i")
    val base = (1 to 40).map { i =>
      (i.toLong, Seq.fill(8 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // 20 near-dups: copy a base doc and perturb one word
    val dups = (1 to 20).map { i =>
      val (srcId, text) = base(rnd.nextInt(base.size))
      val words = text.split(" ")
      words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.size))
      (1000L + i, words.mkString(" "))
    }
    val d = (base ++ dups).toDF("doc_id", "text")
    val fast = Dedup.setSimJoinExact(d, "text", "doc_id", minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sh = d.select(col("doc_id"), TF.shingles(col("text"), 3).as("sh"))
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id"), col("b.doc_id"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("j"))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    assert(fast == brute, s"missing=${brute -- fast} extra=${fast -- brute}")
    assert(brute.nonEmpty, "fixture must produce at least one qualifying pair")
  }

  test("setSimJoinExact: a corpus-wide hot token never becomes a join key") {
    // every doc shares token 'the' (max df) but docs are otherwise
    // disjoint — rarest-first prefixes exclude 'the', so the candidate
    // join must stay empty instead of going quadratic on the hot key
    val d = (1 to 50)
      .map(i => (i.toLong, s"the alpha$i beta$i gamma$i delta$i epsilon$i"))
      .toDF("doc_id", "text")
    val out = Dedup.setSimJoinExact(d, "text", "doc_id", minJaccard = 0.4)
    assert(out.count() == 0)
  }

  test("fuzzy contamination: near-dup of an eval doc flagged, unrelated not") {
    val evalDoc = "the quick brown fox jumps over the lazy dog every single morning"
    val nearDup = "the quick brown fox jumps over the lazy dog every single evening"
    val train = Seq(
      (1L, nearDup),                                  // 1-word edit of eval doc
      (2L, "completely different content about spark window aggregation plans")
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val out = Dedup.fuzzyContamination(train, eval_, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("train_id") -> r).toMap
    assert(out.keySet == Set(1L), s"expected only doc 1 flagged, got ${out.keySet}")
    assert(out(1L).getAs[Long]("n_eval_matches") == 1L)
    // 12-token docs, 10 distinct trigrams each; only the final trigram
    // differs -> 9 shared of 11 union
    assert(math.abs(out(1L).getAs[Double]("max_jaccard") - 9.0 / 11.0) < 1e-9)
    // both eval-side tables must broadcast (bands + shingle sets)
    val plan = Dedup.fuzzyContamination(train, eval_, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("quality score within [0,1] and favors diverse text") {
    val scores = docs.select($"doc_id", TF.qualityScore($"text").as("q")).as[(Long, Double)].collect().toMap
    scores.values.foreach(q => assert(q >= 0.0 && q <= 1.0))
    assert(scores(3L) > 0.0)
  }

  test("cross-doc gram stats count shared spans, not within-doc repeats") {
    // 3-grams: docs 1 and 2 share the span "a b c d" (two 3-gram
    // positions); doc 3 repeats its own gram but shares nothing
    val d = Seq(
      (1L, "a b c d x y"),
      (2L, "q a b c d z"),
      (3L, "r r r r r r")).toDF("doc_id", "text")
    val m = TF.crossDocGramStats(d, "text", "doc_id", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Long]("n_grams") == 4L)
    assert(m(1L).getAs[Long]("n_dup_grams") == 2L) // "a b c", "b c d"
    assert(m(2L).getAs[Long]("n_dup_grams") == 2L)
    assert(m(3L).getAs[Long]("n_dup_grams") == 0L) // self-repeat is not cross-doc
    assert(m(1L).getAs[Double]("dup_fraction") == 0.5)
    assert(m(1L).getAs[Long]("dup_flag") == 1L) // 2/4 >= 1/5
    assert(m(3L).getAs[Long]("dup_flag") == 0L)
  }

  test("fuzzy join: length blocking is lossless vs the unblocked cross join") {
    // |len(a)-len(b)| <= 2 is necessary for lev(a,b) <= 2, so the
    // length-bucket candidate join must return EXACTLY the cross-join set
    val words = Seq("kitten", "sitten", "sitting", "cat", "cart", "chart",
      "spark", "shark", "sharp", "a", "ab", "abcd").toDF("tok")
    val full = words.as("a").crossJoin(words.as("b"))
      .filter(col("a.tok") < col("b.tok") &&
        levenshtein(col("a.tok"), col("b.tok")) <= 2)
      .select(col("a.tok").as("ta"), col("b.tok").as("tb"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val left = words.select(col("tok").as("tok_a"),
      explode(sequence(length(col("tok")) - 2, length(col("tok")) + 2)).as("len_b"))
    val right = words.select(col("tok").as("tok_b"), length(col("tok")).as("len_b"))
    val blocked = left.join(right, Seq("len_b"))
      .filter(col("tok_a") < col("tok_b") &&
        levenshtein(col("tok_a"), col("tok_b")) <= 2)
      .select(col("tok_a"), col("tok_b"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(blocked == full)
    assert(full.contains(("cart", "cat")) && full.contains(("shark", "spark")))
    assert(!full.contains(("a", "abcd"))) // lev 3, len diff 3: blocked AND filtered
  }

  test("pii: realistic entities detected and redacted, clean text untouched") {
    val d = Seq(
      (1L, "Mail jane.doe+spam@sub.example.co.uk or call 212-555-0187."),
      (2L, "Server at 192.168.1.254 timed out; retry 8.8.8.8"),
      (3L, "No pii here, just words and the number 42.")).toDF("doc_id", "text")
    val r = d.select(
      (Seq(col("doc_id")) ++ TF.piiCounts(col("text")) :+
        TF.redactPii(col("text")).as("red")): _*)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Long]("n_emails") == 1L && r(1L).getAs[Long]("n_phones") == 1L)
    assert(r(1L).getAs[String]("red") == "Mail <EMAIL> or call <PHONE>.")
    assert(r(2L).getAs[Long]("n_ips") == 2L)
    assert(r(2L).getAs[String]("red") == "Server at <IP> timed out; retry <IP>")
    assert(r(3L).getAs[Long]("n_emails") + r(3L).getAs[Long]("n_phones") +
      r(3L).getAs[Long]("n_ips") == 0L)
    assert(r(3L).getAs[String]("red") == "No pii here, just words and the number 42.")
  }

  test("novelty: shared shingles score low, unique docs score 1.0, self-repeats don't inflate df") {
    val corpus = Seq(
      (1L, "a b c d e"),            // shares 'a b c'/'b c d' with doc 2
      (2L, "a b c d x"),
      (3L, "p q r s t"),            // fully unique
      (4L, "m n o m n o m n o")     // self-repeating: distinct shingles still df=1
    ).toDF("doc_id", "text")
    val got = TF.novelty(corpus, "text", "doc_id", n = 3)
      .select($"doc_id", $"n_shingles", $"n_novel", $"novelty")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // doc 1: shingles {abc, bcd, cde} — abc/bcd shared with doc 2 → 1/3
    assert(got(1L) == ((1L, 3L, 1L, 0.333333)))
    assert(got(2L) == ((2L, 3L, 1L, 0.333333)))
    assert(got(3L) == ((3L, 3L, 3L, 1.0)))
    // doc 4: distinct shingles {mno, nom, onm←no...} appear ONLY here —
    // within-doc repetition must not make them look shared
    assert(got(4L)._4 == 1.0)
  }

  test("pmiCollocations matches a naive count-based PMI, floors support, orders by PMI") {
    val corpus = Seq(
      "new york new york new york",
      "new york is big",
      "the the the the the",
      "big apple big apple big apple new york").map(Tuple1(_)).toDF("text")
    val got = TF.pmiCollocations(corpus, "text", minCount = 3, topK = 10)
      .select($"t1", $"t2", $"c_ab", $"pmi").as[(String, String, Long, Double)]
      .collect().toSeq
    // naive twin
    val toks = Seq("new york new york new york", "new york is big",
      "the the the the the", "big apple big apple big apple new york")
      .map(_.split(" ").toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = toks.flatten.size.toDouble
    val bgs = toks.flatMap(ts => ts.zip(ts.tail))
    val bTot = bgs.size.toDouble
    val bc = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = bc.filter(_._2 >= 3).map { case ((a, b2), cab) =>
      (a, b2, cab,
        math.rint(math.log(cab * t * t / (bTot * uni(a) * uni(b2))) * 1e6) / 1e6)
    }.toSeq.sortBy { case (a, b2, _, p) => (-p, a, b2) }
    assert(got == want, s"got=$got want=$want")
    // 'new york' (always adjacent) must out-PMI 'the the' (self-pair of
    // a frequent word) — the discrimination the measure exists for
    val gm = got.map(r2 => (r2._1, r2._2) -> r2._4).toMap
    assert(gm(("new", "york")) > gm(("the", "the")))
  }
}
