package graft

import graft.functions.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark hash join fast"),
    (2L, "hash hash hash table scan"),
    (3L, "slow table scan over rows"),
    (4L, "spark spark spark spark"),
    (5L, "merge sort join table")).toDF("doc_id", "text")

  /** Independent naive BM25 (plain Scala loops over the same formula)
    * — the golden twin of the relational plan. */
  private def naive(qs: Seq[(Long, String)], k: Int): Map[(Long, Long), (Long, Double)] = {
    val docs = Seq(
      1L -> "spark hash join fast", 2L -> "hash hash hash table scan",
      3L -> "slow table scan over rows", 4L -> "spark spark spark spark",
      5L -> "merge sort join table").map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n = docs.size.toDouble
    val avgdl = docs.map(_._2.size).sum.toDouble / n
    val dfm = docs.flatMap(_._2.distinct).groupBy(identity).view.mapValues(_.size).toMap
    val res = scala.collection.mutable.Map[(Long, Long), (Long, Double)]()
    for ((qid, q) <- qs) {
      val terms = q.split("\\s+").distinct.toSeq
      val scored = docs.flatMap { case (did, toks) =>
        val tfm = toks.groupBy(identity).view.mapValues(_.size).toMap
        val matched = terms.filter(tfm.contains)
        if (matched.isEmpty) None
        else {
          val su = matched.map { t =>
            val df = dfm(t).toDouble
            val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            val tf = tfm(t).toDouble
            val part = tf * (Retrieval.k1 + 1.0) /
              (tf + Retrieval.k1 * (1.0 - Retrieval.b + Retrieval.b * toks.size / avgdl))
            math.round(idf * part * 1e6)
          }.sum
          Some((did, matched.size.toLong, su))
        }
      }
      scored.sortBy { case (did, _, su) => (-su, did) }.take(k).foreach {
        case (did, m, su) =>
          res((qid, did)) = (m, math.rint(su / 1e6 * 1e6) / 1e6)
      }
    }
    res.toMap
  }

  test("bm25TopK matches an independent naive implementation") {
    val qs = Seq((1L, "hash table"), (2L, "spark"), (3L, "join missing"))
    val got = Retrieval
      .bm25TopK(corpus, "text", "doc_id", qs.toDF("query_id", "query"),
        "query_id", "query", 3)
      .select($"query_id", $"doc_id", $"n_terms_matched", $"score")
      .as[(Long, Long, Long, Double)].collect()
      .map { case (q, d, m, s) => (q, d) -> (m, s) }.toMap
    val want = naive(qs, 3)
    assert(got == want, s"got=$got want=$want")
  }

  test("rare terms outrank common terms at equal tf, ranks are contiguous per query") {
    // 'merge' appears in one doc, 'table' in three: for the query below
    // doc 5 (merge+table) must beat docs 2/3 (table only)
    val out = Retrieval.bm25TopK(corpus, "text", "doc_id",
        Seq((1L, "merge table")).toDF("query_id", "query"),
        "query_id", "query", 5)
      .orderBy($"rank")
      .select($"doc_id", $"rank").as[(Long, Long)].collect()
    assert(out.head._1 == 5L)
    assert(out.map(_._2).toSeq == (1L to out.length).toSeq)
  }

  test("docs sharing no query term are never scored; absent terms contribute nothing") {
    val out = Retrieval.bm25TopK(corpus, "text", "doc_id",
        Seq((1L, "slow missingterm")).toDF("query_id", "query"),
        "query_id", "query", 5)
      .select($"doc_id", $"n_terms_matched").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((3L, 1L)))
  }

  test("phraseSearch matches a naive sliding-window scan, including overlaps") {
    val phrases = Seq((1L, "hash hash"), (2L, "table scan"), (3L, "spark hash join"),
      (4L, "join"), (5L, "scan hash"))
    val out = Retrieval.phraseSearch(corpus, "text", "doc_id",
        phrases.toDF("phrase_id", "phrase"), "phrase_id", "phrase")
      .select($"phrase_id", $"doc_id", $"n_occurrences", $"first_pos")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (p, d, n, f) => (p, d) -> (n, f) }.toMap
    val docToks = Map(
      1L -> "spark hash join fast", 2L -> "hash hash hash table scan",
      3L -> "slow table scan over rows", 4L -> "spark spark spark spark",
      5L -> "merge sort join table").map { case (k, v) => k -> v.split(" ").toSeq }
    val want = (for {
      (pid, ph) <- phrases; pt = ph.split(" ").toSeq
      (did, toks) <- docToks
      anchors = (0 to toks.size - pt.size).filter(a => toks.slice(a, a + pt.size) == pt)
      if anchors.nonEmpty
    } yield (pid, did) -> ((anchors.size.toLong, anchors.min.toLong))).toMap
    assert(out == want, s"got=$out want=$want")
    // the overlap case really happened: 'hash hash' twice in doc 2
    assert(out((1L, 2L)) == ((2L, 0L)))
    // and the no-match ordering case: 'scan hash' occurs nowhere
    assert(!out.keys.exists(_._1 == 5L))
  }

  test("snippets clamp the window at both document bounds") {
    val ph = Seq((1L, "spark hash"), (2L, "table scan"), (3L, "merge sort")).toDF("phrase_id", "phrase")
    val out = Retrieval.snippets(corpus, "text", "doc_id", ph, "phrase_id", "phrase", window = 2)
      .select($"phrase_id", $"doc_id", $"first_pos", $"snippet_start", $"snippet")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // hit at position 0: start clamps to 0, tail extends 2 past the match
    assert(out((1L, 1L)) == ((0L, 0L, "spark hash join fast")))
    // hit at the end of doc 3 ('table scan' at 1): window truncates at the doc tail
    assert(out((2L, 3L)) == ((1L, 0L, "slow table scan over rows")))
    // hit at the very start of doc 5
    assert(out((3L, 5L)) == ((0L, 0L, "merge sort join table")))
  }

  test("jaccardTopK matches hand-computed distinct-token overlap ratios") {
    // doc 2: toks {hash, table, scan}; query {hash, table}: nm=2, dn=3,
    // nq=2 → 2/3. docs 1 {spark, hash, join, fast} and 5 {merge, sort,
    // join, table}: 1/5 each — tie broken by doc id. doc 3 {slow,
    // table, scan, over, rows}: 1/6 last.
    val out = Retrieval.jaccardTopK(corpus, "text", "doc_id",
        Seq((1L, "hash table")).toDF("query_id", "query"), "query_id", "query", 5)
      .orderBy($"rank")
      .select($"doc_id", $"jaccard").as[(Long, Double)].collect().toSeq
    assert(out.head == ((2L, 0.666667)))
    assert(out.map(_._1) == Seq(2L, 1L, 5L, 3L))
    assert(out.map(_._2) == Seq(0.666667, 0.2, 0.2, 0.166667))
  }

  test("rrfFuse: consensus docs outrank single-list leaders; scores are the exact micro sums") {
    // doc 10 is rank 2 in BOTH lists: 2·1/(60+2) > 1/(60+1) of the
    // single-list leaders
    val l1 = Seq((1L, 7L, 1L), (1L, 10L, 2L), (1L, 8L, 3L)).toDF("query_id", "doc_id", "rank")
    val l2 = Seq((1L, 9L, 1L), (1L, 10L, 2L), (1L, 7L, 4L)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(l1, l2), k = 10)
      .orderBy($"rank")
      .select($"doc_id", $"n_lists", $"rrf_score").as[(Long, Long, Double)].collect().toSeq
    def g(r: Long) = math.round(1e6 / (60.0 + r))
    assert(out.head == ((10L, 2L, math.rint(2 * g(2) / 1e6 * 1e6) / 1e6)))
    // doc 7 (ranks 1+4) beats doc 9 (rank 1 only): g(1)+g(4) > g(1)
    assert(out.map(_._1) == Seq(10L, 7L, 9L, 8L))
    val d7 = out.find(_._1 == 7L).get
    assert(d7._3 == math.rint((g(1) + g(4)).toDouble / 1e6 * 1e6) / 1e6 && d7._2 == 2L)
  }

  test("rankingMetrics matches hand-computed recall/precision/MRR/nDCG") {
    // query 1: ranked docs 1..4, relevant {2, 4, 9} → hits 2,
    // precision 2/4... at k=4: 0.5, recall 2/3, rr = 1/2,
    // dcg = g(2)+g(4), idcg = g(1)+g(2)+g(3) with g(p)=1e6/log2(p+1)
    val ranked = Seq((1L, 10L, 1L), (1L, 2L, 2L), (1L, 11L, 3L), (1L, 4L, 4L),
      (2L, 7L, 1L)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 2L), (1L, 4L), (1L, 9L)).toDF("query_id", "doc_id")
    val got = Retrieval.rankingMetrics(ranked, qrels, "query_id", "doc_id", 4)
      .orderBy($"query_id")
      .select($"query_id", $"n_rel", $"hits", $"precision_at_k", $"recall_at_k", $"rr", $"ndcg_at_k")
      .collect()
    def g(p: Int) = math.round(1e6 / (math.log(p + 1.0) / math.log(2.0)))
    val wantNdcg = math.rint((g(2) + g(4)).toDouble / (g(1) + g(2) + g(3)) * 1e6) / 1e6
    val r1 = got(0)
    assert((r1.getLong(1), r1.getLong(2)) == ((3L, 2L)))
    assert(r1.getDouble(3) == 0.5 && r1.getDouble(4) == math.rint(2.0 / 3 * 1e6) / 1e6)
    assert(r1.getDouble(5) == 0.5)
    assert(r1.getDouble(6) == wantNdcg)
    // query 2 has no qrels at all: n_rel 0, rr 0, recall/ndcg NULL
    val r2 = got(1)
    assert((r2.getLong(1), r2.getLong(2), r2.getDouble(5)) == ((0L, 0L, 0.0)))
    assert(r2.isNullAt(4) && r2.isNullAt(6))
  }

  test("rankingMetrics: duplicated qrel pairs don't fan out hits or DCG") {
    val ranked = Seq((1L, 5L, 1L), (1L, 6L, 2L)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 5L), (1L, 5L), (1L, 5L)).toDF("query_id", "doc_id")
    val r = Retrieval.rankingMetrics(ranked, qrels, "query_id", "doc_id", 2).collect().head
    assert(r.getAs[Long]("n_rel") == 1L && r.getAs[Long]("hits") == 1L &&
      r.getAs[Double]("recall_at_k") == 1.0 && r.getAs[Double]("ndcg_at_k") == 1.0)
  }

  test("rankingMetrics: a qrel query with ZERO ranked rows surfaces as all-zero, not dropped") {
    val ranked = Seq((1L, 5L, 1L)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 5L), (2L, 9L), (2L, 10L)).toDF("query_id", "doc_id")
    val rows = Retrieval.rankingMetrics(ranked, qrels, "query_id", "doc_id", 3)
      .orderBy($"query_id").collect()
    assert(rows.length == 2, rows.mkString(", "))
    val r2 = rows(1)
    assert(r2.getLong(0) == 2L && r2.getAs[Long]("n_rel") == 2L && r2.getAs[Long]("hits") == 0L)
    assert(r2.getAs[Double]("precision_at_k") == 0.0 && r2.getAs[Double]("recall_at_k") == 0.0)
    assert(r2.getAs[Double]("rr") == 0.0 && r2.getAs[Double]("ndcg_at_k") == 0.0)
  }

  test("rankingMetrics: perfect ranking scores ndcg 1.0 and rr 1.0") {
    val ranked = Seq((1L, 5L, 1L), (1L, 6L, 2L)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 5L), (1L, 6L)).toDF("query_id", "doc_id")
    val r = Retrieval.rankingMetrics(ranked, qrels, "query_id", "doc_id", 2).collect().head
    assert(r.getAs[Double]("ndcg_at_k") == 1.0 && r.getAs[Double]("rr") == 1.0 &&
      r.getAs[Double]("recall_at_k") == 1.0)
  }

  test("top-k window compiles to WindowGroupLimit (partial top-k before the shuffle)") {
    val plan = Retrieval.bm25TopK(corpus, "text", "doc_id",
        Seq((1L, "hash table")).toDF("query_id", "query"),
        "query_id", "query", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}
