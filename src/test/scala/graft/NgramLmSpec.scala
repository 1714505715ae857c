package graft

import graft.functions.NgramLm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bigram LM scoring: hand-checked probabilities on a tiny corpus, OOV
  * folding, train/score split, and the filter composition. */
class NgramLmSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("hand-checked add-k bigram probabilities") {
    // corpus: "a b" x3, "a c" x1 → bigrams: (a,b)=3, (a,c)=1; c1(a)=4
    // vocab {a,b,c}, V=3 (all in vocab, no <unk>), k=0.5:
    //   P(b|a) = (3+0.5)/(4+1.5) = 7/11;  P(c|a) = (1+0.5)/(4+1.5) = 3/11
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c")
    ).toDF("doc_id", "text")
    val out = NgramLm.bigramScores(docs, "text", "doc_id", vocabSize = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob"))).toMap
    val lpB = math.log(7.0 / 11.0)
    val lpC = math.log(3.0 / 11.0)
    assert(out(1L)._1 == 1L)
    assert(math.abs(out(1L)._2 - lpB) < 1e-5, s"got ${out(1L)._2}, want $lpB")
    assert(math.abs(out(4L)._2 - lpC) < 1e-5, s"got ${out(4L)._2}, want $lpC")
    // the common doc scores higher (less negative) than the rare one
    assert(out(1L)._2 > out(4L)._2)
  }

  test("OOV tokens fold to <unk> and still score") {
    // vocabSize=2 keeps the two most frequent tokens; the rest become
    // <unk> — every doc still gets a score (no dropped bigrams when
    // scoring the training corpus itself)
    val docs = Seq(
      (1L, "x x x y"), (2L, "x y z q"), (3L, "z q r s")
    ).toDF("doc_id", "text")
    val out = NgramLm.bigramScores(docs, "text", "doc_id", vocabSize = 2)
    assert(out.count() == 3)
    assert(out.agg(sum("n_bigrams")).as[Long].head() == 9L) // 3+3+3 bigrams
  }

  test("docs under two tokens are excluded; ppl = exp(-avg_logprob)") {
    val docs = Seq((1L, "solo"), (2L, "two tokens here")).toDF("doc_id", "text")
    val rows = NgramLm.bigramScores(docs, "text", "doc_id").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(2L))
    val r = rows.head
    val expected = math.exp(-r.getAs[Double]("avg_logprob"))
    assert(math.abs(r.getAs[Double]("ppl") - expected) < 1e-4)
  }

  test("sample-trained model scores the full corpus (train/serve split)") {
    val docs = (1L to 40L).map(i => (i, if (i % 2 == 0) "a b a b" else "a c a c"))
      .toDF("doc_id", "text")
    val out = NgramLm.bigramScores(
      docs, "text", "doc_id", vocabSize = 10,
      trainDocs = Some(docs.filter($"doc_id" <= 20)))
    assert(out.count() == 40, "every doc scored even when trained on half")
  }

  test("perplexityFilter keeps low-perplexity docs") {
    val docs = (
      (1L to 20L).map(i => (i, "the quick brown fox jumps")) :+
        (99L, "zzz qqq vvv kkk www")
    ).toDF("doc_id", "text")
    // repeated docs: P(quick|the)=(20.5)/(20+0.5·10)=0.82 → ppl ≈ 1.22;
    // the outlier's singleton bigrams: P=(1.5)/(1+5)=0.25 → ppl = 4.0
    val out = NgramLm.perplexityFilter(docs, "text", "doc_id", maxPpl = 2.0)
    val keep = out.filter($"keep").select("doc_id").as[Long].collect().toSet
    assert(keep.contains(1L) && !keep.contains(99L),
      s"repetitive docs must pass, the outlier must fail; kept=$keep")
  }
}
