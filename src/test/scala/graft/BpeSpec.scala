package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the BPE kernel — training is iterative (not
  * SQL-oracle-able), so the classic Sennrich example locks it, the way
  * DtwSpec locks the DTW kernel. */
class BpeSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // the BPE-paper corpus: low×5, lower×2, newest×6, widest×3
  private lazy val corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

  test("first merges match the reference algorithm (with lexicographic ties)") {
    val merges = Bpe.train(corpus, "text", 5)
    assert(merges.map(m => (m.left, m.right)) == Seq(
      ("e", "s"),            // count 9, wins the 9-tie lexicographically
      ("es", "t"),           // 9
      ("est", "</w>"),       // 9
      ("l", "o"),            // 7, wins the (l,o)/(o,w) tie
      ("lo", "w")))          // 7
  }

  test("encodeWord applies merges in rank order: lowest -> low + est</w>") {
    val merges = Bpe.train(corpus, "text", 5)
    assert(Bpe.encodeWord("lowest", merges) == Vector("lo" + "w", "est" + Bpe.EndOfWord))
    // unseen characters survive as singles
    assert(Bpe.encodeWord("lox", merges) == Vector("lo", "x", Bpe.EndOfWord))
  }

  test("training stops when no pair repeats") {
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text")
    // every adjacent pair occurs once -> zero merges, no infinite loop
    assert(Bpe.train(tiny, "text", 10).isEmpty)
  }

  test("tokenCounts: distinct words encode once, counts join back") {
    val merges = Bpe.train(corpus, "text", 5)
    val counts = Bpe.tokenCounts(corpus, "text", "doc_id", merges)
      .agg(sum("n_words"), sum("n_bpe_tokens")).as[(Long, Long)].head()
    assert(counts._1 == 16L) // 5+2+6+3 words
    // low -> [lo w </w>]? after (lo,w): [low </w>] = ... encodeWord("low"):
    // l o w </w> -> (l,o) -> lo w </w> -> (lo,w) -> low </w> = 2 tokens
    val lowToks = Bpe.encodeWord("low", merges).length
    assert(lowToks == 2)
    // newest -> n e w est</w> after (e,s),(es,t),(est,</w>) = 4 tokens
    assert(Bpe.encodeWord("newest", merges).length == 4)
  }

  test("merge list round-trips through the versioned ModelStore") {
    val root = java.nio.file.Files.createTempDirectory("bpe_store").toString + "/m"
    val m5 = Bpe.train(corpus, "text", 5)
    val m3 = m5.take(3)
    val v1 = graft.sources.ModelStore.save(Bpe.mergesTable(spark, m3), root)
    val v2 = graft.sources.ModelStore.save(Bpe.mergesTable(spark, m5), root)
    // current = v2 (full model); VERSION AS OF v1 = the 3-merge model
    assert(Bpe.fromTable(graft.sources.ModelStore.load(spark, root)) == m5)
    assert(Bpe.fromTable(graft.sources.ModelStore.load(spark, root, Some(v1))) == m3)
    assert(v2 > v1)
    // tokenization under the old vocabulary differs exactly as expected
    val oldToks = Bpe.encodeWord("lowest",
      Bpe.fromTable(graft.sources.ModelStore.load(spark, root, Some(v1))))
    assert(oldToks == Vector("l", "o", "w", "est" + Bpe.EndOfWord))
  }

  test("determinism: retraining yields the identical merge list") {
    val a = Bpe.train(corpus.repartition(7), "text", 5)
    val b = Bpe.train(corpus, "text", 5)
    assert(a == b)
  }
}
