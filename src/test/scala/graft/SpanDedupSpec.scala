package graft

import graft.functions.Dedup
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Span-level exact-substring dedup (ExactSubstr apply): sliding-gram
  * duplicate detection, maximal-span merge, first-occurrence retention. */
class SpanDedupSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int): Map[Long, Row] =
    Dedup
      .spanDedupApply(docs.toDF("doc_id", "text"), "text", "doc_id", k)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap

  test("cross-doc repeated phrase: first occurrence intact, later one loses the maximal span") {
    val out = run(
      Seq(
        1L -> "a b c d e f",
        2L -> "x y a b c d z"),
      k = 3)
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_spans") === 0L)
    assert(d1.getAs[String]("cleaned_text") === "a b c d e f")
    // doc 2 shares grams "a b c" (pos 2) and "b c d" (pos 3): covers
    // [2,4] U [3,5] merge to ONE span [2,5] — all four shared tokens out
    val d2 = out(2L)
    assert(d2.getAs[Long]("n_spans") === 1L)
    assert(d2.getAs[Long]("removed_tokens") === 4L)
    assert(d2.getAs[String]("cleaned_text") === "x y z")
    assert(d2.getAs[Double]("removed_fraction") === 0.571429) // round(4/7, 6)
  }

  test("internal repetition: only the first instance within the doc survives") {
    val out = run(Seq(1L -> "p q r s p q r s"), k = 3)
    val d = out(1L)
    // dup gram starts at pos 4 ("p q r") and 5 ("q r s") -> span [4,7]
    assert(d.getAs[String]("cleaned_text") === "p q r s")
    assert(d.getAs[Long]("removed_tokens") === 4L)
    assert(d.getAs[Long]("n_spans") === 1L)
  }

  test("doc shorter than k is untouched and emits zero spans") {
    val out = run(Seq(1L -> "a b", 2L -> "a b"), k = 3)
    assert(out.values.forall(_.getAs[Long]("n_spans") === 0L))
    assert(out.values.forall(_.getAs[String]("cleaned_text") === "a b"))
  }

  test("exact duplicate doc is fully removed (empty cleaned text, fraction 1)") {
    val out = run(
      Seq(
        1L -> "one two three four five six seven eight nine",
        2L -> "one two three four five six seven eight nine"),
      k = 3)
    assert(out(1L).getAs[String]("cleaned_text") === "one two three four five six seven eight nine")
    val d2 = out(2L)
    assert(d2.getAs[String]("cleaned_text") === "")
    assert(d2.getAs[Long]("removed_tokens") === 9L)
    assert(d2.getAs[Double]("removed_fraction") === 1.0)
  }

  test("disjoint repeats stay separate spans; count reflects maximal islands") {
    val out = run(
      Seq(
        1L -> "a b c z1 z2 z3 d e f",
        2L -> "a b c y1 y2 y3 d e f"),
      k = 3)
    val d2 = out(2L)
    assert(d2.getAs[Long]("n_spans") === 2L)
    assert(d2.getAs[Long]("removed_tokens") === 6L)
    assert(d2.getAs[String]("cleaned_text") === "y1 y2 y3")
  }

  test("chunk-misaligned repeat is caught (the upgrade over passage dedup)") {
    // the shared phrase starts at pos 1 in doc 2 — a fixed 3-token
    // passage grid would split it across chunks and keep every chunk
    val out = run(
      Seq(
        1L -> "m n o p q r",
        2L -> "w m n o p q r"),
      k = 3)
    assert(out(2L).getAs[String]("cleaned_text") === "w")
    assert(out(2L).getAs[Long]("removed_tokens") === 6L)
  }
}
