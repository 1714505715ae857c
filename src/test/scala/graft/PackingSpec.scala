package graft

import graft.functions.Packing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("packSequences: concat-and-split positions, per-stratum streams") {
    val d = Seq(
      ("s1", 1L, 100L), ("s1", 2L, 200L), ("s1", 3L, 50L),
      ("s2", 4L, 300L) // independent stream: packing restarts per stratum
    ).toDF("source", "doc_id", "n_tokens")
    val r = Packing.packSequences(d, "source", "doc_id", "n_tokens", seqLen = 128)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("tok_start"), x.getAs[Long]("start_seq"),
          x.getAs[Long]("end_seq"), x.getAs[Long]("seq_offset"))).toMap
    assert(r(1L) == (0L, 0L, 0L, 0L))        // tokens [0,100) -> seq 0 only
    assert(r(2L) == (100L, 0L, 2L, 100L))    // [100,300) spans seqs 0..2
    assert(r(3L) == (300L, 2L, 2L, 44L))     // [300,350) inside seq 2
    assert(r(4L) == (0L, 0L, 2L, 0L))        // s2 restarts at 0
  }

  test("chunkTokens: sliding windows cover every token with fixed overlap") {
    val d = Seq((1L, (1 to 11).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Packing.chunkTokens(d, "text", "doc_id", chunkSize = 4, stride = 3)
      .orderBy("chunk_id").collect()
    assert(chunks.map(_.getAs[Long]("chunk_id")).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(chunks.map(_.getAs[Long]("tok_offset")).toSeq == Seq(0L, 3L, 6L, 9L))
    assert(chunks.head.getAs[String]("chunk_text") == "t1 t2 t3 t4")
    assert(chunks(2).getAs[String]("chunk_text") == "t7 t8 t9 t10")
    assert(chunks(3).getAs[String]("chunk_text") == "t10 t11") // clipped tail
    // consecutive chunks overlap by chunkSize - stride = 1 token
    val toks = chunks.map(_.getAs[String]("chunk_text").split(" ").toSeq)
    assert(toks.sliding(2).forall { w => w(0).takeRight(1) == w(1).take(1) })
    // short doc: one clipped chunk, never zero
    val short = Packing.chunkTokens(
      Seq((2L, "a b")).toDF("doc_id", "text"), "text", "doc_id", 4, 3).collect()
    assert(short.length == 1 && short.head.getAs[String]("chunk_text") == "a b")
    // no shuffle: chunking is per-row array arithmetic + explode
    val plan = Packing.chunkTokens(d, "text", "doc_id", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
