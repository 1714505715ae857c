package graft

import graft.functions.expressions.Md5PrefixLong
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused md5-prefix hash must equal the portable composed form
  * bit-for-bit — the value IS the cross-engine contract. */
class Md5PrefixLongSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def composed(c: org.apache.spark.sql.Column, nibbles: Int) =
    conv(substring(md5(c), 1, nibbles), 16, 10).cast("long")

  private val samples = Seq(
    "", "a", "the quick brown fox", "ñandú überstraße 東京", "0",
    "a b c d e f g h", "x" * 500) ++ (0 until 200).map(i => s"doc$i token$i")

  test("fused == composed for both widths used by the engine (7 and 15 nibbles)") {
    val df = samples.toDF("s")
    for (nib <- Seq(7, 15)) {
      val diff = df
        .select(
          Md5PrefixLong.col(col("s"), nib).as("fused"),
          composed(col("s"), nib).as("composed"))
        .filter(col("fused") =!= col("composed"))
        .count()
      assert(diff === 0L, s"nibbles=$nib")
    }
  }

  test("interpreted eval path matches too, and hashes are non-negative") {
    samples.foreach { s =>
      val fused = Md5PrefixLong.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 15)
      assert(fused >= 0L)
      val want = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(
          s.getBytes("UTF-8")).substring(0, 15), 16)
      assert(fused === want, s)
    }
  }

  test("null input stays null") {
    val r = Seq((1, Option.empty[String]), (2, Some("x")))
      .toDF("id", "s")
      .select(Md5PrefixLong.col(col("s"), 15).as("h"))
      .collect()
    assert(r.count(_.isNullAt(0)) === 1)
    assert(r.count(!_.isNullAt(0)) === 1)
  }
}
