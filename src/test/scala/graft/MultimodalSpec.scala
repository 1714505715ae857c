package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** The image and audio legs of the multimodal family: REAL JDK codecs
  * (javax.imageio, javax.sound.sampled) behind the binary-column
  * plumbing. The golden tests decode a PNG and a WAV assembled BY HAND
  * (byte-for-byte in this file) — so each decoder is checked against an
  * independent encoder, not merely against itself. */
class MultimodalSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // hand-crafted 2x2 RGB PNG, filter 0, pixels row-major:
  // (10,20,30) (40,50,60) / (70,80,90) (200,150,100)
  private val goldenPng: Array[Byte] = Array[Byte](
    -119, 80, 78, 71, 13, 10, 26, 10, 0, 0, 0, 13, 73, 72, 68, 82, 0, 0, 0,
    2, 0, 0, 0, 2, 8, 2, 0, 0, 0, -3, -44, -102, 115, 0, 0, 0, 22, 73, 68,
    65, 84, 120, -100, 99, -32, 18, -111, -45, 48, -78, 97, 112, 11, -120,
    58, 49, 45, 5, 0, 16, -128, 3, -123, -60, 90, -121, -111, 0, 0, 0, 0,
    73, 69, 78, 68, -82, 66, 96, -126)

  test("golden image: decode of an independently-assembled PNG is exact") {
    val s = Multimodal.decodeImageStats(7L, goldenPng)
    assert(s == Multimodal.ImageStats(7L, 2, 2, 4, 320, 300, 280))
  }

  test("syntheticPng produces real PNG bytes and round-trips every pixel") {
    Seq(0L, 3L, 13L, 27L, 100L).foreach { id =>
      val bytes = Multimodal.syntheticPng(id)
      // PNG magic: an actual encoded stream, not a fake payload
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
      val st = Multimodal.decodeImageStats(id, bytes)
      val (w, h) = (id % 7 + 2, id % 4 + 2)
      assert(st.width == w && st.height == h && st.n_pixels == w * h)
      // closed-form sums: the lossless-round-trip contract the x3 oracle uses
      val grid = for (y <- 0L until h; x <- 0L until w) yield (x, y)
      assert(st.sum_r == grid.map { case (x, y) => (id + 7 * x + 13 * y) % 256 }.sum)
      assert(st.sum_g == grid.map { case (x, y) => (3 * id + 5 * x + 11 * y) % 256 }.sum)
      assert(st.sum_b == grid.map { case (x, y) => (id + x * y) % 256 }.sum)
    }
  }

  test("imagePixelStats runs the binary column through the plan, zero shuffle") {
    val df = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val out = Multimodal.imagePixelStats(df, "doc_id")
    assert(out.count() == 5L)
    assert(out.filter(col("sum_r") < 0 || col("n_pixels") <= 0).count() == 0L)
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"image decode must not shuffle:\n$plan")
  }

  // hand-assembled canonical 44-byte RIFF/WAV header + 4 samples of
  // 8-bit unsigned mono PCM at 8 kHz: 0, 128, 255, 64 — so the decoder
  // is checked against an independent encoder (these bytes), not merely
  // against javax.sound's own writer
  private val goldenWav: Array[Byte] = Array[Byte](
    82, 73, 70, 70, 40, 0, 0, 0, 87, 65, 86, 69, // "RIFF" size=40 "WAVE"
    102, 109, 116, 32, 16, 0, 0, 0, 1, 0, 1, 0, // "fmt " 16 PCM mono
    64, 31, 0, 0, 64, 31, 0, 0, 1, 0, 8, 0, // 8000 Hz, 8000 B/s, align 1, 8 bit
    100, 97, 116, 97, 4, 0, 0, 0, 0, -128, -1, 64) // "data" 4 bytes

  test("golden audio: decode of an independently-assembled WAV is exact") {
    val s = Multimodal.decodeWavStats(7L, goldenWav)
    assert(s == Multimodal.WavStats(7L, 4, 8000, 447, 0, 255))
  }

  test("syntheticWav produces real RIFF bytes and round-trips every sample") {
    Seq(0L, 3L, 13L, 27L, 100L).foreach { id =>
      val bytes = Multimodal.syntheticWav(id)
      // RIFF/WAVE magic: an actual encoded container, not a fake payload
      assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')
      assert(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
      val st = Multimodal.decodeWavStats(id, bytes)
      val n = id % 40 + 8
      val amps = (0L until n).map(i => (id * 31 + i * 17) % 256)
      // closed-form sums: the lossless-round-trip contract the x4 oracle uses
      assert(st == Multimodal.WavStats(id, n, 8000, amps.sum, amps.min, amps.max))
    }
  }

  test("audioSampleStats runs the binary column through the plan, zero shuffle") {
    val df = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val out = Multimodal.audioSampleStats(df, "doc_id")
    assert(out.count() == 5L)
    assert(out.filter(col("sum_amp") < 0 || col("n_samples") <= 0).count() == 0L)
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"audio decode must not shuffle:\n$plan")
  }
}
