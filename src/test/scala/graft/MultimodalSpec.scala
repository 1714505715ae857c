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

  // ---- video leg (x5) ----------------------------------------------------

  /** A 2-frame 3×2 animated GIF assembled BYTE BY BYTE — header, logical
    * screen descriptor, 4-entry grayscale color table, two image
    * descriptors, and hand-packed LZW (clear code, literal codes, end
    * code; 3-bit pixels → minimum code size 2, 3-bit codes) — so the
    * decoder is checked against an independent encoder, not itself.
    * Frame 0 pixels: 0,1,2 / 3,0,1   frame 1: 1,2,3 / 0,1,2. */
  private val goldenGif: Array[Byte] = {
    def lzw(pixels: Seq[Int], minCodeSize: Int): Array[Byte] = {
      // uncompressed-style LZW: CLEAR, then every pixel as a literal
      // code, then EOI — packed LSB-first per the GIF spec. The code
      // WIDTH must track the decoder's table exactly: the decoder adds
      // one entry per code from the SECOND post-clear code onward, and
      // widens when its next free code reaches 2^width
      val clear = 1 << minCodeSize
      val eoi = clear + 1
      var width = minCodeSize + 1
      var nextCode = eoi + 1
      var first = true
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var cur = 0L; var nbits = 0
      def write(code: Int): Unit = {
        cur |= (code.toLong << nbits); nbits += width
        while (nbits >= 8) { out += (cur & 0xff).toByte; cur >>= 8; nbits -= 8 }
      }
      write(clear)
      pixels.foreach { p =>
        write(p)
        if (first) first = false
        else { nextCode += 1; if (nextCode == (1 << width) && width < 12) width += 1 }
      }
      write(eoi)
      if (nbits > 0) out += (cur & 0xff).toByte
      out.toArray
    }
    def u16(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
    b ++= "GIF89a".getBytes("US-ASCII")
    b ++= u16(3); b ++= u16(2) // logical screen 3×2
    // packed: global color table, 2-bit color resolution, 4 entries (2^(1+1))
    b += 0xf1.toByte; b += 0; b += 0
    // 4-entry grayscale table: 0, 85, 170, 255
    Seq(0, 85, 170, 255).foreach { v =>
      b += v.toByte; b += v.toByte; b += v.toByte
    }
    def frame(pixels: Seq[Int]): Unit = {
      b += 0x2c // image descriptor
      b ++= u16(0); b ++= u16(0); b ++= u16(3); b ++= u16(2)
      b += 0 // no local table, not interlaced
      b += 2 // LZW minimum code size (4 colors)
      val data = lzw(pixels, 2)
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        b += n.toByte
        b ++= data.slice(off, off + n)
        off += n
      }
      b += 0 // block terminator
    }
    frame(Seq(0, 1, 2, 3, 0, 1))
    frame(Seq(1, 2, 3, 0, 1, 2))
    b += 0x3b // trailer
    b.toArray
  }

  test("golden video: demux + decode of an independently-assembled animated GIF is exact") {
    val frames = Multimodal.decodeGifFrameStats(9L, goldenGif)
    // palette maps index i -> gray 85·i, so sums are 85·(index sums)
    assert(frames == Seq(
      Multimodal.VideoFrameStats(9L, 0L, 3L, 2L, 6L, 85L * (0 + 1 + 2 + 3 + 0 + 1)),
      Multimodal.VideoFrameStats(9L, 1L, 3L, 2L, 6L, 85L * (1 + 2 + 3 + 0 + 1 + 2))))
  }

  test("syntheticGif produces a real multi-frame container and round-trips every pixel") {
    Seq(0L, 3L, 7L, 13L, 100L).foreach { id =>
      val bytes = Multimodal.syntheticGif(id)
      // GIF89a magic: an actual encoded container, not a fake payload
      assert(bytes.take(6).map(_.toChar).mkString == "GIF89a")
      val frames = Multimodal.decodeGifFrameStats(id, bytes)
      val (w, h, nf) = (id % 6 + 2, id % 3 + 2, id % 4 + 2)
      assert(frames.length == nf.toInt, s"id=$id demuxed ${frames.length} of $nf frames")
      frames.foreach { fr =>
        val want = (for (y <- 0L until h; x <- 0L until w)
          yield (id + 7 * x + 13 * y + 29 * fr.frame_idx) % 256).sum
        assert(fr == Multimodal.VideoFrameStats(id, fr.frame_idx, w, h, w * h, want),
          s"id=$id frame=${fr.frame_idx}")
      }
    }
  }

  test("videoFrameStats fans payload rows out to frame rows, zero shuffle") {
    val df = Seq(1L, 2L, 3L).toDF("doc_id")
    val out = Multimodal.videoFrameStats(df, "doc_id")
    // nf = id % 4 + 2 → 3 + 4 + 5 frames
    assert(out.count() == 12L)
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"video demux must not shuffle:\n$plan")
  }

  // ---- corrupt-payload quarantine (the deployment entry points) ----------

  test("quarantined image decode: corrupt payloads isolated and counted, good rows exact, stage survives") {
    val rows = Seq(
      (1L, Multimodal.syntheticPng(1L)),
      (2L, goldenPng.take(20)), // truncated mid-header
      (3L, Multimodal.syntheticPng(3L)),
      (4L, Array[Byte](1, 2, 3, 4)), // not an image at all
      (5L, null: Array[Byte])) // null payload
    val out = Multimodal.imagePixelStatsQuarantined(
      rows.toDF("doc_id", "payload"), "doc_id", "payload")
    assert(out.count() == 5L, "one row per document, corrupt or not")
    assert(out.filter($"status" === "corrupt").count() == 3L)
    assert(out.filter($"status" === "corrupt" && $"error".isNull).count() == 0L,
      "every quarantined row names its error")
    assert(out.filter($"status" === "ok" && $"error".isNotNull).count() == 0L)
    val ok = out.filter($"status" === "ok")
      .select($"doc_id", $"width", $"height", $"n_pixels", $"sum_r", $"sum_g", $"sum_b")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    val want = Seq(1L, 3L).map { id =>
      val s = Multimodal.decodeImageStats(id, Multimodal.syntheticPng(id))
      (id, s.width, s.height, s.n_pixels, s.sum_r, s.sum_g, s.sum_b)
    }.toSet
    assert(ok == want, "good rows must carry the strict kernel's exact stats")
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"quarantined decode must not shuffle:\n$plan")
  }

  test("quarantined audio decode: corrupt payloads isolated, good rows exact") {
    val rows = Seq(
      (1L, Multimodal.syntheticWav(1L)),
      (2L, goldenWav.take(12)), // RIFF header only, no fmt/data
      (3L, Multimodal.syntheticWav(3L)),
      (4L, Array[Byte](9, 9, 9)))
    val out = Multimodal.audioSampleStatsQuarantined(
      rows.toDF("doc_id", "payload"), "doc_id", "payload")
    assert(out.count() == 4L)
    assert(out.filter($"status" === "corrupt").count() == 2L)
    assert(out.filter($"status" === "corrupt" && $"error".isNull).count() == 0L)
    val ok = out.filter($"status" === "ok")
      .select($"doc_id", $"n_samples", $"sample_rate", $"sum_amp", $"min_amp", $"max_amp")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val want = Seq(1L, 3L).map { id =>
      val s = Multimodal.decodeWavStats(id, Multimodal.syntheticWav(id))
      (id, s.n_samples, s.sample_rate, s.sum_amp, s.min_amp, s.max_amp)
    }.toSet
    assert(ok == want)
  }

  test("quarantined video decode: corrupt docs collapse to one row, good docs fan out exactly") {
    val rows = Seq(
      (1L, Multimodal.syntheticGif(1L)), // 3 frames
      (2L, goldenGif.take(10)), // truncated mid-screen-descriptor
      (3L, Multimodal.syntheticGif(3L)), // 5 frames
      (4L, "definitely not a gif".getBytes("UTF-8")))
    val out = Multimodal.videoFrameStatsQuarantined(
      rows.toDF("doc_id", "payload"), "doc_id", "payload")
    assert(out.filter($"status" === "ok").count() == 8L, "3 + 5 good frames")
    assert(out.filter($"status" === "corrupt").count() == 2L,
      "one quarantine row PER corrupt document, never per phantom frame")
    assert(out.filter($"status" === "corrupt" &&
      ($"error".isNull || $"frame_idx".isNotNull)).count() == 0L)
    val ok = out.filter($"status" === "ok")
      .select($"doc_id", $"frame_idx", $"width", $"height", $"n_pixels", $"sum_v")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val want = Seq(1L, 3L).flatMap { id =>
      Multimodal.decodeGifFrameStats(id, Multimodal.syntheticGif(id))
        .map(f => (id, f.frame_idx, f.width, f.height, f.n_pixels, f.sum_v))
    }.toSet
    assert(ok == want)
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"quarantined demux must not shuffle:\n$plan")
  }

  test("poisoned corpora (x6/x7/x8 legs): corrupt set is exactly ids % n == 0, good rows exact") {
    val ids = (0L to 40L).toDF("doc_id")
    val img = Multimodal.imagePixelStatsPoisoned(ids, "doc_id", poisonEvery = 7L)
    assert(img.filter($"status" === "corrupt").select($"doc_id")
      .as[Long].collect().toSet == (0L to 40L).filter(_ % 7 == 0).toSet)
    val imgOk = img.filter($"status" === "ok" && $"doc_id" === 3L)
      .select($"sum_r").as[Long].head()
    assert(imgOk == Multimodal.decodeImageStats(3L, Multimodal.syntheticPng(3L)).sum_r)
    val wav = Multimodal.audioSampleStatsPoisoned(ids, "doc_id", poisonEvery = 7L)
    assert(wav.filter($"status" === "corrupt").select($"doc_id")
      .as[Long].collect().toSet == (0L to 40L).filter(_ % 7 == 0).toSet)
    val wavOk = wav.filter($"status" === "ok" && $"doc_id" === 3L)
      .select($"sum_amp").as[Long].head()
    assert(wavOk == Multimodal.decodeWavStats(3L, Multimodal.syntheticWav(3L)).sum_amp)
    val vid = Multimodal.videoFrameStatsPoisoned(ids, "doc_id", poisonEvery = 7L)
    assert(vid.filter($"status" === "corrupt").select($"doc_id")
      .as[Long].collect().toSet == (0L to 40L).filter(_ % 7 == 0).toSet)
  }

  test("sniffFormat routes by magic bytes only") {
    assert(Multimodal.sniffFormat(Multimodal.syntheticPng(5L)) == "png")
    assert(Multimodal.sniffFormat(Multimodal.syntheticWav(5L)) == "wav")
    assert(Multimodal.sniffFormat(Multimodal.syntheticGif(5L)) == "gif")
    // magic survives truncation PAST it...
    assert(Multimodal.sniffFormat(Multimodal.syntheticPng(5L).take(8)) == "png")
    assert(Multimodal.sniffFormat(Multimodal.syntheticGif(5L).take(8)) == "gif")
    assert(Multimodal.sniffFormat(Multimodal.syntheticWav(5L).take(16)) == "wav")
    // ...but a cut INSIDE the magic is unroutable, as are text/empty/null-ish
    assert(Multimodal.sniffFormat(Multimodal.syntheticPng(5L).take(7)) == "unknown")
    assert(Multimodal.sniffFormat(Multimodal.syntheticWav(5L).take(11)) == "unknown")
    assert(Multimodal.sniffFormat("plain text".getBytes("UTF-8")) == "unknown")
    assert(Multimodal.sniffFormat(Array.emptyByteArray) == "unknown")
  }

  test("dispatch: every mixed-corpus row lands in exactly one bucket with its format") {
    val ids = (0L to 100L).toDF("doc_id")
    val out = Multimodal.mediaStatsMixedPoisoned(ids, "doc_id", poisonEvery = 17L)
    val byBucket = out.groupBy($"status").count()
      .as[(String, Long)].collect().toMap
    val all = (0L to 100L)
    val unknown = all.filter(_ % 4 == 3)
    val corrupt = all.filter(id => id % 17 == 0 && id % 4 != 3)
    val ok = all.filterNot(unknown.contains).filterNot(corrupt.contains)
    assert(byBucket == Map(
      "ok" -> ok.size.toLong, "corrupt" -> corrupt.size.toLong,
      "unknown_format" -> unknown.size.toLong))
    assert(out.count() == all.size.toLong, "one row per document, no bucket overlap")
    // corrupt rows keep the SNIFFED format (the codec-vs-labeling split)
    assert(out.filter($"status" === "corrupt").select($"doc_id", $"format")
      .as[(Long, String)].collect().toSet ==
      corrupt.map(id => (id, Seq("png", "wav", "gif")(Math.floorMod(id, 4L).toInt))).toSet)
    // ok rows carry the strict kernels' exact stats
    assert(out.filter($"status" === "ok" && $"doc_id" === 4L).select($"sum_r")
      .as[Long].head() == Multimodal.decodeImageStats(4L, Multimodal.syntheticPng(4L)).sum_r)
    assert(out.filter($"status" === "ok" && $"doc_id" === 5L).select($"sum_amp")
      .as[Long].head() == Multimodal.decodeWavStats(5L, Multimodal.syntheticWav(5L)).sum_amp)
    val frames = Multimodal.decodeGifFrameStats(6L, Multimodal.syntheticGif(6L))
    assert(out.filter($"status" === "ok" && $"doc_id" === 6L)
      .select($"n_frames", $"n_pixels", $"sum_v").as[(Long, Long, Long)].head() ==
      ((frames.length.toLong, frames.map(_.n_pixels).sum, frames.map(_.sum_v).sum)))
    // zero shuffle, like the per-format decoders
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"dispatch must not shuffle:\n$plan")
  }
}
