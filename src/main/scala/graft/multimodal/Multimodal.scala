package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * steps as partition-wise batch functions.
  *
  * ALL THREE modalities decode real bytes with JDK-native codecs, no
  * external libraries: images are REAL PNGs (`javax.imageio`, x3),
  * audio is REAL RIFF/WAV PCM (`javax.sound.sampled`, x4), and video
  * is a REAL multi-frame animated GIF demuxed frame-by-frame
  * (`javax.imageio`'s frame-indexed gif plugin, x5) — the stub list is
  * empty. `decodeStub`/`sampleFrames` remain as the generic-container
  * plumbing (schema, binary payload column, partition-wise batched
  * execution) for formats whose demuxers live outside the JDK
  * (MP4/H.264 etc. — swap the byte-slice "decode" for a JNI/demuxer
  * call; the batch shape does not change).
  *
  * Scale notes: payloads stay columnar (parquet binary) end to end; the
  * decode runs via `mapPartitions` so per-batch setup (codec init) is
  * amortized across a whole partition, mirroring the mapInPandas batch
  * shape of a Python pipeline.
  */
object Multimodal {

  /** Attach a binary payload column + metadata struct to a table (here the
    * payload is the utf-8 text itself — the harness has no real media). */
  def withBinaryPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))
      .withColumn(
        "media_meta",
        struct(
          length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("checksum"),
          (length(col("payload")) % 640).as("width"),
          (length(col("payload")) * 7 % 480).as("height"),
          (length(col("payload")) % 24).as("n_frames")))

  final case class MediaFeature(id: Long, n_bytes: Int, mean_byte: Double, feature: Seq[Double])

  /** Deterministic fake decode: mean byte value + an 8-bin byte histogram
    * as the "feature vector". Replace with a real codec in production. */
  def decodeStub(id: Long, payload: Array[Byte]): MediaFeature = {
    val hist = new Array[Double](8)
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      hist(b >> 5) += 1.0
      sum += b
      i += 1
    }
    val n = math.max(payload.length, 1)
    MediaFeature(id, payload.length, sum.toDouble / n, hist.toSeq.map(_ / n))
  }

  final case class Frame(id: Long, frame_idx: Long, n_bytes: Long, checksum: String)

  /** Video-style frame sampling plumbing: split each payload into the
    * `nFramesCol` byte slices its metadata declares, keep every
    * `everyNth` frame, one output row per kept frame (id, frame index,
    * slice size, md5 checksum). The explode direction a video table
    * needs — payload rows fan OUT to frame rows — with the real
    * batch-execution contract: byte-range slicing, one digest/codec
    * instance per partition, no shuffle (pure per-row fan-out, pipeline
    * stays in one stage). Deterministic, so the whole path is
    * DuckDB-oracle-able (x2). Swap the byte-slice "decode" for a real
    * demuxer in production; the schema and batch shape do not change. */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      nFramesCol: String,
      everyNth: Int): Dataset[Frame] = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol), col(nFramesCol).cast("int"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { it =>
        // per-partition setup: one digest (stand-in for codec/demuxer init)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes, nf) =>
          if (nf <= 0) Iterator.empty
          else {
            val chunk = (bytes.length + nf - 1) / nf
            Iterator.range(0, nf).filter(_ % everyNth == 0).map { i =>
              val from = math.min(bytes.length, i * chunk)
              val until = math.min(bytes.length, from + chunk)
              val slice = java.util.Arrays.copyOfRange(bytes, from, until)
              Frame(id, i.toLong, (until - from).toLong,
                md.digest(slice).map("%02x".format(_)).mkString)
            }
          }
        }
      }
  }

  /** Partition-wise batched feature extraction (the mapInPandas shape:
    * iterator-of-rows in, iterator-of-rows out, one setup per partition). */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup (e.g. codec initialization) would go here
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  // ---- real JDK-native image codec (javax.imageio: PNG/BMP/GIF) ---------

  final case class ImageStats(
      doc_id: Long, width: Long, height: Long, n_pixels: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL image decode — `javax.imageio.ImageIO` ships in the JDK, so
    * PNG/BMP/GIF need no external codecs (the audio/video leg of the
    * family stays stubbed for lack of sandbox demuxers; this closes the
    * image leg with actual decoded bytes). Dimensions come from the
    * decoded frame, channel sums from the decoded pixels — exact
    * integers, so the whole path is bit-contractable. */
  def decodeImageStats(id: Long, payload: Array[Byte]): ImageStats = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, s"payload of id=$id is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    ImageStats(id, w, h, w.toLong * h, sr, sg, sb)
  }

  /** Deterministic synthetic frame: every pixel a pure closed-form
    * function of (id, x, y) — so downstream decoded stats are
    * independently recomputable by any engine WITHOUT a codec, which is
    * what makes the encode→decode round-trip oracle-able. */
  def syntheticPng(id: Long): Array[Byte] = {
    // floorMod throughout, same reason as syntheticWav: a negative id
    // under Scala's sign-following % would request a negative-dimension
    // frame. Identical to % on the nonnegative ids the x3 oracle gates.
    val w = (Math.floorMod(id, 7L) + 2).toInt
    val h = (Math.floorMod(id, 4L) + 2).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = Math.floorMod(id + 7L * x + 13L * y, 256L).toInt
        val g = Math.floorMod(3L * id + 5L * x + 11L * y, 256L).toInt
        val b = Math.floorMod(id + x.toLong * y, 256L).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // ---- real JDK-native audio codec (javax.sound.sampled: WAV) -----------

  final case class WavStats(
      doc_id: Long, n_samples: Long, sample_rate: Long,
      sum_amp: Long, min_amp: Long, max_amp: Long)

  /** REAL audio decode — `javax.sound.sampled.AudioSystem` ships in the
    * JDK, so RIFF/WAV PCM needs no external codecs (closing the audio
    * leg the same way x3 closed the image leg; video demux remains the
    * one documented stub). The stream format and frame bytes come from
    * the decoded WAV, amplitude stats from the decoded samples — exact
    * integers, so the whole path is bit-contractable. */
  def decodeWavStats(id: Long, payload: Array[Byte]): WavStats = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
      s"id=$id: expected 8-bit mono PCM, got $fmt")
    val bytes = ais.readAllBytes()
    require(bytes.nonEmpty, s"id=$id: WAV stream decoded to zero samples")
    var (sum, mn, mx) = (0L, 255L, 0L)
    var i = 0
    while (i < bytes.length) {
      val a = bytes(i) & 0xff // 8-bit WAV is unsigned by the RIFF spec
      sum += a
      if (a < mn) mn = a
      if (a > mx) mx = a
      i += 1
    }
    WavStats(id, bytes.length.toLong, fmt.getSampleRate.toLong, sum, mn, mx)
  }

  /** Deterministic synthetic clip: every sample a pure closed-form
    * function of (id, i) — so downstream decoded stats are independently
    * recomputable by any engine WITHOUT a codec, the syntheticPng
    * convention applied to audio. 8-bit unsigned mono PCM at 8 kHz (the
    * 8-bit leg of the RIFF spec, which javax.sound writes natively). */
  def syntheticWav(id: Long): Array[Byte] = {
    // floorMod: Scala's % follows the dividend's sign, so a negative id
    // would yield a negative clip length (NegativeArraySizeException in
    // the executor) — the closed form must be the mathematical mod over
    // the whole Long domain. Identical to % on the nonnegative ids the
    // x4 oracle gates.
    val n = (Math.floorMod(id, 40L) + 8).toInt
    val samples = Array.tabulate[Byte](n)(i =>
      Math.floorMod(id * 31 + i * 17, 256L).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // ---- real JDK-native video demux (animated GIF via javax.imageio) -----

  final case class VideoFrameStats(
      doc_id: Long, frame_idx: Long, width: Long, height: Long,
      n_pixels: Long, sum_v: Long)

  /** REAL multi-frame demux + decode — `javax.imageio`'s GIF plugin
    * ships in the JDK and is frame-indexed, so an animated GIF is the
    * one video-shaped container that needs no external demuxer. Each
    * frame is read independently (`reader.read(f)` returns the raw
    * frame, no compositing), per-frame pixel sums are exact integers —
    * the whole demux → decode → stats path is bit-contractable. Closes
    * the LAST documented multimodal stub (x3 closed images, x4 audio). */
  def decodeGifFrameStats(id: Long, payload: Array[Byte]): Seq[VideoFrameStats] = {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      require(n > 0, s"id=$id: no frames in GIF container")
      (0 until n).map { f =>
        val img = reader.read(f)
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sum += (img.getRGB(x, y) & 0xff) // grayscale palette: B==G==R
            x += 1
          }
          y += 1
        }
        VideoFrameStats(id, f.toLong, w, h, w.toLong * h, sum)
      }
    } finally { reader.dispose(); iis.close() }
  }

  /** Deterministic synthetic CLIP: every pixel of every frame a pure
    * closed-form function of (id, frame, x, y) — the syntheticPng
    * convention extended to the time axis. Frames are TYPE_BYTE_INDEXED
    * over an explicit 256-gray palette: GIF is an indexed format, so an
    * explicit palette makes the encode LOSSLESS by construction (the
    * writer would otherwise quantize RGB input). */
  def syntheticGif(id: Long): Array[Byte] = {
    // floorMod: same negative-id reasoning as syntheticWav/syntheticPng
    val w = (Math.floorMod(id, 6L) + 2).toInt
    val h = (Math.floorMod(id, 3L) + 2).toInt
    val nf = (Math.floorMod(id, 4L) + 2).toInt
    val gray = Array.tabulate[Byte](256)(i => i.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      // interlace OFF, explicitly: the JDK GIF writer's default leaves
      // the interlace decision to (absent) metadata, and its interlaced
      // path silently DROPS every row after the first for images of
      // height 2-4 (measured: a w×h image came back with w·(h−1) wrong
      // pixels for h<5, bit-exact for h≥5) — the lossless-by-
      // construction claim of the indexed palette only holds with
      // progressive mode disabled
      val p = writer.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nf) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0,
              Math.floorMod(id + 7L * x + 13L * y + 29L * f, 256L).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), p)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** The full video leg end-to-end: synthesize a deterministic animated
    * GIF per row (stage 1), carry it through the plan as a real `binary`
    * column, then DEMUX + decode every frame with the JDK reader and
    * emit per-frame pixel stats (stage 2, a flatMap — payload rows fan
    * OUT to frame rows, the video explode direction). Indexed GIF is
    * lossless, so the output equals the closed-form per-frame pixel
    * sums IFF the encoder, the container framing, and the decoder all
    * work on real bytes — that equality is the x5 oracle. Both stages
    * are mapPartitions (codec state amortized per partition), zero
    * shuffle. */
  def videoFrameStats(df: DataFrame, idCol: String): Dataset[VideoFrameStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded: DataFrame = df.select(col(idCol).cast("long").as("id"))
      .as[Long]
      .mapPartitions(it => it.map(id => (id, syntheticGif(id))))
      .toDF("id", "payload")
    encoded.select(col("id"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) => decodeGifFrameStats(id, bytes) })
  }

  /** The full audio leg end-to-end: synthesize a deterministic WAV per
    * row (stage 1), carry it through the plan as a real `binary` column,
    * then DECODE it with the JDK audio stack and emit per-clip sample
    * stats (stage 2). PCM is lossless, so the output equals the
    * closed-form sample sums IFF the encoder and decoder both work on
    * real RIFF bytes — that equality is the x4 oracle. Both stages are
    * mapPartitions (codec state amortized per partition), zero shuffle. */
  def audioSampleStats(df: DataFrame, idCol: String): Dataset[WavStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded: DataFrame = df.select(col(idCol).cast("long").as("id"))
      .as[Long]
      .mapPartitions(it => it.map(id => (id, syntheticWav(id))))
      .toDF("id", "payload")
    encoded.select(col("id"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) => decodeWavStats(id, bytes) })
  }

  // ---- corrupt-payload quarantine (the deployment entry points) ----------
  //
  // The strict decoders above (`decodeImageStats`/`decodeWavStats`/
  // `decodeGifFrameStats`) fail the whole stage on one malformed payload
  // — correct for the synthetic oracles (a decode failure there IS a
  // codec bug), wrong for a real crawl where some fraction of 100 TB of
  // scraped bytes is always truncated, mislabeled, or hostile. The
  // *Quarantined entry points below are the deployment surface: each row
  // decodes under Try, good rows carry `status = "ok"` and the exact
  // same stats the strict decoder produces, corrupt rows carry
  // `status = "corrupt"` + the error text with all stats null — counted
  // and skippable downstream (`filter($"status" === "ok")`), never
  // stage-fatal. Same mapPartitions batch shape, zero shuffle.

  private def errText(e: Throwable): String = {
    val s = e.toString
    if (s.length <= 200) s else s.take(200)
  }

  final case class QuarantinedImageStats(
      doc_id: Long, status: String, error: Option[String],
      width: Option[Long], height: Option[Long], n_pixels: Option[Long],
      sum_r: Option[Long], sum_g: Option[Long], sum_b: Option[Long])

  /** Tolerant image decode over a REAL binary payload column — the
    * deployment entry point ([[decodeImageStats]] is the strict kernel
    * it wraps). A null payload quarantines like any other corrupt row. */
  def imagePixelStatsQuarantined(
      df: DataFrame, idCol: String, payloadCol: String): Dataset[QuarantinedImageStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) =>
        scala.util.Try(
          decodeImageStats(id, Option(bytes).getOrElse(Array.emptyByteArray))) match {
          case scala.util.Success(s) => QuarantinedImageStats(
            id, "ok", None, Some(s.width), Some(s.height), Some(s.n_pixels),
            Some(s.sum_r), Some(s.sum_g), Some(s.sum_b))
          case scala.util.Failure(e) => QuarantinedImageStats(
            id, "corrupt", Some(errText(e)), None, None, None, None, None, None)
        }
      })
  }

  final case class QuarantinedWavStats(
      doc_id: Long, status: String, error: Option[String],
      n_samples: Option[Long], sample_rate: Option[Long],
      sum_amp: Option[Long], min_amp: Option[Long], max_amp: Option[Long])

  /** Tolerant audio decode over a REAL binary payload column — the
    * deployment entry point ([[decodeWavStats]] is the strict kernel). */
  def audioSampleStatsQuarantined(
      df: DataFrame, idCol: String, payloadCol: String): Dataset[QuarantinedWavStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) =>
        scala.util.Try(
          decodeWavStats(id, Option(bytes).getOrElse(Array.emptyByteArray))) match {
          case scala.util.Success(s) => QuarantinedWavStats(
            id, "ok", None, Some(s.n_samples), Some(s.sample_rate),
            Some(s.sum_amp), Some(s.min_amp), Some(s.max_amp))
          case scala.util.Failure(e) => QuarantinedWavStats(
            id, "corrupt", Some(errText(e)), None, None, None, None, None)
        }
      })
  }

  final case class QuarantinedVideoFrameStats(
      doc_id: Long, status: String, error: Option[String],
      frame_idx: Option[Long], width: Option[Long], height: Option[Long],
      n_pixels: Option[Long], sum_v: Option[Long])

  /** Tolerant video demux+decode over a REAL binary payload column — the
    * deployment entry point ([[decodeGifFrameStats]] is the strict
    * kernel). Good payloads fan out one row per frame (the video explode
    * direction); a corrupt payload collapses to ONE quarantine row with
    * a null frame index, so the corrupt count is per-document, not
    * per-phantom-frame. */
  def videoFrameStatsQuarantined(
      df: DataFrame, idCol: String, payloadCol: String): Dataset[QuarantinedVideoFrameStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) =>
        scala.util.Try(
          decodeGifFrameStats(id, Option(bytes).getOrElse(Array.emptyByteArray))) match {
          case scala.util.Success(frames) => frames.map(f =>
            QuarantinedVideoFrameStats(id, "ok", None, Some(f.frame_idx),
              Some(f.width), Some(f.height), Some(f.n_pixels), Some(f.sum_v)))
          case scala.util.Failure(e) => Seq(QuarantinedVideoFrameStats(
            id, "corrupt", Some(errText(e)), None, None, None, None, None))
        }
      })
  }

  /** The quarantine leg end-to-end (x6): the x5 synthetic-GIF corpus
    * with a deterministically POISONED subset — payloads of ids
    * divisible by `poisonEvery` truncated mid-header (8 bytes cuts
    * inside the logical screen descriptor: unreadable for every id,
    * where a mid-stream cut could land on a frame boundary and demux
    * clean) — run through the tolerant decoder. Good docs fan out to
    * their exact per-frame stats, poisoned docs collapse to one
    * `status = "corrupt"` row; both shapes are closed-form, so the
    * whole tolerant path is DuckDB-oracle-able (minus the error text,
    * which is engine-specific and excluded from the gate). */
  def videoFrameStatsPoisoned(
      df: DataFrame, idCol: String, poisonEvery: Long): Dataset[QuarantinedVideoFrameStats] = {
    require(poisonEvery >= 1, s"poisonEvery must be >= 1, got $poisonEvery")
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = df.select(col(idCol).cast("long").as("id"))
      .as[Long]
      .mapPartitions(it => it.map { id =>
        val good = syntheticGif(id)
        if (Math.floorMod(id, poisonEvery) == 0L)
          (id, java.util.Arrays.copyOfRange(good, 0, 8))
        else (id, good)
      })
      .toDF("id", "payload")
    videoFrameStatsQuarantined(encoded, "id", "payload")
  }

  /** The image quarantine leg end-to-end (x7): the x3 synthetic-PNG
    * corpus with payloads of ids divisible by `poisonEvery` truncated
    * to the 8-byte PNG signature — no IHDR follows, so the JDK reader
    * returns null for EVERY id (a deeper cut could leave a decodable
    * prefix on some sizes). Good docs carry the exact closed-form pixel
    * stats, poisoned docs one `status = "corrupt"` row — both
    * closed-form, so the tolerant image path is DuckDB-oracle-able. */
  def imagePixelStatsPoisoned(
      df: DataFrame, idCol: String, poisonEvery: Long): Dataset[QuarantinedImageStats] = {
    require(poisonEvery >= 1, s"poisonEvery must be >= 1, got $poisonEvery")
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = df.select(col(idCol).cast("long").as("id"))
      .as[Long]
      .mapPartitions(it => it.map { id =>
        val good = syntheticPng(id)
        if (Math.floorMod(id, poisonEvery) == 0L)
          (id, java.util.Arrays.copyOfRange(good, 0, 8))
        else (id, good)
      })
      .toDF("id", "payload")
    imagePixelStatsQuarantined(encoded, "id", "payload")
  }

  /** The audio quarantine leg end-to-end (x8): the x4 synthetic-WAV
    * corpus with payloads of ids divisible by `poisonEvery` truncated
    * to 8 bytes — inside the RIFF chunk header, before the WAVE tag, so
    * javax.sound rejects the stream for EVERY id (a mid-data cut would
    * instead decode to a shorter clip: fewer samples, not a corrupt
    * row). Good docs carry the exact closed-form amplitude stats,
    * poisoned docs one `status = "corrupt"` row — both closed-form, so
    * the tolerant audio path is DuckDB-oracle-able. */
  def audioSampleStatsPoisoned(
      df: DataFrame, idCol: String, poisonEvery: Long): Dataset[QuarantinedWavStats] = {
    require(poisonEvery >= 1, s"poisonEvery must be >= 1, got $poisonEvery")
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = df.select(col(idCol).cast("long").as("id"))
      .as[Long]
      .mapPartitions(it => it.map { id =>
        val good = syntheticWav(id)
        if (Math.floorMod(id, poisonEvery) == 0L)
          (id, java.util.Arrays.copyOfRange(good, 0, 8))
        else (id, good)
      })
      .toDF("id", "payload")
    audioSampleStatsQuarantined(encoded, "id", "payload")
  }

  // ---- format-sniffing dispatch (the mixed-column deployment surface) ----
  //
  // The quarantine decoders above are per-format entry points; a real
  // crawl column mixes formats (and garbage). The dispatcher sniffs the
  // magic bytes of each payload, routes to the matching kernel, and
  // lands every row in EXACTLY ONE of {ok, corrupt, unknown_format}:
  // a payload whose format can't even be identified is not "corrupt
  // PNG" — it's unroutable, and the distinction is what lets a
  // deployment separate codec problems from labeling problems.

  /** Magic-byte format sniff: "png" (\x89PNG\r\n\x1a\n), "gif"
    * (GIF87a/GIF89a), "wav" (RIFF····WAVE), else "unknown". Pure bytes,
    * no decode attempt — cheap enough to run on every row before the
    * kernel dispatch. */
  def sniffFormat(bytes: Array[Byte]): String = {
    @inline def at(i: Int, v: Int) = (bytes(i) & 0xff) == v
    if (bytes.length >= 8 &&
        at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G') &&
        at(4, 0x0d) && at(5, 0x0a) && at(6, 0x1a) && at(7, 0x0a)) "png"
    else if (bytes.length >= 6 &&
        at(0, 'G') && at(1, 'I') && at(2, 'F') && at(3, '8') &&
        (at(4, '7') || at(4, '9')) && at(5, 'a')) "gif"
    else if (bytes.length >= 12 &&
        at(0, 'R') && at(1, 'I') && at(2, 'F') && at(3, 'F') &&
        at(8, 'W') && at(9, 'A') && at(10, 'V') && at(11, 'E')) "wav"
    else "unknown"
  }

  final case class DispatchedMediaStats(
      doc_id: Long, format: String, status: String, error: Option[String],
      width: Option[Long], height: Option[Long], n_pixels: Option[Long],
      sum_r: Option[Long], sum_g: Option[Long], sum_b: Option[Long],
      n_samples: Option[Long], sample_rate: Option[Long],
      sum_amp: Option[Long], min_amp: Option[Long], max_amp: Option[Long],
      n_frames: Option[Long], sum_v: Option[Long])

  /** Sniff + dispatch + tolerant decode over ONE mixed binary column:
    * PNG → image pixel stats, RIFF/WAVE → audio amplitude stats,
    * GIF → video frame stats AGGREGATED per document (n_frames, total
    * pixels, total value sum — one row per doc, so the three modalities
    * share a schema), anything unroutable → `status = "unknown_format"`.
    * A payload whose magic sniffs but whose body fails its kernel is
    * `status = "corrupt"` with the sniffed format preserved. Same
    * mapPartitions batch shape as the per-format decoders, zero
    * shuffle. */
  def mediaStatsDispatched(
      df: DataFrame, idCol: String, payloadCol: String): Dataset[DispatchedMediaStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    def none16(id: Long, fmt: String, status: String, err: Option[String]) =
      DispatchedMediaStats(id, fmt, status, err,
        None, None, None, None, None, None, None, None, None, None, None, None, None)
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytesOrNull) =>
        val bytes = Option(bytesOrNull).getOrElse(Array.emptyByteArray)
        sniffFormat(bytes) match {
          case "png" => scala.util.Try(decodeImageStats(id, bytes)) match {
            case scala.util.Success(s) => DispatchedMediaStats(
              id, "png", "ok", None,
              Some(s.width), Some(s.height), Some(s.n_pixels),
              Some(s.sum_r), Some(s.sum_g), Some(s.sum_b),
              None, None, None, None, None, None, None)
            case scala.util.Failure(e) => none16(id, "png", "corrupt", Some(errText(e)))
          }
          case "wav" => scala.util.Try(decodeWavStats(id, bytes)) match {
            case scala.util.Success(s) => DispatchedMediaStats(
              id, "wav", "ok", None, None, None, None, None, None, None,
              Some(s.n_samples), Some(s.sample_rate),
              Some(s.sum_amp), Some(s.min_amp), Some(s.max_amp), None, None)
            case scala.util.Failure(e) => none16(id, "wav", "corrupt", Some(errText(e)))
          }
          case "gif" => scala.util.Try(decodeGifFrameStats(id, bytes)) match {
            case scala.util.Success(frames) if frames.nonEmpty => DispatchedMediaStats(
              id, "gif", "ok", None,
              Some(frames.head.width), Some(frames.head.height),
              Some(frames.map(_.n_pixels).sum), None, None, None,
              None, None, None, None, None,
              Some(frames.length.toLong), Some(frames.map(_.sum_v).sum))
            case scala.util.Success(_) =>
              none16(id, "gif", "corrupt", Some("gif decoded to zero frames"))
            case scala.util.Failure(e) => none16(id, "gif", "corrupt", Some(errText(e)))
          }
          case _ => none16(id, "unknown", "unknown_format", None)
        }
      })
  }

  /** The dispatch leg end-to-end (x9): a MIXED-format corpus — id mod 4
    * routes to PNG / WAV / GIF / plain utf-8 text (no media header) —
    * with the media payloads of ids divisible by `poisonEvery`
    * truncated AFTER their magic (PNG to its 8-byte signature, GIF to
    * 8 bytes inside the logical screen descriptor, WAV to 16 bytes
    * before the fmt chunk), so they SNIFF correctly and then fail their
    * kernel: the corrupt bucket exercises the sniff-then-fail path, not
    * the unroutable one. Every row lands in exactly one of
    * {ok, corrupt, unknown_format}, all three buckets closed-form —
    * DuckDB-oracle-able minus the engine-specific error text. */
  def mediaStatsMixedPoisoned(
      df: DataFrame, idCol: String, poisonEvery: Long): Dataset[DispatchedMediaStats] = {
    require(poisonEvery >= 1, s"poisonEvery must be >= 1, got $poisonEvery")
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = df.select(col(idCol).cast("long").as("id"))
      .as[Long]
      .mapPartitions(it => it.map { id =>
        val poisoned = Math.floorMod(id, poisonEvery) == 0L
        def cut(b: Array[Byte], n: Int) =
          if (poisoned) java.util.Arrays.copyOfRange(b, 0, n) else b
        val payload = Math.floorMod(id, 4L) match {
          case 0L => cut(syntheticPng(id), 8)
          case 1L => cut(syntheticWav(id), 16)
          case 2L => cut(syntheticGif(id), 8)
          case _ => s"doc $id carries no media header".getBytes("UTF-8")
        }
        (id, payload)
      })
      .toDF("id", "payload")
    mediaStatsDispatched(encoded, "id", "payload")
  }

  /** The full image leg end-to-end: synthesize a deterministic PNG per
    * row (stage 1), carry it through the plan as a real `binary` column,
    * then DECODE it with the JDK codec and emit per-image pixel stats
    * (stage 2). PNG is lossless, so the output equals the closed-form
    * pixel sums IFF the encoder and decoder both work on real bytes —
    * that equality is the x3 oracle. Both stages are mapPartitions
    * (codec state amortized per partition), zero shuffle. */
  def imagePixelStats(df: DataFrame, idCol: String): Dataset[ImageStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded: DataFrame = df.select(col(idCol).cast("long").as("id"))
      .as[Long]
      .mapPartitions(it => it.map(id => (id, syntheticPng(id))))
      .toDF("id", "payload")
    encoded.select(col("id"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) => decodeImageStats(id, bytes) })
  }
}
