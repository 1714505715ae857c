package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * steps as partition-wise batch functions.
  *
  * The decode itself is STUBBED (this environment has no image/audio
  * codecs): `decodeStub` derives a deterministic fake feature vector from
  * the bytes. The Spark-side contract — schema, binary payload column,
  * partition-wise batched execution, feature vector output — is real and
  * tested; swap `decodeStub` for a JNI/codec call in production.
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
}
