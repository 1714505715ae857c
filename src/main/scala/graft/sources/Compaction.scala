package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction for parquet directories — the table-maintenance
  * pass every long-lived ingestion pipeline needs (streaming sinks and
  * incremental appends produce files sized by ARRIVAL, not by what a
  * scan wants; thousands of KB-files turn a 100 TB scan into a metadata
  * and task-scheduling problem before a single row is read).
  *
  * `compact` rewrites a directory to ~`targetFileBytes` files:
  * file count = ceil(input bytes / target), one round-robin exchange
  * (or a [[graft.functions.ZOrder]] clustered rewrite when `zOrderBy` is
  * given — compaction is the natural moment to also fix the layout).
  * The rewrite lands in a temp dir first and swaps in with two renames,
  * so a crash leaves either the old directory or the new one, never a
  * half-written mix readers can see.
  *
  * Sizing note: the ratio of in-memory to on-disk size varies with
  * encoding/compression, so output files land NEAR the target, not on
  * it — good enough for scan sizing, which only needs the right order
  * of magnitude (row groups of MBs, files of 100s of MBs).
  */
object Compaction {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** (data file count, total bytes) under `path`, recursive; hidden and
    * metadata files (_SUCCESS, .crc) excluded. */
  def stats(spark: SparkSession, path: String): (Long, Long) = {
    val f = fs(spark, path)
    val it = f.listFiles(new Path(path), true)
    var files = 0L
    var bytes = 0L
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      if (s.isFile && !n.startsWith("_") && !n.startsWith(".")) {
        files += 1; bytes += s.getLen
      }
    }
    (files, bytes)
  }

  /** Rewrite `path` into ~`targetFileBytes` files, optionally z-ordering
    * by `zOrderBy` on the way. Returns (files before, files after). */
  def compact(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      zOrderBy: Seq[String] = Nil,
      zBits: Int = 16): (Long, Long) = {
    val (before, bytes) = stats(spark, path)
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(path)
    val tmp = path.stripSuffix("/") + ".compact.tmp"
    val old = path.stripSuffix("/") + ".compact.old"
    if (zOrderBy.nonEmpty)
      graft.functions.ZOrder.writeZOrdered(df, tmp, zOrderBy, zBits, nFiles)
    else
      df.repartition(nFiles).write.mode("overwrite").parquet(tmp)
    val f = fs(spark, path)
    val dst = new Path(path)
    val oldP = new Path(old)
    if (f.exists(oldP)) f.delete(oldP, true)
    // two renames: old data stays intact until the new dir is in place
    if (!f.rename(dst, oldP))
      sys.error(s"compact: could not move $path aside")
    if (!f.rename(new Path(tmp), dst)) {
      f.rename(oldP, dst) // roll back
      sys.error(s"compact: could not swap in $tmp")
    }
    f.delete(oldP, true)
    val (after, _) = stats(spark, path)
    (before, after)
  }

  /** Append-friendly variant for partitioned tables: compact one
    * partition directory (e.g. `.../slice=2024-01-03`) in place —
    * maintenance runs per freshly-closed partition, never over the
    * whole history. */
  def compactPartition(
      spark: SparkSession,
      tableRoot: String,
      partition: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    val dir = s"${tableRoot.stripSuffix("/")}/$partition"
    require(fs(spark, dir).exists(new Path(dir)), s"no such partition dir: $dir")
    compact(spark, dir, targetFileBytes)
  }
}
