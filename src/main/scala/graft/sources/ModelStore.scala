package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned model store — the parquet-native counterpart of the
  * reference's Delta time travel + RESTORE workflow
  * (05_prod_dev.py:1173-1188: `VERSION AS OF n` reads of the stored
  * mapping model and `RESTORE TABLE ... TO VERSION AS OF n` rollback).
  *
  * This harness is plain parquet (no Delta jars), so the same user
  * workflow is provided with immutable snapshots plus an O(1) pointer:
  *
  * {{{
  *   root/
  *     v=1/ ... parquet ...   // immutable snapshot
  *     v=2/ ...
  *     _VERSION               // current-version pointer ("2")
  * }}}
  *
  * - `save` writes the next `v=N` snapshot, then repoints `_VERSION` —
  *   readers never observe a half-written current version because the
  *   pointer flips only after the snapshot write completes.
  * - `load(version = Some(n))` is `VERSION AS OF n`.
  * - `restore(n)` is `RESTORE ... TO VERSION AS OF n`: it only moves the
  *   pointer; snapshots are immutable, so rollback is O(1) and a later
  *   `save` appends `v=max+1` (it never clobbers the rolled-back-over
  *   versions — same behavior as Delta RESTORE, which keeps history).
  *
  * All filesystem access goes through the Hadoop `FileSystem` resolved
  * from the root path, so `hdfs://` / `s3a://` roots work like local
  * ones. Single-writer semantics (one pipeline owns a model root), as in
  * the reference; concurrent writers would need a lock service — out of
  * scope for parquet as it is for the reference's notebook runs.
  *
  * Scale note: the pointer file and version listing are O(#versions)
  * driver-side metadata; the data path is ordinary parquet IO, so
  * snapshots inherit partition pruning / column pruning like any table.
  */
object ModelStore {

  private val Pointer = "_VERSION"

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** Names of snapshot directories under `root` whose name starts with
    * `prefix`, with the prefix stripped, unordered. Shared by the
    * model-version listing here and [[graft.operators.Pipeline.listRuns]]
    * (run-versioned results tables) so the directory-snapshot protocol —
    * directories only, prefix-tagged, hidden files ignored — lives in one
    * place. */
  def listSnapshots(spark: SparkSession, root: String, prefix: String): Seq[String] = {
    val f = fs(spark, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) Seq.empty
    else
      f.listStatus(rootPath).toSeq
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .collect { case s if s.startsWith(prefix) => s.stripPrefix(prefix) }
  }

  /** All snapshot versions present under `root`, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] =
    listSnapshots(spark, root, "v=").map(_.toLong).sorted

  /** The version `load` without an explicit version would read. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val p = new Path(root, Pointer)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  private def writePointer(spark: SparkSession, root: String, version: Long): Unit = {
    val f = fs(spark, root)
    // Write-then-rename: an in-place create() truncates first, so a crash
    // (or concurrent reader) mid-write would observe an empty pointer and
    // every default load would throw until repaired. rename() swaps the
    // pointer in one metadata op on HDFS/local (and is the standard
    // best-effort pattern on object stores).
    val tmp = new Path(root, Pointer + ".tmp")
    val out = f.create(tmp, true)
    try out.write(version.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(root, Pointer)
    if (f.exists(dst)) f.delete(dst, false)
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"failed to move $tmp over $dst")
  }

  /** Write `df` as the next immutable snapshot and make it current.
    * Returns the new version number. */
  def save(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val next = versions(spark, root).lastOption.getOrElse(0L) + 1L
    df.write.mode("errorifexists").parquet(s"$root/v=$next")
    writePointer(spark, root, next)
    next
  }

  /** Read the current (pointer) version, or `VERSION AS OF` an explicit
    * one. Fails with the available versions listed if absent. */
  def load(spark: SparkSession, root: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, root)).getOrElse(
      throw new IllegalArgumentException(s"no model versions at $root"))
    val avail = versions(spark, root)
    require(avail.contains(v), s"version $v not in $root (available: ${avail.mkString(", ")})")
    spark.read.parquet(s"$root/v=$v")
  }

  /** Roll the current pointer back (or forward) to an existing version —
    * O(1), snapshots untouched, history preserved. */
  def restore(spark: SparkSession, root: String, version: Long): Unit = {
    val avail = versions(spark, root)
    require(avail.contains(version),
      s"cannot restore to $version: not in $root (available: ${avail.mkString(", ")})")
    writePointer(spark, root, version)
  }
}
