package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tiny-state persistence shared by the streaming operators
  * ([[StreamingTopK]]'s sketch, and the existence checks of
  * [[StreamingRollup]] / [[StreamingDedup]]'s state tables).
  *
  * Two hazards this exists to close:
  *
  *  1. `java.io.File.exists` is only correct on the local filesystem —
  *     on HDFS/S3 (the 100 TB deployment target) it is ALWAYS false, so
  *     a fold would silently treat stored state as empty and reset the
  *     accumulated sketch to the current batch. Existence must go
  *     through Hadoop's `FileSystem`, resolved from the path itself.
  *
  *  2. `mode("overwrite")` on the ONLY copy of a state table is
  *     delete-then-rewrite: a crash mid-write loses the accumulated
  *     state permanently, and the stream checkpoint only replays the
  *     last batch, so history is unrecoverable. State writes here are
  *     versioned instead — each fold writes a NEW `v<batchId>`
  *     directory (its `_SUCCESS` marker is the commit point; a
  *     half-written version has no marker and is ignored), readers pick
  *     the highest committed version, and only strictly-older versions
  *     are pruned after a successful commit. At every instant at least
  *     one fully-committed version is readable.
  */
object StateStore {

  /** Hadoop-FS existence check for a state path (never java.io.File). */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  // zero-padded so lexicographic order == numeric batch order
  private def versionDir(batchId: Long): String = f"v$batchId%019d"

  private def committedVersions(spark: SparkSession, root: String): Seq[Path] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) Seq.empty
    else
      fs.listStatus(rootPath)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
        .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
        .map(_.getPath)
        .sortBy(_.getName)
        .toSeq
  }

  /** The latest fully-committed state version under `root`, if any. */
  def readLatest(spark: SparkSession, root: String): Option[DataFrame] =
    committedVersions(spark, root).lastOption
      .map(p => spark.read.parquet(p.toString))

  /** Commit `df` as the state version for `batchId`, then prune older
    * committed versions (keeping one predecessor as a safety copy). The
    * previous version is never touched until the new one has its
    * `_SUCCESS` marker — a crash anywhere leaves the old state current. */
  def writeVersion(df: DataFrame, root: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    val target = new Path(root, versionDir(batchId))
    df.write.mode("overwrite").parquet(target.toString)
    val keep = Set(target.getName)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val committed = committedVersions(spark, root).filterNot(p => keep(p.getName))
    // keep the newest predecessor; delete everything older
    committed.dropRight(1).foreach(p => fs.delete(p, true))
  }
}
