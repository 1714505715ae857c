package graft.streaming

import java.net.{URLDecoder, URLEncoder}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tiny-state persistence shared by the streaming operators — the
  * versioned-commit layer under [[StreamingTopK]]'s sketch,
  * [[StreamingForecast]]'s smoothing state, [[StreamingShift]]'s
  * history, [[StreamingRollup]]'s per-slice states, and
  * [[StreamingDedup]]'s append-only fingerprint index.
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
  *
  * Three layouts, one commit protocol (`_SUCCESS` == committed):
  *
  *  - WHOLE-TABLE state (TopK sketch, Forecast state, Shift history):
  *    `root/v<batch>/` — [[writeVersion]] / [[readLatest]]. Write cost
  *    is O(state), which is fine because these states are O(keys) or
  *    O(capacity), never O(history).
  *  - SLICED state (Rollup's per-day mergeable aggregates): each slice
  *    is its own whole-table root at `root/slice=<s>/v<batch>/` —
  *    [[writeSliceVersion]] / [[readLatestSlices]]. A batch rewrites
  *    ONLY the slices it touches (the write-amplification contract),
  *    and a torn slice write leaves that slice's previous version
  *    current. Serving reads resolve the latest committed version per
  *    slice on the driver (one listing) and scan them in a single
  *    multi-path parquet relation — slices outside a requested range
  *    are never listed into the plan at all, which is stronger than
  *    partition pruning.
  *  - APPEND-ONLY state (Dedup's fingerprint index): each batch lands
  *    in its own committed `root/b<batch>/` dir — [[writeBatchDir]] /
  *    [[readCommittedBatchDirs]]. A plain `mode("append")` would be
  *    non-atomic (a crash can leave a truncated part-file that poisons
  *    every later read of the directory); per-batch dirs keep the
  *    append-proportional write cost AND make a replayed batch
  *    overwrite its own dir instead of double-appending. Long-lived
  *    streams bound the dir count with [[compactBatchDirs]]: absorbed
  *    ids stay "committed" via the compacted dir's manifest, so the
  *    replay contract survives compaction.
  */
object StateStore {

  /** Default wall-clock sweep grace for compactions fired from INSIDE a
    * running stream (`compactEvery`): the accumulated indexes are
    * explicitly advertised for concurrent ad-hoc serving while the
    * stream runs (StreamingDecontam triage, bm25FromIndex at any time),
    * and two cadence fires within one long ad-hoc read would otherwise
    * sweep dirs out from under that reader. Ten minutes covers any sane
    * interactive read; deployments with longer concurrent scans must
    * raise it to ≥ their longest read. Maintenance-job compaction keeps
    * the pure one-generation rule (grace 0) — its cadence is the grace. */
  val defaultInStreamGraceMs: Long = 10 * 60 * 1000L

  /** How long a crashed compactor's `_compact_lease` blocks the next
    * one before being stolen. Long enough that a live (slow) compaction
    * is never stolen from; short enough that an always-on cadence
    * resumes compacting within the hour after a crash mid-compaction. */
  val defaultCompactLeaseTtlMs: Long = 30 * 60 * 1000L

  /** Hadoop-FS existence check for a state path (never java.io.File). */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  // zero-padded so lexicographic order == numeric batch order
  private def versionDir(batchId: Long): String = f"v$batchId%019d"

  private def dirsWithPrefix(
      spark: SparkSession,
      root: String,
      prefix: String,
      committedOnly: Boolean): Seq[Path] = {
    val rootPath = new Path(root)
    val fs = fsFor(spark, rootPath)
    if (!fs.exists(rootPath)) Seq.empty
    else
      fs.listStatus(rootPath)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
        .filter(s => !committedOnly || fs.exists(new Path(s.getPath, "_SUCCESS")))
        .map(_.getPath)
        .sortBy(_.getName)
        .toSeq
  }

  private def committedVersions(spark: SparkSession, root: String): Seq[Path] =
    dirsWithPrefix(spark, root, "v", committedOnly = true)

  /** Refuse to read a root that holds PRE-VERSIONED flat-parquet state
    * (part-files directly under it, no layout dirs): returning None
    * there would silently reset accumulated state to empty on the first
    * restart after an upgrade — fail loudly with the migration instead.
    * Data inside the version, slice, and batch dirs is of course fine. */
  private def guardLegacyState(spark: SparkSession, root: String): Unit = {
    val rootPath = new Path(root)
    val fs = fsFor(spark, rootPath)
    if (fs.exists(rootPath)) {
      val legacy = fs.listStatus(rootPath).exists(s =>
        s.isFile && (s.getPath.getName.startsWith("part-") ||
          s.getPath.getName.endsWith(".parquet")))
      if (legacy) throw new IllegalStateException(
        s"unversioned legacy state at $root (flat parquet part-files, no " +
          "version dirs) — migrate by moving the files into a " +
          s"'${versionDir(0L)}' subdirectory containing a _SUCCESS marker")
    }
  }

  /** The latest fully-committed state version under `root`, if any. */
  def readLatest(spark: SparkSession, root: String): Option[DataFrame] = {
    guardLegacyState(spark, root)
    committedVersions(spark, root).lastOption
      .map(p => spark.read.parquet(p.toString))
  }

  /** Commit `df` as the state version for `batchId`, then prune older
    * committed versions (keeping one predecessor as a safety copy) and
    * any uncommitted (torn) version dirs other than the one just
    * written. The previous version is never touched until the new one
    * has its `_SUCCESS` marker — a crash anywhere leaves the old state
    * current — and torn dirs from crashes at OTHER batch ids don't
    * accumulate forever. */
  def writeVersion(df: DataFrame, root: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    val target = new Path(root, versionDir(batchId))
    df.write.mode("overwrite").parquet(target.toString)
    val keep = Set(target.getName)
    val fs = fsFor(spark, target)
    val committed = committedVersions(spark, root).filterNot(p => keep(p.getName))
    // keep the newest predecessor; delete everything older
    committed.dropRight(1).foreach(p => fs.delete(p, true))
    // garbage-collect torn dirs: an uncommitted v<id> from a crash at a
    // DIFFERENT batch id never gets replayed-over, so sweep them here
    dirsWithPrefix(spark, root, "v", committedOnly = false)
      .filterNot(p => keep(p.getName))
      .filter(p => !fs.exists(new Path(p, "_SUCCESS")))
      .foreach(p => fs.delete(p, true))
  }

  // ---- sliced state (one versioned root per slice) ----------------------

  // slice values become directory names; encode so arbitrary slice
  // strings (spaces, slashes) stay one path segment. Date-like slices
  // pass through unchanged.
  private def encodeSlice(slice: String): String =
    URLEncoder.encode(slice, "UTF-8")

  private def decodeSlice(dirName: String): String =
    URLDecoder.decode(dirName.stripPrefix("slice="), "UTF-8")

  private def sliceRoot(root: String, slice: String): Path =
    new Path(root, "slice=" + encodeSlice(slice))

  /** Commit `df` as slice `slice`'s state for `batchId`. `df` must carry
    * the slice value as a regular data column — the directory name is
    * layout, not schema, so reads need no partition inference. */
  def writeSliceVersion(df: DataFrame, root: String, slice: String, batchId: Long): Unit =
    writeVersion(df, sliceRoot(root, slice).toString, batchId)

  /** All slice values present under `root` (committed or not — a slice
    * with only torn versions simply resolves to no readable data). */
  def listSlices(spark: SparkSession, root: String): Seq[String] =
    dirsWithPrefix(spark, root, "slice=", committedOnly = false)
      .map(p => decodeSlice(p.getName))

  /** The latest committed version dir of each slice matching `pred`, as
    * one multi-path DataFrame — `None` when nothing committed matches.
    * Slices failing `pred` never enter the plan (driver-side pruning). */
  def readLatestSlices(
      spark: SparkSession,
      root: String,
      pred: String => Boolean = _ => true): Option[DataFrame] = {
    guardLegacyState(spark, root)
    val paths = listSlices(spark, root)
      .filter(pred)
      .flatMap(s => committedVersions(spark, sliceRoot(root, s).toString).lastOption)
      .map(_.toString)
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }

  // ---- append-only state (one committed dir per batch) ------------------

  private def batchDir(batchId: Long): String = f"b$batchId%019d"

  private def compactedDir(upTo: Long): String = f"c$upTo%019d"

  /** RAW committed compacted dirs (parquet `_SUCCESS` + `_merged_ids`
    * manifest both present — the manifest is the commit point, renamed
    * into place atomically, so a torn compaction is wholly invisible),
    * newest-name first, NO overlap resolution. */
  private def rawManifests(
      spark: SparkSession, root: String): Seq[(Path, Seq[Long])] =
    dirsWithPrefix(spark, root, "c", committedOnly = true)
      .flatMap { p =>
        val fs = fsFor(spark, p)
        val mf = new Path(p, "_merged_ids")
        if (!fs.exists(mf)) None
        else {
          val in = fs.open(mf)
          val ids =
            try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
              .filter(_.nonEmpty).map(_.toLong).toList
            finally in.close()
          Some(p -> ids)
        }
      }
      .sortBy(_._1.getName)(Ordering[String].reverse)

  /** Committed compacted dirs with the batch ids each absorbed,
    * newest-name first, overlap-resolved: compaction keeps absorbed
    * sources for ONE GENERATION (the grace period for in-flight
    * readers), so during that window an id can appear in both an older
    * c-dir/b-dir and the newest manifest — the newest manifest wins,
    * and older redundant dirs are swept by the NEXT generation's
    * [[compactBatchDirs]]. */
  private def compactedManifests(
      spark: SparkSession, root: String): Seq[(Path, Seq[Long])] = {
    val seen = scala.collection.mutable.Set.empty[Long]
    rawManifests(spark, root).flatMap { case (p, ids) =>
      if (ids.forall(seen.contains)) None
      else { seen ++= ids; Some(p -> ids) }
    }
  }

  /** Compact the given COMMITTED batch ids into ONE directory,
    * preserving the replay contract: the compacted dir carries a
    * `_merged_ids` manifest of every absorbed batch id (committed
    * atomically via temp-file + rename — a crash mid-write cannot leave
    * a partial manifest that marks the wrong ids committed),
    * [[committedBatchIds]] keeps reporting absorbed ids as committed
    * (so a replayed absorbed batch is still skipped by its writer), and
    * readers resolve absorbed ids to the compacted dir. `layout`
    * re-clusters the merged data (e.g. re-sort by term for an inverted
    * index) — identity by default.
    *
    * Concurrent-reader safety: absorbed sources are NOT deleted by the
    * compaction that absorbs them — they survive one full generation
    * (readers that listed paths before the new manifest landed keep
    * reading live files; readers that list after it resolve to the
    * compacted dir) and are swept by the NEXT generation's compaction,
    * the [[writeVersion]] keep-one-predecessor rule applied to batch
    * dirs. Torn compactions (no manifest) are invisible and swept once
    * a newer committed compaction exists.
    *
    * Caller contract: `ids` must all be committed, must cover every
    * previously-compacted id they overlap (a compacted dir cannot be
    * split), and must be FULLY VISIBLE to every reader — for
    * multi-table state like the BM25 index, ids in the tables'
    * intersection; and NEVER the newest committed id when any writer
    * may replay (the newest id can sit inside a replay window only the
    * stream checkpoint knows about: its replay must be able to
    * subset-read its own dir and to bound reads strictly before itself
    * — [[Retrieval.compactIndex]]-style wrappers enforce this by
    * dropping the newest id). `ids` is canonicalized (distinct, sorted)
    * before any use, so duplicate caller ids cannot produce a
    * non-canonical manifest.
    *
    * `sweepGraceMs` puts a WALL-CLOCK floor under the one-generation
    * reader grace: a previous generation's absorbed dirs are only swept
    * once the manifest that superseded them is at least this old, so
    * two compactions in quick succession cannot delete dirs out from
    * under a reader that listed paths just before the newer manifest
    * landed. The default 0 keeps the pure generation rule — operate
    * with either a grace ≥ the longest concurrent read, or a compaction
    * cadence no faster than one per max-reader-lifetime.
    *
    * Concurrent-COMPACTOR safety: a `compactEvery` cadence inside
    * foreachBatch can race an external maintenance job on the same
    * root. Each call takes a best-effort `_compact_lease` marker
    * (atomic create-if-absent) before touching anything; the loser
    * returns `false` and skips cleanly — never the mid-stream
    * same-target-different-ids throw a blind race could otherwise hit,
    * and never a concurrent double-sweep. A lease older than
    * `leaseTtlMs` is a crashed compactor's and is stolen (the steal's
    * own small race window is crash-recovery-only; the steady-state
    * race is closed by the atomic create). Returns `true` when this
    * call performed (or retry-verified) the compaction and sweep. */
  def compactBatchDirs(
      spark: SparkSession,
      root: String,
      ids: Seq[Long],
      layout: DataFrame => DataFrame = identity,
      sweepGraceMs: Long = 0L,
      leaseTtlMs: Long = defaultCompactLeaseTtlMs): Boolean = {
    val cids = ids.distinct.sorted
    val committed = committedBatchIds(spark, root)
    val missing = cids.filterNot(committed.contains)
    require(missing.isEmpty,
      s"cannot compact uncommitted batch ids ${missing.mkString(",")} at $root")
    val fsRoot = fsFor(spark, new Path(root))
    if (!acquireCompactLease(fsRoot, root, leaseTtlMs)) return false
    try {
      doCompactAndSweep(spark, root, cids, layout, sweepGraceMs)
      true
    } finally fsRoot.delete(new Path(root, "_compact_lease"), false)
  }

  /** Best-effort mutual exclusion between compactors on one root: an
    * atomic create-if-absent of the lease file wins; a loser checks the
    * holder's age and steals only past `ttlMs` (crash recovery). */
  private def acquireCompactLease(
      fs: FileSystem, root: String, ttlMs: Long): Boolean = {
    val lp = new Path(root, "_compact_lease")
    def tryCreate(): Boolean =
      try {
        val out = fs.create(lp, false)
        try out.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    tryCreate() || {
      val stale =
        try System.currentTimeMillis() -
          fs.getFileStatus(lp).getModificationTime >= ttlMs
        catch { case _: java.io.FileNotFoundException => true }
      stale && { fs.delete(lp, false); tryCreate() }
    }
  }

  private def doCompactAndSweep(
      spark: SparkSession,
      root: String,
      cids: Seq[Long],
      layout: DataFrame => DataFrame,
      sweepGraceMs: Long): Unit = {
    if (cids.length >= 2) {
      val targetName = compactedDir(cids.max)
      rawManifests(spark, root).find(_._1.getName == targetName) match {
        case Some((_, mids)) if mids.toSet == cids.toSet =>
          // this exact compaction already committed (a retry) — fall
          // through to the sweep only
        case Some((p, mids)) =>
          // same target name, different id set: proceeding would
          // overwrite the dir the merged plan reads from — the caller
          // must absorb ALL of the existing compaction's ids
          throw new IllegalStateException(
            s"compaction target ${p.getName} at $root already holds ids " +
              s"${mids.mkString(",")} != requested ${cids.mkString(",")} — " +
              "include every id of the existing compaction")
        case None =>
          val merged = readBatchDirsById(spark, root, cids).get
          val target = new Path(root, targetName)
          layout(merged).write.mode("overwrite").parquet(target.toString)
          val fs = fsFor(spark, target)
          // atomic manifest commit: a partial _merged_ids (crash mid-
          // write) would mark truncated ids committed — permanent data
          // loss when their replayed writers skip. Temp name + rename.
          val tmp = new Path(target, "_merged_ids.tmp")
          val out = fs.create(tmp, true)
          try out.write(cids.mkString("", "\n", "\n").getBytes("UTF-8"))
          finally out.close()
          if (!fs.rename(tmp, new Path(target, "_merged_ids")))
            throw new IllegalStateException(
              s"manifest rename failed at $target — compaction not committed")
      }
    }
    sweepStaleGenerations(spark, root, sweepGraceMs)
  }

  /** Delete sources a PREVIOUS compaction generation absorbed: b-dirs
    * and c-dirs whose ids are covered by a manifest NEWER than their
    * own absorption — i.e. everything except the newest manifest's own
    * grace copies. Runs on every [[compactBatchDirs]] call (including
    * retries), so crash-mid-sweep leftovers never need a data rewrite
    * to clean up.
    *
    * `graceMs` adds a wall-clock floor to the generation rule: a dir is
    * only swept once EVERY id it holds has been resolvable elsewhere
    * for at least `graceMs`. Per id, the clock starts at the OLDEST
    * newer manifest containing it (the moment newest-wins resolution
    * stopped pointing readers at this dir for that id), measured by
    * the manifest file's modification time; the dir's clock is the
    * LAST of its ids' clocks. Using the oldest-containing manifest per
    * id keeps retention BOUNDED under the wrappers' cumulative
    * manifests — every later compaction re-lists old ids, and a
    * latest-manifest clock would reset on each one, retaining dirs
    * forever under an always-on compactEvery cadence. */
  private def sweepStaleGenerations(
      spark: SparkSession, root: String, graceMs: Long = 0L): Unit = {
    val raw = rawManifests(spark, root)
    raw.headOption.foreach { case (newestPath, _) =>
      val fs = fsFor(spark, newestPath)
      val now = System.currentTimeMillis()
      val mtimes: Map[String, Long] = raw.map { case (p, _) =>
        p.getName -> fs.getFileStatus(new Path(p, "_merged_ids")).getModificationTime
      }.toMap
      // a dir (name `selfName`, holding `selfIds`) is past its grace
      // when the last of its ids stopped resolving here ≥ graceMs ago
      def graceElapsed(selfName: String, selfIds: Set[Long]): Boolean = {
        val idClocks = selfIds.toSeq.map { id =>
          raw.collect {
            case (p, mids) if p.getName > selfName && mids.contains(id) =>
              mtimes(p.getName)
          } match {
            case Nil => Long.MaxValue // unshadowed id: never eligible
            case ms  => ms.min
          }
        }
        val clock = idClocks.max
        clock != Long.MaxValue && now - clock >= graceMs
      }
      // ids absorbed by non-newest generations had their grace window
      val prevAbsorbed = raw.tail.flatMap(_._2).toSet
      dirsWithPrefix(spark, root, "b", committedOnly = false)
        .filter { p =>
          val id = p.getName.drop(1).toLong
          prevAbsorbed.contains(id) && graceElapsed(p.getName, Set(id))
        }
        .foreach(p => fs.delete(p, true))
      // stale committed c-dirs: the same one-generation grace as
      // b-dirs — the c-dir the NEWEST manifest absorbed is its grace
      // copy (in-flight readers may have resolved ids to it) and
      // survives; a c-dir covered by another NON-newest manifest had
      // its grace window and goes
      raw.tail.foreach { case (p, mids) =>
        val othersPrev = raw.tail.filterNot(_._1.getName == p.getName)
          .flatMap(_._2).toSet
        if (mids.toSet.subsetOf(othersPrev) &&
          graceElapsed(p.getName, mids.toSet)) fs.delete(p, true)
      }
      // torn c-dirs (no manifest) were never visible to any reader —
      // no grace needed, sweep on sight once a newer commit exists
      dirsWithPrefix(spark, root, "c", committedOnly = false)
        .filter(p => p.getName < newestPath.getName &&
          !fs.exists(new Path(p, "_merged_ids")))
        .foreach(p => fs.delete(p, true))
    }
  }

  /** Land `df` as batch `batchId`'s contribution to an append-only state
    * table. A replayed batch OVERWRITES its own dir (idempotent); a torn
    * write has no `_SUCCESS` and is invisible to readers, unlike a torn
    * `mode("append")` part-file which would poison the whole directory. */
  def writeBatchDir(df: DataFrame, root: String, batchId: Long): Unit = {
    val target = new Path(root, batchDir(batchId))
    df.write.mode("overwrite").parquet(target.toString)
  }

  /** Committed batch ids under `root`, ascending — per-batch dirs plus
    * every id absorbed into a committed compacted dir (so a replayed
    * absorbed batch still sees itself as done). For multi-table state
    * whose tables commit per batch independently (e.g. the BM25 index's
    * postings + stats), readers intersect each table's ids so a crash
    * BETWEEN the two writes of one batch never yields a half-applied
    * view — the torn batch is simply not in the intersection, and the
    * replay overwrites both sides. */
  def committedBatchIds(spark: SparkSession, root: String): Seq[Long] = {
    guardLegacyState(spark, root)
    val absorbed = compactedManifests(spark, root).flatMap(_._2).toSet
    val bIds = dirsWithPrefix(spark, root, "b", committedOnly = true)
      .map(_.getName.drop(1).toLong)
      // a b-dir whose id was absorbed is a leftover from a crash mid-
      // sweep: the compacted copy is authoritative (newest-wins)
      .filterNot(absorbed.contains)
    (bIds ++ absorbed).distinct.sorted
  }

  /** The named committed batch dirs under `root` as one multi-path
    * relation; `None` for an empty id list. Ids must come from
    * [[committedBatchIds]] (no existence re-check here). Ids absorbed
    * by a compaction resolve to their compacted dir; requesting a
    * STRICT SUBSET of a compacted dir's ids throws — the dir can only
    * be read whole, and silently returning the extra batches' rows
    * would e.g. score postings against stats that exclude them (the
    * half-applied view the id-intersection readers exist to prevent).
    * Compact only fully-visible prefixes and this never fires. */
  def readBatchDirsById(
      spark: SparkSession,
      root: String,
      ids: Seq[Long]): Option[DataFrame] = {
    if (ids.isEmpty) None
    else {
      val manifests = compactedManifests(spark, root)
      val requested = ids.toSet
      manifests.foreach { case (p, mids) =>
        if (mids.exists(requested.contains) && !mids.forall(requested.contains))
          throw new IllegalStateException(
            s"compacted dir ${p.getName} at $root holds batches " +
              s"${mids.mkString(",")} but only ${ids.mkString(",")} were " +
              "requested — a compacted dir cannot be subset-read; compact " +
              "only prefixes that are fully visible to every reader")
      }
      val absorbed: Map[Long, Path] =
        manifests.flatMap { case (p, mids) => mids.map(_ -> p) }.toMap
      val paths = ids
        .map(id => absorbed.getOrElse(id, new Path(root, batchDir(id))).toString)
        .distinct
      Some(spark.read.parquet(paths: _*))
    }
  }

  /** Union of committed batch dirs under `root` as one multi-path
    * relation; `None` when no batch has committed yet (or none survive
    * the bound). `beforeBatch` excludes dirs at or after that batch id:
    * a REPLAYED batch must read the index as of batches < itself — its
    * own (already-committed) dir from the crashed attempt would feed
    * its output back into its input (batch ids are monotone within one
    * checkpoint lineage, which is what makes the bound correct). */
  def readCommittedBatchDirs(
      spark: SparkSession,
      root: String,
      beforeBatch: Option[Long] = None): Option[DataFrame] = {
    guardLegacyState(spark, root)
    val manifests = compactedManifests(spark, root)
    val absorbed = manifests.flatMap(_._2).toSet
    val committed = dirsWithPrefix(spark, root, "b", committedOnly = true)
      // absorbed b-dirs are crash-mid-sweep leftovers; the compacted
      // copy is authoritative (newest-wins, like committedBatchIds)
      .filterNot(p => absorbed.contains(p.getName.drop(1).toLong))
    beforeBatch.foreach { n =>
      // Lineage check: during a legitimate replay of batch n the ONLY
      // committed dir at or beyond n is n's own (from the crashed
      // attempt) — batch ids are monotone within one checkpoint
      // lineage. A committed dir BEYOND n means the checkpoint was
      // deleted/moved and ids restarted; silently bounding the read
      // would treat the whole accumulated index as invisible (dedup
      // re-admits everything) and then overwrite low-numbered dirs —
      // fail loudly instead, like guardLegacyState.
      val ahead = committed.map(_.getName).filter(_ > batchDir(n)) ++
        manifests.flatMap(_._2).filter(_ > n).map(id => s"compacted:$id")
      if (ahead.nonEmpty) throw new IllegalStateException(
        s"state at $root holds committed batch dirs beyond batch $n " +
          s"(${ahead.mkString(", ")}) — the stream checkpoint does not " +
          "match this state (was the checkpoint deleted or relocated?); " +
          "restore the matching checkpoint or start a fresh state root")
      // a compacted dir that STRADDLES the bound (some ids < n, its own
      // id = n from a crashed replay) cannot be subset-read; compaction
      // below the replay frontier (the caller contract) never creates
      // one, and the `ahead` throw above already rejects ids > n
      manifests.foreach { case (p, mids) =>
        if (mids.exists(_ < n) && mids.exists(_ >= n))
          throw new IllegalStateException(
            s"compacted dir ${p.getName} at $root spans the replay bound " +
              s"$n (ids ${mids.mkString(",")}) — compact only below the " +
              "replay frontier")
      }
    }
    val bound = beforeBatch.map(batchDir)
    val paths = (committed.filter(p => bound.forall(p.getName < _)) ++
      manifests.collect {
        case (p, mids) if beforeBatch.forall(n => mids.forall(_ < n)) => p
      }).map(_.toString)
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }
}
