package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StateStore

/** Direct contract tests for the three StateStore layouts — the
  * durability backbone under all seven streaming operators. The
  * operator specs exercise the happy paths; these pin the layout
  * edges: version pruning, torn-dir garbage collection, slice-name
  * encoding, committed-only batch-dir reads. */
class StateStoreSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_ss").toString

  test("writeVersion keeps exactly one committed predecessor and GCs torn dirs") {
    val root = tmp()
    Seq((1, "a")).toDF("k", "v").coalesce(1) // v0
    StateStore.writeVersion(Seq((1, "a")).toDF("k", "v").coalesce(1), root, 0L)
    StateStore.writeVersion(Seq((2, "b")).toDF("k", "v").coalesce(1), root, 1L)
    StateStore.writeVersion(Seq((3, "c")).toDF("k", "v").coalesce(1), root, 2L)
    val dirs0 = new java.io.File(root).listFiles().map(_.getName).sorted.toSeq
    // v2 current + v1 safety predecessor; v0 pruned
    assert(dirs0 == Seq("v" + "%019d".format(1L), "v" + "%019d".format(2L)), dirs0)
    // torn dirs at OTHER batch ids (crashes that never replay the same
    // id) are swept by the next successful commit
    val torn = new java.io.File(root, "v" + "%019d".format(5L))
    torn.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(torn.toString, "part-x.parquet"), Array[Byte](1))
    StateStore.writeVersion(Seq((4, "d")).toDF("k", "v").coalesce(1), root, 3L)
    val dirs1 = new java.io.File(root).listFiles().map(_.getName).sorted.toSeq
    assert(!dirs1.contains(torn.getName), s"torn dir survived GC: $dirs1")
    assert(StateStore.readLatest(spark, root).get
      .as[(Int, String)].collect().toSeq == Seq((4, "d")))
  }

  test("slice layout round-trips hostile slice names through encoding") {
    val root = tmp()
    // a slash, a space, a percent, unicode — anything a slice VALUE
    // might legally contain but a path segment cannot
    val hostile = Seq("2024/01", "a b%c", "köln#7")
    hostile.zipWithIndex.foreach { case (s, i) =>
      StateStore.writeSliceVersion(
        Seq((s, i)).toDF("slice", "n").coalesce(1), root, s, batchId = 0L)
    }
    assert(StateStore.listSlices(spark, root).sorted == hostile.sorted)
    val all = StateStore.readLatestSlices(spark, root).get
      .as[(String, Int)].collect().toMap
    assert(all == hostile.zipWithIndex.toMap)
    // driver-side pruning: out-of-pred slices never enter the plan
    val only = StateStore.readLatestSlices(spark, root, _ == "2024/01").get
      .as[(String, Int)].collect().toSeq
    assert(only == Seq(("2024/01", 0)))
  }

  test("a torn slice write leaves that slice's previous version current") {
    val root = tmp()
    StateStore.writeSliceVersion(Seq(("d1", 1)).toDF("slice", "n").coalesce(1), root, "d1", 0L)
    StateStore.writeSliceVersion(Seq(("d2", 2)).toDF("slice", "n").coalesce(1), root, "d2", 0L)
    // simulate a crash mid-commit of d2's v1
    val torn = new java.io.File(s"$root/slice=d2", "v" + "%019d".format(1L))
    torn.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(torn.toString, "part-x.parquet"), Array[Byte](2))
    val all = StateStore.readLatestSlices(spark, root).get
      .as[(String, Int)].collect().toMap
    assert(all == Map("d1" -> 1, "d2" -> 2), s"torn slice version leaked: $all")
  }

  test("a beforeBatch bound on a mismatched lineage fails instead of hiding the index") {
    val root = tmp()
    StateStore.writeBatchDir(Seq(1L).toDF("fp").coalesce(1), root, 0L)
    StateStore.writeBatchDir(Seq(2L).toDF("fp").coalesce(1), root, 7L)
    // replaying batch 7 is legitimate: dirs strictly before it are read,
    // its own dir is excluded, nothing is ahead
    assert(StateStore.readCommittedBatchDirs(spark, root, beforeBatch = Some(7L)).get
      .as[Long].collect().toSeq == Seq(1L))
    // a RESTARTED id space (checkpoint deleted, stream back at batch 0)
    // must not silently treat the whole accumulated index as invisible
    val e = intercept[IllegalStateException](
      StateStore.readCommittedBatchDirs(spark, root, beforeBatch = Some(0L)))
    assert(e.getMessage.contains("checkpoint"), e.getMessage)
  }

  test("pre-versioned flat-parquet state fails loudly instead of resetting silently") {
    val root = tmp()
    // the pre-round-8 layout: state written directly at the root
    Seq((1, "a")).toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(root)
    val e = intercept[IllegalStateException](StateStore.readLatest(spark, root))
    assert(e.getMessage.contains("legacy state"), e.getMessage)
    intercept[IllegalStateException](StateStore.readCommittedBatchDirs(spark, root))
  }

  test("batch-dir layout reads only committed dirs; replay overwrites its own dir") {
    val root = tmp()
    StateStore.writeBatchDir(Seq(1L, 2L).toDF("fp").coalesce(1), root, 0L)
    StateStore.writeBatchDir(Seq(3L).toDF("fp").coalesce(1), root, 1L)
    // a torn append (crash before _SUCCESS) must be invisible
    val torn = new java.io.File(root, "b" + "%019d".format(2L))
    torn.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(torn.toString, "part-x.parquet"), Array[Byte](3))
    assert(StateStore.readCommittedBatchDirs(spark, root).get
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // a replayed batch REPLACES its dir instead of double-appending
    StateStore.writeBatchDir(Seq(3L, 4L).toDF("fp").coalesce(1), root, 1L)
    assert(StateStore.readCommittedBatchDirs(spark, root).get
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }
}
