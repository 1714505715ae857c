package graft

import graft.functions.IncrementalDedup
import graft.streaming.StreamingDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // docs are 12 distinct tokens; a dup doc shares >50% of its 4-shingles
  private def doc(seed: Int): String =
    (0 until 12).map(j => s"w${seed}_$j").mkString(" ")
  // shares 9 of 12 tokens with doc(seed): dup_fraction above 0.5
  private def mostlyDup(seed: Int, tag: Int): String =
    ((0 until 9).map(j => s"w${seed}_$j") ++ (0 until 3).map(j => s"x${tag}_$j"))
      .mkString(" ")

  test("collect and distributed sketch folds produce bit-identical blooms") {
    // two sessions over IDENTICAL batches; one forced down the
    // distributed partial-bloom branch — putLong into the live filter
    // must set exactly the bits a same-geometry merge sets
    def freshSession(dir: String) = new StreamingDedup.Session(
      spark, spark.range(0).select($"id".as("fp")),
      s"$dir/out", s"$dir/idx", "text", "doc_id",
      shingleSize = 4, fpp = 0.01, dropAt = 0.5,
      expectedTotalKeys = 10000L, portable = true)
    val batches = Seq(
      Seq((1L, doc(1)), (2L, doc(2))),
      Seq((3L, mostlyDup(1, 3)), (4L, doc(4))))
    def run(): (Array[Byte], Map[Long, Boolean]) = {
      val dir = java.nio.file.Files.createTempDirectory("graft_sdd_fold").toString
      val s = freshSession(dir)
      batches.zipWithIndex.foreach { case (b, i) =>
        s.processBatch(b.toDF("doc_id", "text"), i.toLong)
      }
      (s.sketchBytes, spark.read.parquet(s"$dir/out")
        .select($"id", $"keep").as[(Long, Boolean)].collect().toMap)
    }
    val cap0 = StreamingDedup.bloomFoldCollectMax
    val (collectSketch, collectOut) = run()
    val (distSketch, distOut) = try {
      StreamingDedup.bloomFoldCollectMax = 0
      run()
    } finally StreamingDedup.bloomFoldCollectMax = cap0
    assert(java.util.Arrays.equals(collectSketch, distSketch),
      "putLong fold must equal the same-geometry partial merge bit-for-bit")
    assert(collectOut == distOut && collectOut == Map(
      1L -> true, 2L -> true, 3L -> false, 4L -> true))
  }

  test("stream dedups each batch against corpus plus previously-kept docs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdd").toString
    val corpus = Seq((0L, doc(0)), (1L, doc(1))).toDF("doc_id", "text")
    val staticIdx = IncrementalDedup.shingleFps(corpus, "text", "doc_id", 4)

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.start(
      in.toDF().toDF("doc_id", "text"),
      staticIdx,
      outPath = s"$dir/out", streamIdxPath = s"$dir/idx",
      checkpoint = s"$dir/ckpt", shingleSize = 4,
      expectedTotalKeys = 10000L)
    // batch 1: 10 dups corpus doc 0 (drop); 11 is novel (keep)
    in.addData((10L, mostlyDup(0, 10)), (11L, doc(11)))
    q.processAllAvailable()
    // batch 2: 12 dups corpus (drop); 13 dups KEPT stream doc 11 (drop —
    // only catchable via the stream index); 14 is novel (keep)
    in.addData((12L, mostlyDup(1, 12)), (13L, mostlyDup(11, 13)), (14L, doc(14)))
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(s"$dir/out")
      .select($"id", $"keep", $"batch_id").as[(Long, Boolean, Long)].collect()
    val keepById = out.map(r => r._1 -> r._2).toMap
    assert(out.length == 5)
    assert(keepById == Map(10L -> false, 11L -> true, 12L -> false, 13L -> false, 14L -> true))
    // batch attribution: 10/11 in an earlier batch than 12/13/14
    val batchOf = out.map(r => r._1 -> r._3).toMap
    assert(batchOf(10L) == batchOf(11L) && batchOf(12L) == batchOf(14L))
    assert(batchOf(10L) < batchOf(12L))

    // bit-parity with the batch operator run by hand with the same unions
    val b1 = Seq((10L, mostlyDup(0, 10)), (11L, doc(11))).toDF("doc_id", "text")
    val want1 = IncrementalDedup
      .passageDedupStats(b1, staticIdx, "text", "doc_id", shingleSize = 4)
      .select($"id", $"keep").as[(Long, Boolean)].collect().toMap
    assert(want1 == Map(10L -> false, 11L -> true))
    val idx2 = staticIdx.unionByName(IncrementalDedup.shingleFps(
      b1.filter($"doc_id" === 11L), "text", "doc_id", 4))
    val b2 = Seq((12L, mostlyDup(1, 12)), (13L, mostlyDup(11, 13)), (14L, doc(14)))
      .toDF("doc_id", "text")
    val want2 = IncrementalDedup
      .passageDedupStats(b2, idx2, "text", "doc_id", shingleSize = 4)
      .select($"id", $"keep").as[(Long, Boolean)].collect().toMap
    assert(want2 == Map(12L -> false, 13L -> false, 14L -> true))

    // the stream index holds only novel fps: distinct == total appended
    // rows — read through the committed-batch-dir layout
    val idxRows = graft.streaming.StateStore
      .readCommittedBatchDirs(spark, s"$dir/idx").get
    assert(idxRows.count() == idxRows.distinct().count())
  }

  test("batch caches do not accumulate across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdd_gc").toString
    val corpus = Seq((0L, doc(0))).toDF("doc_id", "text")
    val staticIdx = IncrementalDedup.shingleFps(corpus, "text", "doc_id", 4)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.start(
      in.toDF().toDF("doc_id", "text"), staticIdx,
      s"$dir/out", s"$dir/idx", s"$dir/ckpt", shingleSize = 4,
      expectedTotalKeys = 10000L)
    in.addData((20L, doc(20)))
    q.processAllAvailable()
    val persisted = spark.sparkContext.getPersistentRDDs.size
    in.addData((21L, doc(21)))
    q.processAllAvailable()
    in.addData((22L, doc(22)))
    q.processAllAvailable()
    q.stop()
    // two more batches must not add persistent entries
    assert(spark.sparkContext.getPersistentRDDs.size <= persisted)
  }

  private def newSession(dir: String, staticIdx: org.apache.spark.sql.DataFrame) =
    new StreamingDedup.Session(
      spark, staticIdx, s"$dir/out", s"$dir/idx",
      "text", "doc_id", 4, 0.01, 0.5, 10000L, true)

  test("a replayed batch does not read its own committed fp dir") {
    // the crash window: batch N commits its fp dir, dies before the
    // checkpoint offset commit, and is re-delivered as batch N again.
    // The replay must reproduce the ORIGINAL decisions (keep) and leave
    // the fp dir intact — reading its own dir would flip its docs to
    // duplicates and overwrite the dir with nothing, permanently
    val dir = java.nio.file.Files.createTempDirectory("graft_sdd_rp").toString
    val staticIdx = IncrementalDedup.shingleFps(
      Seq((0L, doc(0))).toDF("doc_id", "text"), "text", "doc_id", 4)
    val batch = Seq((30L, doc(30))).toDF("doc_id", "text")
    val s1 = newSession(dir, staticIdx)
    s1.processBatch(batch, 5L)
    def decisions() = spark.read.parquet(s"$dir/out")
      .select($"id", $"keep").as[(Long, Boolean)].collect().toMap
    def idxFps() = graft.streaming.StateStore
      .readCommittedBatchDirs(spark, s"$dir/idx").get.count()
    val (d0, n0) = (decisions(), idxFps())
    assert(d0 == Map(30L -> true) && n0 > 0)
    // replay in a FRESH session (post-crash restart shape)
    newSession(dir, staticIdx).processBatch(batch, 5L)
    assert(decisions() == d0, "replay flipped the decisions")
    assert(idxFps() == n0, "replay emptied the batch's fp dir")
  }

  test("the bounded suspect set reaches the stored fp scan as a pushed literal") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdd_pd").toString
    val staticIdx = IncrementalDedup.shingleFps(
      Seq((0L, doc(0))).toDF("doc_id", "text"), "text", "doc_id", 4)
    val s1 = newSession(dir, staticIdx)
    s1.processBatch(Seq((50L, doc(50))).toDF("doc_id", "text"), 0L)
    // batch 1 duplicates kept doc 50 → its fps are bloom suspects that
    // must be confirmed against the STORED (fp-clustered) batch dir,
    // with the suspect set planted as a pushed In(fp) literal
    val s2 = newSession(dir, staticIdx)
    s2.capturePlans = true
    s2.processBatch(Seq((51L, mostlyDup(50, 51))).toDF("doc_id", "text"), 1L)
    val p = s2.lastConfirmPlan
    assert(p.contains("In(fp") && p.contains("PushedFilters: ["),
      s"suspect literal did not reach the scan:\n$p")
    // and the decisions are unchanged by the pruning (parity)
    val keep = spark.read.parquet(s"$dir/out")
      .select($"id", $"keep").as[(Long, Boolean)].collect().toMap
    assert(keep == Map(50L -> true, 51L -> false))
  }

  test("a restarted session screens against fps the stream already kept") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdd_rs").toString
    val staticIdx = IncrementalDedup.shingleFps(
      Seq((0L, doc(0))).toDF("doc_id", "text"), "text", "doc_id", 4)
    val s1 = newSession(dir, staticIdx)
    s1.processBatch(Seq((40L, doc(40))).toDF("doc_id", "text"), 0L)
    // restart: a fresh session must seed its bloom from the committed
    // stream index, not just the static corpus — the bloom is a hard
    // pre-filter, so a static-only seed would let dups of 40 through
    val s2 = newSession(dir, staticIdx)
    val kept40Fp = IncrementalDedup.shingleFps(
      Seq((40L, doc(40))).toDF("doc_id", "text"), "text", "doc_id", 4)
      .select($"fp").as[Long].head()
    assert(s2.mightContain(kept40Fp), "restart bloom lost the stream's kept fps")
    s2.processBatch(Seq((41L, mostlyDup(40, 41))).toDF("doc_id", "text"), 1L)
    val keep = spark.read.parquet(s"$dir/out")
      .select($"id", $"keep").as[(Long, Boolean)].collect().toMap
    assert(keep == Map(40L -> true, 41L -> false),
      s"restarted stream re-admitted a duplicate of a kept doc: $keep")
  }
}
