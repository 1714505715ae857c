package graft

import graft.sources.Compaction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("compaction collapses a many-small-files dir, preserving every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    spark.range(20000).select($"id", ($"id" % 7).as("k"))
      .repartition(100).write.parquet(dir)
    val (before0, bytes) = Compaction.stats(spark, dir)
    assert(before0 == 100 && bytes > 0)
    // target a quarter of the bytes -> ~4 files
    val (before, after) = Compaction.compact(spark, dir, targetFileBytes = bytes / 4)
    assert(before == 100 && after <= 8 && after >= 2, s"$before -> $after")
    val back = spark.read.parquet(dir)
    assert(back.count() == 20000 && back.agg(sum($"id")).first().getLong(0) == 19999L * 10000L)
    // no leftover temp/old dirs
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(n => n.endsWith(".compact.tmp") || n.endsWith(".compact.old")))
  }

  test("compaction can fix the layout on the way (z-order rewrite)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_z").toString + "/t"
    spark.range(256L * 64).select(($"id" % 256).as("x"), ($"id" / 256).as("y"))
      .repartition(50).write.parquet(dir)
    val (_, bytes) = Compaction.stats(spark, dir)
    val (_, after) = Compaction.compact(
      spark, dir, targetFileBytes = bytes / 8, zOrderBy = Seq("x", "y"), zBits = 8)
    assert(after <= 16)
    val env = graft.functions.ZOrder.fileEnvelopes(spark.read.parquet(dir), Seq("x"))
      .collect()
    // z-ordered files bound x tightly: no file spans the whole domain
    assert(env.forall(r => r.getAs[Long]("max_x") - r.getAs[Long]("min_x") < 256))
    assert(spark.read.parquet(dir).count() == 256L * 64)
  }

  test("partition-scoped compaction leaves sibling partitions untouched") {
    val root = java.nio.file.Files.createTempDirectory("graft_compact_p").toString + "/t"
    spark.range(5000).select($"id", ($"id" % 2).cast("string").as("slice"))
      .repartition(40).write.partitionBy("slice").parquet(root)
    val sib = new java.io.File(s"$root/slice=0")
    val sibBefore = sib.listFiles().map(f => f.getName -> f.lastModified).toMap
    val (b, a) = Compaction.compactPartition(spark, root, "slice=1", targetFileBytes = 1L << 30)
    assert(b > 1 && a == 1, s"$b -> $a")
    assert(sib.listFiles().map(f => f.getName -> f.lastModified).toMap == sibBefore)
    // table still reads whole, with the partition column intact
    val back = spark.read.parquet(root)
    assert(back.count() == 5000 && back.filter($"slice" === "1").count() == 2500)
  }
}
