package graft

import graft.functions.TrainingExport
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrainingExportSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val weights = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)

  test("split assignment is deterministic, stable under growth, near the weights") {
    val ids = spark.range(10000).select($"id".as("doc_id"))
    val a = TrainingExport.assignSplits(ids, "doc_id", weights)
    val counts = a.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 9000L) < 300, counts.toString)
    assert(math.abs(counts("val") - 500L) < 150, counts.toString)
    assert(math.abs(counts("test") - 500L) < 150, counts.toString)
    // growth stability: assignments of the first 1000 ids are identical
    // whether computed alone or within the 10k set (pure function of id)
    val small = TrainingExport
      .assignSplits(spark.range(1000).select($"id".as("doc_id")), "doc_id", weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fromBig = a.filter($"doc_id" < 1000)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small == fromBig)
    // a different salt reassigns (the two permutations disagree somewhere)
    val resalted = TrainingExport.assignSplits(ids, "doc_id", weights, salt = "v2")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fromBig.exists { case (id, s) => resalted(id) != s })
  }

  test("shuffle keys are a deterministic permutation uncorrelated with id order") {
    val ids = spark.range(2000).select($"id".as("doc_id"))
    val k = TrainingExport.withShuffleKeys(
      TrainingExport.assignSplits(ids, "doc_id", weights), "doc_id", nShards = 8)
    val ord = k.orderBy($"doc_id").select($"shuffle_ord").as[Long].collect()
    // deterministic across evaluation
    val ord2 = k.orderBy($"doc_id").select($"shuffle_ord").as[Long].collect()
    assert(ord.sameElements(ord2))
    // not monotone in id (a real shuffle): plenty of inversions
    val inversions = ord.sliding(2).count(p => p(1) < p(0))
    assert(inversions > 500, s"only $inversions inversions")
    // shards are balanced
    val shardCounts = k.groupBy($"shard").count().select($"count").as[Long].collect()
    assert(shardCounts.length == 8 && shardCounts.forall(c => c > 150 && c < 350))
  }

  test("sharded write: one dir per split, files internally sorted by shuffle key") {
    val dir = java.nio.file.Files.createTempDirectory("graft_export").toString
    val ids = spark.range(5000).select($"id".as("doc_id"))
    val k = TrainingExport.withShuffleKeys(
      TrainingExport.assignSplits(ids, "doc_id", weights), "doc_id", nShards = 4)
    TrainingExport.writeShards(k, dir, nShards = 4)
    val splits = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("split="))
    assert(splits.toSet == Set("split=train", "split=val", "split=test"))
    // every split has every shard directory
    val trainShards = new java.io.File(s"$dir/split=train").listFiles()
      .map(_.getName).filter(_.startsWith("shard=")).toSet
    assert(trainShards == (0 until 4).map(i => s"shard=$i").toSet)
    // nothing lost, nothing duplicated
    val back = spark.read.parquet(dir)
    assert(back.count() == 5000 && back.select($"doc_id").distinct().count() == 5000)
    // within EVERY train/shard file the shuffle key is non-decreasing
    for (shardDir <- new java.io.File(s"$dir/split=train").listFiles();
         f <- shardDir.listFiles() if f.getName.endsWith(".parquet")) {
      val fileOrd = spark.read.parquet(f.getAbsolutePath)
        .select($"shuffle_ord").as[Long].collect()
      assert(fileOrd.length > 0 &&
        fileOrd.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)), f.getName)
    }
  }
}
