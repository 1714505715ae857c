package graft

import graft.streaming.StreamingUpsert
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming CDC apply: batches upsert into the partitioned serving
  * table; last-version-wins within a batch; later batches override
  * earlier ones; untouched partitions survive. */
class StreamingUpsertSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("change stream converges to last-writer-wins per key") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sups").toString
    val root = s"$dir/table"

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (id, part, amount, version)
    val in = MemoryStream[(Long, String, Double, Long)]
    val q = StreamingUpsert.start(
      in.toDF().toDF("id", "part", "amount", "version"),
      root, checkpoint = s"$dir/ckpt",
      keyCols = Seq("id"), partitionCol = "part", versionCol = Some("version"))

    // batch 1 bootstraps the table; key 1 appears twice — version 2 wins
    in.addData((1L, "a", 10.0, 1L), (1L, "a", 11.0, 2L), (2L, "b", 20.0, 1L))
    q.processAllAvailable()
    val t1 = spark.read.parquet(root)
      .select($"id", $"amount", $"version").as[(Long, Double, Long)].collect().toSet
    assert(t1 == Set((1L, 11.0, 2L), (2L, 20.0, 1L)))

    // batch 2: update key 1, insert key 3 in a new partition; partition b
    // untouched
    def bFiles(): Set[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/part=b"))
        .iterator().asScala.map(_.getFileName.toString)
        .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
    }
    val bBefore = bFiles()
    in.addData((1L, "a", 12.0, 3L), (3L, "c", 30.0, 1L))
    q.processAllAvailable()
    q.stop()

    assert(bFiles() == bBefore, "untouched partition was rewritten")
    val t2 = spark.read.parquet(root)
      .select($"id", $"amount", $"version").as[(Long, Double, Long)].collect().toSet
    assert(t2 == Set((1L, 12.0, 3L), (2L, 20.0, 1L), (3L, 30.0, 1L)))
  }

  test("lastPerKey picks the max-version change per key") {
    val batch = Seq(
      (1L, "a", 1.0, 5L), (1L, "a", 2.0, 9L), (2L, "a", 3.0, 1L)
    ).toDF("id", "part", "amount", "version")
    val last = StreamingUpsert.lastPerKey(batch, Seq("id"), "version")
      .select($"id", $"amount").as[(Long, Double)].collect().toSet
    assert(last == Set((1L, 2.0), (2L, 3.0)))
  }
}
