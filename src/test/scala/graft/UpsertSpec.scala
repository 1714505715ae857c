package graft

import java.nio.file.{Files, Paths}
import graft.sources.Upsert
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MERGE semantics and the partition-scoped copy-on-write: update wins on
  * matched keys, inserts create rows (and partitions), untouched
  * partitions are not rewritten. */
class UpsertSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "p1", 10.0),
    (2L, "p1", 20.0),
    (3L, "p2", 30.0),
    (4L, "p3", 40.0)
  ).toDF("id", "day", "amount")

  test("merge: update wins on match, insert on miss, base carries through") {
    val updates = Seq(
      (2L, "p1", 99.0), // matched → updated
      (9L, "p4", 90.0)  // new → inserted
    ).toDF("id", "day", "amount")
    val out = Upsert.merge(base, updates, Seq("id"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("amount"), r.getAs[String]("op"))).toMap
    assert(out(1L) == ((10.0, "unchanged")))
    assert(out(2L) == ((99.0, "updated")))
    assert(out(9L) == ((90.0, "inserted")))
    assert(out.size == 5)
  }

  test("merge rejects mismatched schemas and missing keys") {
    intercept[IllegalArgumentException] {
      Upsert.merge(base, base.drop("amount"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Upsert.merge(base, base, Nil)
    }
  }

  test("copyOnWrite rewrites only touched partitions; untouched files survive") {
    val root = Files.createTempDirectory("upsert").toString + "/t"
    base.write.partitionBy("day").parquet(root)
    def partFiles(day: String): Set[String] = {
      val d = Paths.get(s"$root/day=$day")
      import scala.jdk.CollectionConverters._
      Files.list(d).iterator().asScala.map(_.getFileName.toString)
        .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
    }
    val before0102 = partFiles("p2")

    val updates = Seq(
      (1L, "p1", 11.0), // rewrite day=2024-01-01
      (8L, "p9", 80.0)  // new partition day=2024-01-09
    ).toDF("id", "day", "amount")
    val (nParts, nRows) = Upsert.copyOnWrite(spark, root, updates, Seq("id"), "day")
    assert(nParts == 2L, s"touched $nParts partitions")
    assert(nRows == 3L, s"wrote $nRows rows") // ids 1, 2 (day p1) + 8 (day p9)

    // untouched partition directory is bit-for-bit the same files
    assert(partFiles("p2") == before0102, "untouched partition was rewritten")

    val after = spark.read.parquet(root)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("day"), r.getAs[Double]("amount"))).toMap
    assert(after == Map(
      1L -> (("p1", 11.0)),
      2L -> (("p1", 20.0)),
      3L -> (("p2", 30.0)),
      4L -> (("p3", 40.0)),
      8L -> (("p9", 80.0))))

    // idempotent: the same batch again yields the same table
    Upsert.copyOnWrite(spark, root, updates, Seq("id"), "day")
    val again = spark.read.parquet(root)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("day"), r.getAs[Double]("amount"))).toMap
    assert(again == after)
  }
}
