package graft

import graft.functions.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("zValue matches a reference Morton interleave") {
    def ref(a: Long, b: Long, bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits) {
        z |= ((a >> i) & 1L) << (2 * i)     // dim 0 -> even positions
        z |= ((b >> i) & 1L) << (2 * i + 1) // dim 1 -> odd positions
      }
      z
    }
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L),
      (65535L, 1L), (12345L, 54321L), (70000L, 3L)) // 70000 > 2^16: masked
    val got = pairs.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue(Seq($"a", $"b"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == ref(a & 0xFFFF, b & 0xFFFF, 16), s"($a,$b)")
    }
    // three dims: bit i of dim j at position 3i+j
    val z3 = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(ZOrder.zValue(Seq($"a", $"b", $"c"), 4)).first().getLong(0)
    assert(z3 == 7L) // 0b111
  }

  test("zValueSql computes the identical key in Spark SQL") {
    // the oracle-side formula, executed by Spark's ANSI engine as a
    // stand-in for DuckDB (same arithmetic, bitwise ops, precedence)
    val df = Seq((12345L, 54321L), (99L, 1000L)).toDF("a", "b")
    val viaSql = df.selectExpr(s"${ZOrder.zValueSql(Seq("a", "b"), 16)} AS z")
      .as[Long].collect().toSeq
    val viaCol = df.select(ZOrder.zValue(Seq($"a", $"b"), 16)).as[Long].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("z-ordered files skip a y-box that an x-sorted layout must scan fully") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val grid = spark.range(256L * 256L).select(
      (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    ZOrder.writeZOrdered(grid, s"$dir/z", Seq("x", "y"), bits = 8, nFiles = 32)
    grid.withColumn("__k", col("x"))
      .repartitionByRange(32, col("__k")).sortWithinPartitions(col("__k"))
      .drop("__k").write.mode("overwrite").parquet(s"$dir/ctl")

    def hits(path: String, pred: org.apache.spark.sql.Row => Boolean): (Int, Int) = {
      val env = ZOrder.fileEnvelopes(spark.read.parquet(path), Seq("x", "y")).collect()
      (env.count(pred), env.length)
    }
    // y-only box [64, 79]: every x-sorted file spans all of y -> 0 skipped
    def yBox(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("min_y") <= 79L && r.getAs[Long]("max_y") >= 64L
    val (zHits, zFiles) = hits(s"$dir/z", yBox)
    val (cHits, cFiles) = hits(s"$dir/ctl", yBox)
    assert(zFiles == 32 && cFiles == 32)
    assert(cHits == 32, s"x-sorted control should scan everything, hit $cHits")
    assert(zHits <= 10, s"z-order should prune most files, hit $zHits")
    // both-dims box: z still prunes; and RESULTS are layout-independent
    def count(path: String) = spark.read.parquet(path)
      .filter($"x".between(100, 120) && $"y".between(64, 79)).count()
    assert(count(s"$dir/z") == count(s"$dir/ctl") && count(s"$dir/z") == 21L * 16L)
  }
}
