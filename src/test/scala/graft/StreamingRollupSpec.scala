package graft

import graft.functions.IncrementalAgg
import graft.streaming.StreamingRollup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingRollupSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("stream-maintained state table serves the exact rollup, late data included") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sroll").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, String, Double, Long)]
    val q = StreamingRollup.start(
      in.toDF().toDF("day", "grp", "value", "uid"),
      statePath = s"$dir/state", checkpoint = s"$dir/ckpt",
      sliceCol = col("day"), groupCols = Seq("grp"),
      valueCol = col("value"), distinctCol = col("uid"))

    val all = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double, Long)]
    def feedAndCheck(rows: (String, String, Double, Long)*): Unit = {
      rows.foreach(in.addData(_))
      all ++= rows
      q.processAllAvailable()
      val rollup = IncrementalAgg.rollupFromStore(spark, s"$dir/state", Seq("grp"))
        .collect().map(r => r.getAs[String]("grp") ->
          ((r.getAs[Long]("n_rows"), r.getAs[Double]("total_value"),
            r.getAs[Long]("distinct_est")))).toMap
      val direct = all.toSeq.toDF("day", "grp", "value", "uid")
        .groupBy($"grp").agg(
          count(lit(1)),
          sum($"value".cast("decimal(18,2)")).cast("double"),
          countDistinct($"uid"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
        .toMap
      assert(rollup == direct, s"rollup=$rollup direct=$direct")
    }

    feedAndCheck(
      ("2024-01-01", "a", 1.25, 1L), ("2024-01-01", "b", 2.00, 2L),
      ("2024-01-02", "a", 3.50, 1L))
    // batch 2 extends day 2 and opens day 3; uid 1 repeats across batches,
    // so the HLL union must de-duplicate across STORED state
    feedAndCheck(
      ("2024-01-02", "a", -0.75, 3L), ("2024-01-03", "b", 4.25, 1L))
    // batch 3 is pure LATE data for day 1 — a watermarked stream agg
    // would have dropped it; the state table just re-merges the slice
    feedAndCheck(("2024-01-01", "a", 10.00, 4L))
    q.stop()

    // the state table stayed slice-partitioned and constant-size:
    // one row per (slice, grp) despite repeated merges
    val state = spark.read.parquet(s"$dir/state")
    assert(state.groupBy($"slice", $"grp").count().filter($"count" > 1).count() == 0)
    // windowed serving read prunes: only days 2-3
    val win = IncrementalAgg.rollupFromStore(
      spark, s"$dir/state", Seq("grp"), sliceFrom = Some("2024-01-02"))
    assert(win.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    val winMap = win.collect().map(r => r.getString(0) -> r.getAs[Long]("n_rows")).toMap
    assert(winMap == Map("a" -> 2L, "b" -> 1L))
  }
}
