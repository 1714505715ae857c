package graft

import graft.streaming.{StateStore, StreamingRollup}
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
      val rollup = StreamingRollup.rollup(spark, s"$dir/state", Seq("grp"))
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

    // the state stayed sliced and constant-size: one row per
    // (slice, grp) despite repeated merges
    val state = StateStore.readLatestSlices(spark, s"$dir/state").get
    assert(state.groupBy($"slice", $"grp").count().filter($"count" > 1).count() == 0)
    // windowed serving read prunes on the DRIVER's slice listing: only
    // days 2-3 enter the plan's file set at all
    val win = StreamingRollup.rollup(
      spark, s"$dir/state", Seq("grp"), sliceFrom = Some("2024-01-02"))
    assert(
      win.inputFiles.forall(f => f.contains("slice=2024-01-02") || f.contains("slice=2024-01-03")),
      win.inputFiles.toSeq)
    val winMap = win.collect().map(r => r.getString(0) -> r.getAs[Long]("n_rows")).toMap
    assert(winMap == Map("a" -> 2L, "b" -> 1L))
  }

  test("a torn slice write is invisible; other slices stay current; replay recovers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sroll2").toString
    val state = s"$dir/state"
    // seed two slices via the public API (simulating two committed batches)
    def states(rows: (String, String, Double, Long)*) =
      graft.functions.IncrementalAgg.partialStates(
        rows.toSeq.toDF("day", "grp", "value", "uid"),
        col("day"), Seq(col("grp")), col("value"), col("uid"))
    StateStore.writeSliceVersion(
      states(("2024-01-01", "a", 1.0, 1L)).withColumn("batch_id", lit(0L)),
      state, "2024-01-01", 0L)
    StateStore.writeSliceVersion(
      states(("2024-01-02", "a", 2.0, 2L)).withColumn("batch_id", lit(1L)),
      state, "2024-01-02", 1L)
    // crash mid-write of batch 2 on day 2: torn version, no _SUCCESS
    val torn = new java.io.File(s"$state/slice=2024-01-02", "v" + "%019d".format(2L))
    torn.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(torn.toString, "part-00000.parquet"), Array[Byte](1, 2, 3))
    val rollup = StreamingRollup.rollup(spark, state, Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("total_value")).toMap
    assert(rollup == Map("a" -> 3.0), "torn slice version must not be read")
    // replay commits over the torn dir; the merge reads the last
    // COMMITTED day-2 state, so nothing is lost or double-counted
    StateStore.writeSliceVersion(
      states(("2024-01-02", "a", 2.0, 2L), ("2024-01-02", "a", 5.0, 3L))
        .withColumn("batch_id", lit(2L)),
      state, "2024-01-02", 2L)
    val after = StreamingRollup.rollup(spark, state, Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("total_value")).toMap
    assert(after == Map("a" -> 8.0))
    val versions = new java.io.File(s"$state/slice=2024-01-02").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(versions.length <= 2 && versions.max == "v" + "%019d".format(2L), versions.toSeq)
  }
}
