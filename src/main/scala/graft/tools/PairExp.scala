package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only experiment for the m32 pair-correlation kernel: the pair
  * partial aggregate duplicates its hash state across every map
  * partition of the period join (M × |pairs| partial rows — measured
  * 243 MB shuffled for a top-50 output). Variants:
  *   A — current shape (join over the cached series' partitioning)
  *   B<n> — A-side coalesced to n partitions before the join
  *   C — join output repartitioned by (key_a, key_b) before the agg
  */
object PairExp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val series = graft.sources.Tables.engagementSeries(spark, sfDir)
    println(s"PAIREXP series rows=${series.count()} keys=${series.select("key").distinct().count()}")

    def screen(aSide: DataFrame, reshufflePairs: Boolean): DataFrame = {
      val a = aSide.select(col("key").as("key_a"), col("period"), col("value").as("va"))
      val b = series.select(col("key").as("key_b"), col("period"), col("value").as("vb"))
      val joined = a.join(b, Seq("period")).filter(col("key_a") < col("key_b"))
      val pre = if (reshufflePairs) joined.repartition(col("key_a"), col("key_b")) else joined
      pre
        .groupBy(col("key_a"), col("key_b"))
        .agg(corr(col("va"), col("vb")).as("correlation"), count(lit(1)).as("n_overlap"))
        .filter(col("n_overlap") >= 10 &&
          col("correlation").isNotNull && !isnan(col("correlation")))
        .withColumn("correlation", round(col("correlation"), 6))
        .orderBy(abs(col("correlation")).desc, col("key_a").asc, col("key_b").asc)
        .limit(50)
    }

    @volatile var shufRead = 0L
    @volatile var taskTimeMs = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shufRead += e.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        taskTimeMs += e.stageInfo.taskMetrics.executorRunTime
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def time(name: String, fn: () => DataFrame): Unit =
      (1 to 3).foreach { i =>
        shufRead = 0L; taskTimeMs = 0L
        val t0 = System.nanoTime()
        val n = fn().count()
        Thread.sleep(300)
        println(f"PAIREXP $name rep=$i sec=${(System.nanoTime() - t0) / 1e9}%.3f " +
          f"rows=$n shufRead=$shufRead taskTimeMs=$taskTimeMs")
      }
    time("A_current", () => screen(series, reshufflePairs = false))
    time("B4", () => screen(series.coalesce(4), reshufflePairs = false))
    time("B8", () => screen(series.coalesce(8), reshufflePairs = false))
    time("C_reshuffle", () => screen(series, reshufflePairs = true))
    // identical results?
    val base = screen(series, reshufflePairs = false)
    Seq("B8" -> screen(series.coalesce(8), reshufflePairs = false),
      "C" -> screen(series, reshufflePairs = true)).foreach { case (n, v) =>
      val d = base.exceptAll(v).count() + v.exceptAll(base).count()
      println(s"PAIREXP diff $n=$d")
    }
    spark.stop()
  }
}
