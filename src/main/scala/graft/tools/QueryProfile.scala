package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev-only per-query profiler (NOT part of the driver contract): runs
  * named registered queries repeatedly in one JVM and prints, per rep,
  * the wall seconds split into DataFrame construction / planning /
  * execution, plus job/stage/task/shuffle counts from a listener — the
  * "measure first" data §1 of the optimization guide asks for, on a
  * headless box with no Spark UI.
  *
  * Usage: sbt "runMain graft.tools.QueryProfile d63_centroid_classifier,d65_perceptron_classifier"
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_PROFILE_REPS.
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "3").toInt
    val names = args.toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "pass query names (comma/space separated)")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var shufRead = 0L
    @volatile var shufWrite = 0L
    @volatile var taskTimeMs = 0L
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages += 1
        val si = e.stageInfo
        tasks += si.numTasks
        shufRead += si.taskMetrics.shuffleReadMetrics.totalBytesRead
        shufWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
        taskTimeMs += si.taskMetrics.executorRunTime
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      val fn = graft.SparkEntry.queries.getOrElse(
        n, sys.error(s"unknown query $n; known: ${graft.SparkEntry.queries.keys.toSeq.sorted}"))
      (1 to reps).foreach { i =>
        jobs = 0; stages = 0; tasks = 0; shufRead = 0L; shufWrite = 0L; taskTimeMs = 0L
        spark.sparkContext.setJobDescription(s"profile:$n#$i")
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tc = System.nanoTime()
        df.queryExecution.executedPlan // force analysis -> physical planning
        val tp = System.nanoTime()
        df.count()
        val t1 = System.nanoTime()
        Thread.sleep(300) // let the listener bus drain
        println(f"PROFILE $n rep=$i total=${(t1 - t0) / 1e9}%.3f " +
          f"construct=${(tc - t0) / 1e9}%.3f plan=${(tp - tc) / 1e9}%.3f " +
          f"exec=${(t1 - tp) / 1e9}%.3f jobs=$jobs stages=$stages tasks=$tasks " +
          f"shufRead=$shufRead shufWrite=$shufWrite taskTimeMs=$taskTimeMs")
      }
    }
    spark.sparkContext.setJobDescription(null)
    spark.stop()
  }
}
