package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // run in sorted-name order: queries is a Map (unordered), and several
    // families share staging caches (m6/m7/m8/m11 the DTW summaries,
    // d3/d5 the MinHash signatures) — whichever runs first pays the
    // shared cost, so a fixed order keeps per-query attribution
    // comparable across rounds
    // Dev-only: SPARK_GRAFT_ONLY=m6_dtw_mapping,m11_pipeline restricts the
    // run for targeted timing, in the GIVEN order (so staging-cache costs
    // can be attributed deliberately). The driver sets no env -> full
    // suite in sorted order.
    val ordered = sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some(names) =>
        val toks = names.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        val unknown = toks.filterNot(SparkEntry.queries.contains)
        if (unknown.nonEmpty) sys.error(
          s"SPARK_GRAFT_ONLY: unknown queries ${unknown.mkString(", ")}; " +
            s"known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
        toks.map(n => n -> SparkEntry.queries(n))
      case None => SparkEntry.queries.toSeq.sortBy(_._1)
    }
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
