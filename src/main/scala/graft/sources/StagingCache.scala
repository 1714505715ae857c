package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared memo for cached staging DataFrames (the canonical series, the
  * best-lag table, ...): one registry so a single [[clear]] sweeps every
  * staging table — per-call-site private maps would each need their own
  * invalidation path and inevitably go stale. */
object StagingCache {

  private val cache =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]

  /** Memoize `build` (cached) under (spark, name). Entries belonging to a
    * stopped session are evicted on every access so long-lived
    * multi-session drivers don't accumulate dead DataFrames and session
    * references. */
  def getOrElseUpdate(spark: SparkSession, name: String)(build: => DataFrame): DataFrame =
    cache.synchronized {
      cache.keys.filter(_._1.sparkContext.isStopped).toSeq.foreach(cache.remove)
      cache.getOrElseUpdate((spark, name), build.cache())
    }

  /** Unpersist and forget every staging table for `spark` (all sessions
    * when None). Call between datasets in a long-lived driver. */
  def clear(spark: Option[SparkSession] = None): Unit =
    cache.synchronized {
      val doomed = cache.keys.filter(k => spark.forall(_ == k._1)).toSeq
      doomed.foreach { k =>
        cache.remove(k).foreach(df => df.unpersist(blocking = false))
      }
    }
}
