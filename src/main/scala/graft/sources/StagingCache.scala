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
      ModelCache.clear(spark)
    }
}

/** Driver-side memo for TRAINED MODELS (k-means centroids, PQ codebooks —
  * small arrays, kilobytes): the ANN query family trains identical models
  * from the same corpus (d26/d27 share raw-vector PQ codebooks, d15/d27/d31
  * share coarse centroids), and retraining is iterative distributed work.
  * Keyed like [[StagingCache]]; training params must be part of the key. */
object ModelCache {

  private val cache =
    scala.collection.mutable.Map.empty[(SparkSession, String), Any]

  def getOrElseUpdate[T](spark: SparkSession, name: String)(build: => T): T =
    cache.synchronized {
      cache.keys.filter(_._1.sparkContext.isStopped).toSeq.foreach(cache.remove)
      cache.getOrElseUpdate((spark, name), build).asInstanceOf[T]
    }

  def contains(spark: SparkSession, name: String): Boolean =
    cache.synchronized(cache.contains((spark, name)))

  def clear(spark: Option[SparkSession] = None): Unit =
    cache.synchronized {
      cache.keys.filter(k => spark.forall(_ == k._1)).toSeq.foreach(cache.remove)
    }
}
