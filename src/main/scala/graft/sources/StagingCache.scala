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

  def contains(spark: SparkSession, name: String): Boolean =
    cache.synchronized(cache.contains((spark, name)))

  /** Unpersist and forget the single entry (spark, name), if present. */
  def remove(spark: SparkSession, name: String): Unit =
    cache.synchronized {
      cache.remove((spark, name)).foreach(_.unpersist(blocking = false))
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

  import scala.concurrent.{Await, Future, Promise}
  import scala.concurrent.duration.Duration

  // per-key futures, NOT a value map guarded by one lock: a build is an
  // iterative distributed training job, and holding a global lock for
  // its duration would serialize unrelated model builds. putIfAbsent
  // makes exactly one caller run `build`; concurrent callers for the
  // SAME key await its future, callers for other keys proceed.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Future[Any]]

  def getOrElseUpdate[T](spark: SparkSession, name: String)(build: => T): T = {
    cache.keys.filter(_._1.sparkContext.isStopped).foreach(cache.remove)
    val p = Promise[Any]()
    cache.putIfAbsent((spark, name), p.future) match {
      case Some(f) => Await.result(f, Duration.Inf).asInstanceOf[T]
      case None =>
        try { val v = build; p.success(v); v }
        catch {
          case e: Throwable =>
            cache.remove((spark, name)); p.failure(e); throw e
        }
    }
  }

  def contains(spark: SparkSession, name: String): Boolean =
    cache.contains((spark, name))

  def clear(spark: Option[SparkSession] = None): Unit =
    cache.keys.filter(k => spark.forall(_ == k._1)).foreach(cache.remove)
}
