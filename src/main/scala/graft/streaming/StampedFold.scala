package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The shared driver-side keyed-fold protocol under the streaming
  * sketch operators ([[StreamingHll]], [[StreamingHistogram]],
  * [[StreamingCountMin]]): read the latest committed state version,
  * skip if already stamped with this batch id (the crash-window
  * replay), merge the batch's map into the stored map cell-wise, and
  * commit the new version through [[StateStore]]. One implementation —
  * the stamp semantics, the empty-state path, and the coalesce(1)
  * single-file commit cannot drift between operators; each operator
  * supplies only its schema adapters and merge operator (MAX for HLL,
  * + for histogram/CMS). */
private[streaming] object StampedFold {

  def fold[K, V](
      spark: SparkSession,
      statePath: String,
      batchCounts: Map[K, V],
      batchId: Long,
      readKV: Row => (K, V),
      writeDf: Map[K, V] => DataFrame,
      merge: (V, V) => V): Unit = {

    def commit(m: Map[K, V]): Unit =
      StateStore.writeVersion(
        writeDf(m).withColumn("batch_id", lit(batchId)).coalesce(1),
        statePath, batchId)

    StateStore.readLatest(spark, statePath) match {
      case Some(state) =>
        val rows = state.collect()
        val stamped = rows.headOption.exists(_.getAs[Long]("batch_id") == batchId)
        if (!stamped) {
          val stored = rows.map(readKV).toMap
          val merged = (stored.keySet ++ batchCounts.keySet).map { k =>
            k -> ((stored.get(k), batchCounts.get(k)) match {
              case (Some(a), Some(b)) => merge(a, b)
              case (Some(a), None) => a
              case (None, b) => b.get
            })
          }.toMap
          commit(merged)
        }
      case None => commit(batchCounts)
    }
  }
}
