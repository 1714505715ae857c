package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.Upsert

/** Continuous CDC apply: a stream of change records upserted into a
  * partitioned parquet serving table — the always-on form of
  * [[graft.sources.Upsert.copyOnWrite]].
  *
  * Each micro-batch merges into ONLY the partitions it touches (static
  * pruning from the batch's partition values + dynamic partition
  * overwrite), so steady-state cost tracks batch size, never table size.
  * Within a batch, the LAST change per key wins when `versionCol` is
  * given (ordered dedup before the merge — CDC feeds replay with
  * monotone versions); without it, duplicate in-batch keys are rejected
  * nowhere and merge on a duplicate key would multiply rows — pass the
  * version column for real CDC feeds.
  *
  * Delivery: foreachBatch is at-least-once; a replayed batch re-merges
  * the same records into the same partitions — the merge is idempotent
  * (same keys, same values), so the table converges. Combined with
  * checkpointed batch ids this is the standard exactly-once-effect
  * upsert sink Spark users build on Delta's MERGE — here on plain
  * parquet.
  */
object StreamingUpsert {

  def start(
      changes: DataFrame,
      tableRoot: String,
      checkpoint: String,
      keyCols: Seq[String],
      partitionCol: String,
      versionCol: Option[String] = None,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = versionCol match {
          case Some(v) => lastPerKey(batch, keyCols, v)
          case None    => batch
        }
        if (!b.isEmpty) {
          Upsert.copyOnWrite(batch.sparkSession, tableRoot, b, keyCols, partitionCol)
          ()
        }
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  /** Latest change per key by (`versionCol`, then any stable order): one
    * window rank over the batch — batches are small by contract. */
  def lastPerKey(batch: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol).desc)
    batch.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
