package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.{TextFunctions => TF}

/** Continuous data-mixture drift monitoring: each micro-batch of
  * documents is compared against a static REFERENCE corpus with
  * [[TF.distributionShift]] (add-k smoothed unigram KL + total
  * variation), and one summary row per batch — totals, the top drifted
  * token, an alert flag — appends to a monitoring table. The streaming
  * form of d44, and the ingestion-side guard a 100 TB pipeline wants:
  * a crawler source going bad shows up as a KL spike within one batch,
  * before the data reaches training.
  *
  * Scale: the reference tokens aggregate once per batch alongside the
  * batch's (both partial-aggregated into the union vocabulary); for a
  * large static reference, pre-aggregate it to token counts and adapt
  * the union to counts — the monitor's output stays one row per batch
  * regardless.
  */
object StreamingDrift {

  def start(
      docs: DataFrame,
      refDocs: DataFrame,
      outPath: String,
      checkpoint: String,
      textCol: String = "text",
      klAlert: Double = 0.5,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val n = batch.count()
        if (n > 0) {
          val union = batch.select(col(textCol), lit(true).as("is_batch"))
            .unionByName(refDocs.select(col(textCol), lit(false).as("is_batch")))
          val shift = TF.distributionShift(union, textCol, col("is_batch"), topN = 1)
            .select(col("token"), col("kl_total"), col("tv_total"))
            .head()
          Seq((
            batchId, n,
            shift.getAs[Double]("kl_total"), shift.getAs[Double]("tv_total"),
            shift.getAs[String]("token"),
            shift.getAs[Double]("kl_total") > klAlert))
            .toDF("batch_id", "n_docs", "kl_total", "tv_total", "top_drift_token", "alert")
            .write.mode("append").parquet(outPath)
        }
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}
