package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: the co-located-join lever for repeated
  * large-fact joins (SURVEY.md §4 scale levers).
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the
  * join key lets Spark plan the join with NO shuffle exchange on either
  * side — at 100 TB that turns the dominant cost of a fact-to-fact join
  * (two full-table shuffles) into a bucket-wise local join. The staging
  * tables a production deployment materializes (canonical series,
  * per-entity summaries) are exactly the tables worth bucketing by
  * `key`; BucketingSpec locks the no-Exchange plan.
  *
  * Bucket count guidance: pick so each bucket is 100-500 MB at target
  * scale (e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket per table side —
  * pair with partitionBy on a date column so a bucket-file stays small).
  */
object Bucketing {

  /** Write as a bucketed+sorted managed table (parquet). Bucketing
    * metadata lives in the catalog, so readers must go through
    * `spark.table(name)` — path reads see plain files and lose the
    * no-shuffle property. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCol: String,
      nBuckets: Int,
      partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .saveAsTable(tableName)
  }

  /** Read a bucketed table back (catalog path — keeps bucket metadata). */
  def readBucketed(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
