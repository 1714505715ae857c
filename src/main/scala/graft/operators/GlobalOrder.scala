package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global row numbering WITHOUT a single-partition window.
  *
  * `row_number() OVER (ORDER BY ...)` moves the entire dataset through
  * ONE task — the canonical scale-killer (Spark itself logs "No
  * Partition Defined for Window operation" on it). This operator gets
  * the identical numbering with distributed work:
  *
  *   1. range-repartition by the sort key (the same exchange a global
  *      sort needs — each partition holds a contiguous key range),
  *   2. count rows per partition (a few hundred longs to the driver),
  *   3. broadcast-join the cumulative offsets back and add the
  *      PER-PARTITION row_number.
  *
  * Two passes over the data instead of one single-threaded one; at
  * 100 TB pass two is embarrassingly parallel while the naive form
  * never finishes. Ties must be broken deterministically by the caller
  * (include a unique column last in `order`) — with ties left
  * unresolved, numbering inside a tie run is partitioner-dependent.
  */
object GlobalOrder {

  /** Append `outCol` = 1-based global rank of the row under `order`
    * (which must be a total order for deterministic output). */
  def withRowNumber(
      df: DataFrame,
      order: Seq[Column],
      outCol: String = "global_rn",
      numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val ranged = df
      .repartitionByRange(n, order: _*)
      .withColumn("__pid", spark_partition_id())
    // partition counts: one tiny aggregate; cached upstream ranges are
    // NOT re-shuffled for pass two — the exchange is reused below
    val persisted = ranged.cache()
    val counts = persisted.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val offsetDf = broadcast(
      spark.createDataFrame(offsets.take(n).zipWithIndex.map { case (o, p) => (p, o) })
        .toDF("__pid", "__offset"))
    val wPart = Window.partitionBy(col("__pid")).orderBy(order: _*)
    persisted
      .join(offsetDf, Seq("__pid"))
      .withColumn(outCol, (row_number().over(wPart) + col("__offset")).cast("long"))
      .drop("__pid", "__offset")
  }
}
