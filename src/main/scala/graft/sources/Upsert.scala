package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC merge / upsert over parquet tables — MERGE INTO semantics without
  * a table format: matched keys take the update's values, unmatched
  * update rows insert, untouched base rows carry through.
  *
  * Two layers:
  *   - [[merge]] is the relational core: one full-outer shuffle join on
  *     the key, per-column coalesce, and an `op` provenance column
  *     (`updated` / `inserted` / `unchanged`). Full-outer cannot
  *     broadcast, so this is one exchange of base ∪ updates — correct,
  *     but at 100 TB you never run it over the whole table;
  *   - [[copyOnWrite]] is the scale path: statically prune the base scan
  *     to the partitions the update batch touches (collected from the
  *     batch — one value per partition, tiny), merge only those rows, and
  *     land the rewrite with DYNAMIC partition overwrite, so the job
  *     replaces exactly the touched partition directories and never reads
  *     or rewrites the rest of the table. An update batch touching 3 of
  *     30,000 date partitions costs 3 partitions of IO, not a table scan.
  *
  * Idempotent by construction: re-running the same batch rewrites the
  * same partitions to the same contents.
  */
object Upsert {

  /** MERGE `updates` into `base` on `keyCols`: same schema both sides;
    * update values win on matched keys. Adds `op` ∈ updated / inserted /
    * unchanged. */
  def merge(base: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(
      base.columns.toSet == updates.columns.toSet,
      s"schema mismatch: base ${base.columns.toSeq.sorted} vs updates " +
        s"${updates.columns.toSeq.sorted}")
    val dataCols = base.columns.filterNot(keyCols.contains).toSeq
    val u = updates.select(
      keyCols.map(col) ++
        dataCols.map(c => col(c).as(s"__u_$c")) :+
        lit(true).as("__u"): _*)
    val b = base.withColumn("__b", lit(true))
    b.join(u, keyCols, "full_outer")
      .select(
        keyCols.map(col) ++
          dataCols.map(c => coalesce(col(s"__u_$c"), col(c)).as(c)) :+
          when(col("__u").isNotNull && col("__b").isNotNull, lit("updated"))
            .when(col("__b").isNull, lit("inserted"))
            .otherwise(lit("unchanged"))
            .as("op"): _*)
  }

  /** Copy-on-write upsert into the partitioned parquet table at
    * `tableRoot` (layout `partitionCol=value/...`): merge `updates` into
    * ONLY the partitions they touch and atomically replace those
    * directories (dynamic partition overwrite). New partition values in
    * the batch create fresh directories. Returns (partitions touched,
    * rows written). */
  def copyOnWrite(
      spark: SparkSession,
      tableRoot: String,
      updates: DataFrame,
      keyCols: Seq[String],
      partitionCol: String): (Long, Long) = {
    require(!keyCols.contains(partitionCol), "partitionCol cannot be a merge key")
    // one value per touched partition — the unit of maintenance, tiny by
    // contract (a batch touches few partitions); collected so the base
    // scan is STATICALLY pruned to those directories
    val touched = updates.select(col(partitionCol)).distinct().collect().map(_.get(0))
    val rootPath = new org.apache.hadoop.fs.Path(tableRoot)
    val hfs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!hfs.exists(rootPath)) {
      // bootstrap: no table yet — the whole batch inserts
      val n = updates.count()
      updates.write.mode("overwrite").partitionBy(partitionCol).parquet(tableRoot)
      return (touched.length.toLong, n)
    }
    val raw = spark.read.parquet(tableRoot)
    // partition-directory values read back through type inference (a
    // date-like string becomes DATE); re-align to the batch's type so the
    // merge schema check compares like with like
    val partType = updates.schema(partitionCol).dataType
    val base = raw
      .withColumn(partitionCol, col(partitionCol).cast(partType))
      .filter(col(partitionCol).isin(touched: _*))
    // the rewrite reads and replaces the same directories: cut the plan
    // lineage first (localCheckpoint → leaf) so the overwrite does not
    // scan the files it is deleting — only the touched slice is
    // materialized, by construction the batch-sized unit of work
    val merged = merge(base, updates, keyCols).drop("op").localCheckpoint(true)
    val n = merged.count()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      merged.write
        .mode("overwrite")
        .partitionBy(partitionCol)
        .parquet(tableRoot)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    (touched.length.toLong, n)
  }
}
