package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic training-data export: split assignment (train/val/test),
  * global pseudo-random shuffle, and sharded writes — the last mile of a
  * training pipeline, where "shuffle 100 TB" must mean a DETERMINISTIC
  * permutation (reproducible runs, resumable exports, auditable splits),
  * never `rand()`.
  *
  * Everything derives from the salted portable md5 hash of the document
  * id ([[TextFunctions.portableHash]]), so:
  *   - assignment is a pure function of (salt, id): adding documents
  *     never reassigns existing ones, and re-runs are idempotent;
  *   - distinct salts give independent assignments (split vs shuffle
  *     order use different salts — a doc's split says nothing about its
  *     position);
  *   - a DuckDB oracle reproduces every value bit-for-bit
  *     (d37_split_export).
  *
  * Scale shape: one codegen'd projection (no shuffle) for assignment;
  * the export itself is ONE hash-partition exchange to `nShards`
  * shards + an in-partition sort by shuffle key — the minimum physical
  * work any global shuffle-and-shard can do.
  */
object TrainingExport {

  /** Salted hash in [0, `buckets`): the assignment primitive. */
  def saltedBucket(id: Column, salt: String, buckets: Int): Column =
    pmod(
      TextFunctions.portableHash(concat(lit(salt + ":"), id.cast("string"))),
      lit(buckets.toLong))

  /** Add a `split` column from cumulative weights, e.g.
    * `Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)`. Weights are
    * resolved at 1/10000 granularity. */
  def assignSplits(
      df: DataFrame,
      idCol: String,
      weights: Seq[(String, Double)],
      salt: String = "split"): DataFrame = {
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val h = saltedBucket(col(idCol), salt, 10000)
    val cuts = weights.map(_._2).scanLeft(0.0)(_ + _).tail.map(w => math.round(w * 10000))
    // CASE h < cut1 THEN name1 WHEN h < cut2 THEN name2 ... ELSE lastName
    val splitCol = weights.init.zip(cuts).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), cut)) =>
        Some(acc.fold(when(h < lit(cut), name))(_.when(h < lit(cut), name)))
    }.fold(lit(weights.last._1))(_.otherwise(weights.last._1))
    df.withColumn("split", splitCol)
  }

  /** Add the deterministic global-shuffle keys: `shuffle_ord` (the
    * permutation rank source — a salted 60-bit hash) and `shard`. */
  def withShuffleKeys(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      salt: String = "shuffle"): DataFrame =
    df.withColumn(
        "shuffle_ord",
        TextFunctions.portableHash(concat(lit(salt + ":"), col(idCol).cast("string"))))
      .withColumn("shard", pmod(col("shuffle_ord"), lit(nShards.toLong)))

  /** Write the export: one directory per (split, shard), rows ordered by
    * the shuffle key within every file — a trainer streams shard files
    * in path order and sees the deterministic global permutation. The
    * task sort leads with the PARTITION columns (split, shard): the file
    * writer requires that ordering and would otherwise inject its own
    * non-stable sort by them, destroying the shuffle-key order. With the
    * prefix in place no extra sort happens and each shard's file is a
    * contiguous key-sorted run even when two shards share a task. */
  def writeShards(df: DataFrame, path: String, nShards: Int): Unit =
    df.repartition(nShards * 4, col("split"), col("shard"))
      .sortWithinPartitions(col("split"), col("shard"), col("shuffle_ord"))
      .write.mode("overwrite").partitionBy("split", "shard").parquet(path)
}
