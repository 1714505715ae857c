package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Dev-only experiment: does pre-projecting the token array before a
  * shingle explode cut task time, or does codegen subexpression
  * elimination already de-duplicate the tokenizer? Deleted/ignored by
  * the driver contract. */
object TokExp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")

    // variant A: current novelty shape (shingles(text) inside the explode)
    def novA(): DataFrame = {
      val sh = docs.select(col("doc_id"),
        explode(TextFunctions.shingles(col("text"), 3)).as("g"))
      val dfv = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
      sh.join(dfv, Seq("g")).groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("df") === 1, lit(1L)).otherwise(lit(0L))).as("n_novel"))
    }
    // variant B: project tokens once, shingle from the array
    def novB(): DataFrame = {
      def shinglesOf(t: org.apache.spark.sql.Column, n: Int) = {
        val zipped = (2 to n).foldLeft(t) { (acc, k) =>
          zip_with(acc, slice(t, lit(k), greatest(size(t) - (k - 1), lit(0))),
            (a, b) => concat(a, lit(" "), b))
        }
        array_distinct(
          when(size(t) < n, array(array_join(t, " ")))
            .otherwise(slice(zipped, lit(1), size(t) - (n - 1))))
      }
      val sh = docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("__t"))
        .select(col("doc_id"), explode(shinglesOf(col("__t"), 3)).as("g"))
      val dfv = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
      sh.join(dfv, Seq("g")).groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("df") === 1, lit(1L)).otherwise(lit(0L))).as("n_novel"))
    }

    def time(name: String, fn: () => DataFrame, reps: Int): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn().count()
        println(f"TOKEXP $name rep=$i sec=${(System.nanoTime() - t0) / 1e9}%.3f rows=$n")
      }
    time("A_text", () => novA(), 3)
    time("B_toks", () => novB(), 3)
    // cross-check identical results
    val diff = novA().exceptAll(novB()).count() + novB().exceptAll(novA()).count()
    println(s"TOKEXP diff=$diff")
    spark.stop()
  }
}
