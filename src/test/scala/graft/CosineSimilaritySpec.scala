package graft

import graft.functions.Similarity
import graft.functions.expressions.CosineSimilarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen'd cosine_sim(a, b) must agree bit-for-bit with the
  * portable zip_with/aggregate fold (same sequential accumulation). */
class CosineSimilaritySpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("native expression equals the fold composition bit-for-bit") {
    CosineSimilarity.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("vec"))
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .limit(2000)
      .select(
        expr("cosine_sim(a.vec, b.vec)").as("native"),
        Similarity.cosine(col("a.vec"), col("b.vec")).as("folded"))
    val diffs = pairs.filter($"native" =!= $"folded").count()
    assert(diffs == 0, s"$diffs pairs differ")
  }

  test("null input and length mismatch yield null, zero vector yields NaN") {
    CosineSimilarity.register(spark)
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0))),
      (None, Some(Seq(1.0, 2.0))),
      (Some(Seq(0.0, 0.0)), Some(Seq(1.0, 2.0))),
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(1.0, 2.0))) // dimension mismatch
    ).toDF("a", "b")
    val out = df.select(expr("cosine_sim(a, b)").as("c")).collect().map(r =>
      if (r.isNullAt(0)) "null" else if (r.getDouble(0).isNaN) "nan" else "ok")
    assert(out.toSeq == Seq("ok", "null", "nan", "null"))
  }

  test("plan stays in whole-stage codegen") {
    CosineSimilarity.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"embedding".cast("array<double>").as("vec"))
    val plan = e.selectExpr("cosine_sim(vec, vec) AS c").filter($"c" > 0.5)
      .queryExecution.executedPlan.toString
    // the *(n) prefix marks operators fused into WholeStageCodegen stage n
    assert(plan.contains("*(1) Project [cosine_sim"), plan)
  }
}
