package graft

import graft.operators.{DtwAggregator, DtwMapping}
import graft.core.{MappingConfig, PeriodUnit}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-callable dtw(...) aggregate must agree with the typed
  * mapGroups path exactly. */
class DtwAggregatorSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("SQL dtw(...) equals DtwMapping.summarize") {
    val merged = Seq(
      ("K1", "2024-01-01", 1.0, 2.0),
      ("K1", "2024-02-01", 5.0, 4.0),
      ("K1", "2024-03-01", 2.0, 1.0),
      ("K1", "2024-04-01", 8.0, 7.0),
      ("K2", "2024-01-01", 3.0, 3.0),
      ("K2", "2024-02-01", 3.5, 3.1)
    ).toDF("key", "p", "v1", "v2")
      .select($"key", to_date($"p").as("period"), $"v1", $"v2")

    DtwAggregator.register(spark)
    merged.createOrReplaceTempView("merged_agg_test")
    val viaSql = spark
      .sql("""SELECT key, dtw(CAST(period AS STRING), v1, v2) AS d
              FROM merged_agg_test GROUP BY key""")
      .select($"key", $"d.total_cost", $"d.num_mappings")
      .as[(String, Double, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    val viaTyped = DtwMapping
      .summarize(merged, MappingConfig(periodUnit = PeriodUnit.Month))
      .collect().map(s => s.key -> ((s.total_cost, s.num_mappings))).toMap

    assert(viaSql.keySet == viaTyped.keySet)
    viaSql.foreach { case (k, (c, n)) =>
      assert(math.abs(c - viaTyped(k)._1) < 1e-9, s"key $k cost")
      assert(n == viaTyped(k)._2, s"key $k mappings")
    }
  }

  test("cost-percentile filter keeps the cheap alignments") {
    val merged = (1 to 10).flatMap { k =>
      (1 to 6).map(m => (s"K$k", f"2024-$m%02d-01", m.toDouble, m.toDouble + (if (k > 8) 50.0 * m else 0.0)))
    }.toDF("key", "p", "v1", "v2")
      .select($"key", to_date($"p").as("period"), $"v1", $"v2")
    val summaries = DtwMapping
      .summarize(merged, MappingConfig(periodUnit = PeriodUnit.Month, dtwNormalize = false))
      .toDF()
    val kept = DtwMapping.filterByCostPercentile(summaries, 0.8)
      .select($"key").as[String].collect().toSet
    assert(kept.size >= 8 && !kept.contains("K10") || kept.size >= 8 && !kept.contains("K9") || kept.size == 8)
    assert((1 to 8).forall(k => kept.contains(s"K$k")))
  }
}
