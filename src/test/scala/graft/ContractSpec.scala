package graft

import graft.queries.{MappingQueries, RelationalQueries, TextQueries}
import org.scalatest.funsuite.AnyFunSuite

/** The driver contract's internal consistency — pure map checks, no
  * Spark session. A typo'd oracle key would silently never be compared
  * (the driver only runs oracle SQL for names it finds in the dump);
  * a query missing its oracle silently degrades to the weaker
  * rows-only check; and `++` across the three registries would
  * silently SHADOW a name registered twice. */
class ContractSpec extends AnyFunSuite {

  private val registries = Seq(
    "MappingQueries" -> MappingQueries.queries.keySet,
    "RelationalQueries" -> RelationalQueries.queries.keySet,
    "TextQueries" -> TextQueries.queries.keySet)

  test("query names are unique across registries (no silent shadowing)") {
    for {
      (an, as) <- registries
      (bn, bs) <- registries if an < bn
    } assert((as & bs).isEmpty, s"$an and $bn both register: ${(as & bs).mkString(", ")}")
  }

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL for unregistered queries: ${orphans.mkString(", ")}")
  }

  test("the rows-only set is exactly the documented one") {
    // d36 alone: softmax training needs exp/log, which IEEE leaves
    // implementation-defined beyond ~0.5 ulp — no cross-engine
    // bit-contract exists (COVERAGE.md round 5). Growing this set is a
    // deliberate decision, not an accident of forgetting the oracle.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("d36_source_classifier"),
      s"unexpected rows-only queries: ${rowsOnly.mkString(", ")}")
  }

  test("every oracle is non-trivial SQL (SELECT present, no stray interpolation)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.toUpperCase.contains("SELECT"), s"$name oracle has no SELECT")
      assert(!sql.contains("null)"), s"$name oracle looks like a broken interpolation")
      assert(!sql.contains("$"), s"$name oracle contains an unexpanded interpolation: $$")
    }
  }
}
