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
    // Growing this set is a deliberate decision (each member's reason
    // is documented in Gates), not an accident of forgetting an oracle.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Gates.rowsOnly,
      s"unexpected rows-only queries: ${rowsOnly.mkString(", ")}")
  }

  test("the scoreboard constants match the live registry (no drift)") {
    // COVERAGE.md quotes Gates; Gates must equal the code. Two rounds
    // of stale prose counts motivated this — see Gates' scaladoc.
    assert(SparkEntry.queries.size == Gates.registeredQueries,
      s"Gates.registeredQueries=${Gates.registeredQueries} but the registry holds ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size == Gates.oracleQueries,
      s"Gates.oracleQueries=${Gates.oracleQueries} but the oracle set holds ${SparkEntry.oracleSql.size}")
  }

  test("every verifier-tier name is a registered query") {
    // Bench partitions its totals by this set; a renamed query would
    // otherwise silently fall back into the deployment tier
    val unknown = Gates.verifierTier -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"verifier tier names unregistered queries: ${unknown.mkString(", ")}")
  }

  test("every oracle is non-trivial SQL (SELECT present, no stray interpolation)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.toUpperCase.contains("SELECT"), s"$name oracle has no SELECT")
      assert(!sql.contains("null)"), s"$name oracle looks like a broken interpolation")
      assert(!sql.contains("$"), s"$name oracle contains an unexpanded interpolation: $$")
    }
  }
}
