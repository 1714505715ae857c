package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's t1 smoke: entry(spark) must return rows on sf0.001. */
class EntrySmokeSpec extends AnyFunSuite with SparkSessionTestWrapper {
  test("entry returns non-empty flagship mapping") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
