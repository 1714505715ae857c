package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions injection path: a session built with
  * `withExtensions(new GraftExtensions)` answers plain-SQL calls to the
  * engine's custom expressions, matching the lazy-registration path. */
class GraftExtensionsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("extensions-built session resolves cosine_sim and md5_prefix_long from SQL") {
    // reuse the shared SparkContext but build a FRESH session so the
    // extensions actually apply (getOrCreate would return the default
    // session and skip them); restore the default afterwards so the
    // other suites keep their singleton
    val prior = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession
        .builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val rows = s
        .sql("""SELECT
                |  cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
                |  md5_prefix_long('abc', 15) AS h""".stripMargin)
        .collect()
      assert(rows(0).getDouble(0) === 1.0)
      // md5('abc') = 900150983cd24fb0..., first 15 hex digits as long
      val want = java.lang.Long.parseLong("900150983cd24fb".substring(0, 15), 16)
      assert(rows(0).getLong(1) === want)
      // parity with the lazy-registration Column path
      val viaColumn = {
        import s.implicits._
        Seq("abc").toDF("s")
          .select(graft.functions.expressions.Md5PrefixLong.col(
            org.apache.spark.sql.functions.col("s"), 15))
          .collect()(0).getLong(0)
      }
      assert(viaColumn === want)
    } finally {
      SparkSession.clearActiveSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
