package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{CosineSimilarity, Md5PrefixLong}

/** Spark-native integration point: inject the engine's custom Catalyst
  * expressions through `SparkSessionExtensions`, so a cluster enables
  * them for EVERY session with
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (spark-defaults.conf or `SparkSession.builder.withExtensions`) and
  * plain SQL users get `cosine_sim(a, b)` and `md5_prefix_long(s, n)`
  * with no Scala imports — the SURVEY §2 ladder's registration rung for
  * custom expressions. The per-DataFrame lazy registration
  * (e.g. [[graft.functions.expressions.CosineSimilarity.register]])
  * stays as the no-config fallback; both paths build the identical
  * expression tree. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("md5_prefix_long"),
      new ExpressionInfo(classOf[Md5PrefixLong].getName, "md5_prefix_long"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "md5_prefix_long takes (string, nibbles)")
        val nibbles = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
          case other =>
            throw new IllegalArgumentException(
              s"md5_prefix_long nibbles must be an integer literal, got $other")
        }
        Md5PrefixLong(children.head, nibbles)
      }))
  }
}
