package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made `Column` a thin wrapper over a `ColumnNode` and scoped
  * the converters (`classic.ExpressionUtils`) `private[sql]`; a package
  * bridge is the standard public-knowledge technique for libraries that
  * ship their own expressions (the same device frameless/itachi-style
  * extension libraries use). Kept to the two minimal forwarders. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
