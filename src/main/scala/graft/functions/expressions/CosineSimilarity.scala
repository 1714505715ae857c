package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two array<double>
  * columns in ONE pass — dot product and both norms accumulate in a
  * single loop with no intermediate arrays (the `zip_with` + `aggregate`
  * composition allocates a product array per row pair).
  *
  * Implements `doGenCode` so it stays inside whole-stage codegen
  * (SURVEY.md §2 preference ladder: custom Expression before custom
  * plans; no planner changes needed). Register with
  * [[CosineSimilarity.register]] and call as `cosine_sim(a, b)` from SQL
  * or `expr(...)`.
  *
  * Returns null if either input is null OR the lengths differ (matching
  * the portable zip_with/aggregate form, where the null padding of the
  * shorter array nulls the fold — dimension mismatches are data bugs and
  * must surface, not truncate); NaN when either vector has zero norm.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) {
      null
    } else {
      val n = x.numElements()
      var dot = 0.0
      var nx = 0.0
      var ny = 0.0
      var i = 0
      while (i < n) {
        val xv = x.getDouble(i)
        val yv = y.getDouble(i)
        dot += xv * yv
        nx += xv * xv
        ny += yv * yv
        i += 1
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = $x.getDouble($i);
         |    double $yv = $y.getDouble($i);
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** Register `cosine_sim(a, b)` in the session's function registry.
    * Idempotent: a second call is a no-op (re-registering is harmless but
    * warns "replaced a previously registered function" on every query,
    * flooding bench logs). */
  def register(spark: SparkSession): Unit = {
    val ident = FunctionIdentifier("cosine_sim")
    if (!spark.sessionState.functionRegistry.functionExists(ident)) {
      spark.sessionState.functionRegistry.registerFunction(
        ident,
        new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "cosine_sim takes exactly 2 arguments")
          CosineSimilarity(children.head, children(1))
        })
    }
  }
}
