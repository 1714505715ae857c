package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: probe a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] with a long key —
  * `bloom_might_contain(bloom_bytes, key)`.
  *
  * The filter bytes must be a FOLDABLE binary expression (a literal): the
  * sketch is deserialized ONCE per expression instance (transient lazy),
  * shipped to executors inside the serialized plan, and probed per row as
  * a plain method call inside whole-stage codegen — no UDF, no
  * per-row deserialization, no broadcast-variable plumbing in the query
  * text.
  *
  * This is the probe half of the incremental-dedup index
  * ([[graft.functions.IncrementalDedup]]): the build half is the public
  * `DataFrameStatFunctions.bloomFilter` (raw `putLong` semantics, which
  * this probe matches with `mightContainLong` — do NOT mix with Spark's
  * internal `BloomFilterAggregate`, which pre-hashes keys with xxhash64).
  *
  * A bloom filter can return false POSITIVES but never false negatives,
  * so `false` proves the key is not in the indexed set — callers prune on
  * `false` and verify the (rare) `true`s with an exact join.
  */
case class BloomMightContain(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary bloom-filter argument, got ${left.dataType.catalogString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a FOLDABLE (literal) bloom-filter argument — the sketch is " +
          "deserialized once per plan, not per row")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: bloom-filter bytes must not be null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Public so generated code can call it through the plan reference. */
  def mightContainLong(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def nullSafeEval(bloomBytes: Any, v: Any): Any =
    mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object BloomMightContain {

  /** Register `bloom_might_contain(bloom, key)`; idempotent like
    * [[CosineSimilarity.register]]. Call through
    * `functions.call_function` so the binary literal rides as a Column. */
  def register(spark: SparkSession): Unit = {
    val ident = FunctionIdentifier("bloom_might_contain")
    if (!spark.sessionState.functionRegistry.functionExists(ident)) {
      spark.sessionState.functionRegistry.registerFunction(
        ident,
        new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "bloom_might_contain takes exactly 2 arguments")
          BloomMightContain(children.head, children(1))
        })
    }
  }
}
