package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: probe a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] with a long key —
  * `bloom_might_contain(bloom_bytes, key)`.
  *
  * The sketch bytes are a PLAIN FIELD of the expression, not a Literal
  * child: a multi-MB binary literal in the tree makes every optimizer
  * pass that compares or canonicalizes expressions walk the whole array
  * (the same trap NOTES.md records for `typedLit` codebooks — a
  * ~8 MB bloom literal turned a 9 s dedup into 450 s, measured). As a
  * field, case-class equality compares the array by REFERENCE, the
  * sketch ships once per stage inside the task binary, and
  * deserialization happens once per task (transient lazy). The registry
  * builder extracts the bytes from a foldable binary first argument at
  * analysis time, so callers still write
  * `call_function("bloom_might_contain", lit(bytes), col)`.
  *
  * Probe semantics match the build half (public
  * `DataFrameStatFunctions.bloomFilter`, raw `putLong`): do NOT mix with
  * Spark's internal `BloomFilterAggregate`, which pre-hashes keys with
  * xxhash64.
  *
  * A bloom filter can return false POSITIVES but never false negatives,
  * so `false` proves the key is not in the indexed set — callers prune on
  * `false` and verify the (rare) `true`s with an exact join.
  */
case class BloomMightContain(bloomBytes: Array[Byte], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  // keep the byte blob out of treeString/explain output
  override def flatArguments: Iterator[Any] = Iterator(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (bloomBytes == null || bloomBytes.isEmpty)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: bloom-filter bytes must be non-empty")
    else if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Public so generated code can call it through the plan reference. */
  def mightContainLong(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def nullSafeEval(v: Any): Any =
    mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, v => s"$ref.mightContainLong($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {

  /** Register `bloom_might_contain(bloom, key)`; idempotent like
    * [[CosineSimilarity.register]]. The first argument must be a
    * foldable binary expression (e.g. `lit(bytes)`); it is evaluated
    * ONCE here, at analysis time, and never enters the resolved plan.
    * Call through `functions.call_function` so the bytes ride as a
    * Column. */
  def register(spark: SparkSession): Unit = {
    val ident = FunctionIdentifier("bloom_might_contain")
    if (!spark.sessionState.functionRegistry.functionExists(ident)) {
      spark.sessionState.functionRegistry.registerFunction(
        ident,
        new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "bloom_might_contain takes exactly 2 arguments")
          val bloomExpr = children.head
          require(
            bloomExpr.foldable && bloomExpr.dataType == BinaryType,
            "bloom_might_contain: first argument must be a foldable binary (the serialized sketch)")
          BloomMightContain(
            bloomExpr.eval().asInstanceOf[Array[Byte]], children(1))
        })
    }
  }
}
