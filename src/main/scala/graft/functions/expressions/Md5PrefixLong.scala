package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the first `nibbles` hex digits of
  * md5(input) as a long — bit-identical to the portable composition
  * `conv(substring(md5(c), 1, nibbles), 16, 10).cast("long")` that every
  * dedup/sampling operator keys on, but fused: digest → long directly.
  *
  * The composed form pays four string stages per row (hex-encode the
  * 16-byte digest, substring it, `conv` parses base-16 INTO A DECIMAL
  * STRING, the cast parses that); this expression extracts the leading
  * nibbles from the digest bytes with shifts. Same `doGenCode`
  * whole-stage-codegen placement as [[CosineSimilarity]] — the SURVEY
  * §2 ladder's "custom Expression before custom plans" rung.
  *
  * The VALUE contract is load-bearing: the DuckDB oracles recompute
  * these hashes from the same md5 prefix, so the fused form must equal
  * the composed form bit-for-bit (locked per-nibble-width in
  * Md5PrefixLongSpec, and corpus-wide by every hash-keyed oracle). */
case class Md5PrefixLong(child: Expression, nibbles: Int) extends UnaryExpression {
  require(nibbles >= 1 && nibbles <= 15, s"nibbles must be in [1,15], got $nibbles")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_long"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Md5PrefixLong.hash(input.asInstanceOf[UTF8String], nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.expressions.Md5PrefixLong" + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$helper.hash($c, $nibbles)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5PrefixLong {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First `nibbles` hex digits of md5 as a non-negative long (called
    * from both interpreted eval and generated code). */
  def hash(s: UTF8String, nibbles: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < nibbles) {
      v = (v << 4) | ((d(i >> 1) >>> (4 * (1 - (i & 1)))) & 0xF)
      i += 1
    }
    v
  }

  /** Column form, composing with any string expression. */
  def col(c: Column, nibbles: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      Md5PrefixLong(org.apache.spark.sql.graft.bridge.expression(c), nibbles))
}
