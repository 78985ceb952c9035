package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 hash: the engine's deterministic-bucket primitive
  * `cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint)` computed
  * digest→long directly — no hex string allocation, no substring, no
  * base-16 parse. Bit-identical to the composable spelling (the first
  * 15 hex chars of an md5 ARE the top 60 bits of its first 8 bytes),
  * so DuckDB oracles keep the `('0x' || substr(md5(x), 1, 15))::BIGINT`
  * form and the cross-engine gate is unchanged. Codegen'd: one static
  * call per row inside whole-stage codegen, same shape as Spark's own
  * Murmur3Hash.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash60"

  override protected def nullSafeEval(s: Any): Any =
    Hash60.hash60(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  /** Build from SQL argument expressions, validating arity — mirrors
    * KmvSketch.fromExprs so graft_hash60(a, b) is an analysis error,
    * not a silent drop of the second argument.
    */
  def fromExprs(exprs: Seq[Expression]): Hash60 = {
    if (exprs.length != 1) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters =
          Map("message" -> "graft_hash60(text) takes exactly one argument"))
    }
    Hash60(exprs.head)
  }

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(bytes of s), = conv(substring(md5(s),1,15),16,10). */
  def hash60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
