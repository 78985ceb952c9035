package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization — the canonicalization pass a
  * training-data pipeline runs BEFORE any content hashing: the same
  * visible text can arrive precomposed (é = U+00E9) or decomposed
  * (e + U+0301) depending on the source, and every exact/MinHash/line
  * dedup keyed on md5(text) silently treats them as distinct documents
  * unless the corpus is normalized first. Spark has no built-in
  * normalize; this is the brief's preference order (b) — a codegen'd
  * `Expression` (one static call per row inside whole-stage codegen)
  * rather than a UDF with serialization overhead.
  *
  * Cross-engine contract: Unicode NFC is fully specified, so Java's
  * `java.text.Normalizer` (ICU tables) and DuckDB's `nfc_normalize`
  * (utf8proc) agree byte-for-byte on any valid input — which is what
  * lets the `text_normalize` gate hash-pin this expression against a
  * DuckDB oracle. Already-normalized input (all ASCII, most corpus
  * text) returns the INPUT UTF8String unchanged — no allocation on
  * the fast path.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Build from SQL argument expressions, validating arity — mirrors
    * KmvSketch.fromExprs so graft_nfc(a, b) is an analysis error, not
    * a silent drop of the second argument.
    */
  def fromExprs(exprs: Seq[Expression]): NfcNormalize = {
    if (exprs.length != 1) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters =
          Map("message" -> "graft_nfc(text) takes exactly one argument"))
    }
    NfcNormalize(exprs.head)
  }

  /** NFC-normalize; returns the input object untouched when already
    * normalized.
    *
    * Fast path: a byte-level scan of the raw UTF8String. ASCII bytes
    * are non-negative in Java's signed byte, and any pure-ASCII string
    * is NFC by construction (no combining marks, no composition
    * targets below U+0080), so the corpus majority returns the input
    * object after one branch-predictable loop over bytes already in
    * cache — no String materialization, no heap allocation. Only rows
    * containing a non-ASCII byte pay the toString + isNormalized
    * quick-check (which runs the NFC state machine without building
    * the output) and, if actually denormalized, the full normalize.
    */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val base = s.getBaseObject
    var off = s.getBaseOffset
    val end = off + n
    var ascii = true
    while (ascii && off < end) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off) < 0) ascii = false
      off += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
