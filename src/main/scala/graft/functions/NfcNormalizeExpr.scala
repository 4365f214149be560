package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * canonical-composition step of C4-style text cleanup (é as
  * e+COMBINING-ACUTE and é as U+00E9 must dedup/hash identically).
  * Spark ships no normalization function; a Scala UDF would break
  * whole-stage codegen around every text-cleaning pipeline stage, so
  * this is a codegen'd static call into `java.text.Normalizer`
  * (Unicode canonical composition is version-stable for the
  * Latin/CJK/combining ranges a web corpus hits; the DuckDB oracle's
  * `nfc_normalize` implements the same UAX #15 algorithm).
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * almost always true on web text (ASCII and already-composed UTF-8),
  * so the common row costs one scan, not a recompose.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "nfc_norm"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_norm expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.evalStatic(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalizeExpr.evalStatic($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {

  def evalStatic(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
