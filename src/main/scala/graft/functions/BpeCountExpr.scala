package graft.functions

import graft.textops.BpeCodec

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Corpus-trained BPE token count as a native Catalyst expression:
  * `bpe_count(text, merges)` where `merges` is the trained table as a
  * foldable array<string> literal ("left right" per rank, in order —
  * symbols never contain spaces because words are split on them).
  *
  * The literal child keeps the expression registry-compatible (builders
  * only see Expressions, so the model rides in-plan rather than in a
  * closure); it folds into a shared [[BpeCodec]] once at plan time, and
  * codegen emits a single reference-object call — the merge loop runs
  * as JVM loops inside whole-stage codegen, with a bounded Zipf cache
  * over repeated words. Same posture as [[Simhash60Expr]]: a lambda-HOF
  * formulation of an inner loop this hot would run interpreted.
  */
case class BpeCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "bpe_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "bpe_count merge table must be a literal (foldable) array")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_count expects (string, array<string>), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = LongType

  @transient private lazy val codec: BpeCodec = {
    val arr = right.eval().asInstanceOf[ArrayData]
    BpeCodec.fromPacked(
      arr.toObjectArray(StringType).map(_.asInstanceOf[UTF8String].toString))
  }

  override def nullSafeEval(text: Any, mergesIgnored: Any): Any =
    codec.countText(text.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bpeCodec", codec, classOf[BpeCodec].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $ref.countText($t.toString());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeCountExpr =
    copy(left = newLeft, right = newRight)
}
