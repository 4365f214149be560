package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** THE portable 60-bit hash (PortableHash.md5Hash60) as a native
  * Catalyst expression: value of the first 15 hex chars of md5(input)
  * = the big-endian long of md5 bytes 0..7 shifted right 4 — exactly
  * `conv(substr(md5(x), 1, 15), 16, 10)` and exactly what the DuckDB
  * oracles replay as `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
  *
  * Why an Expression: the SQL formulation materializes a 32-char hex
  * UTF8String per row and re-parses 15 of its chars through conv()'s
  * radix loop — pure allocation/parse overhead around the digest. This
  * goes digest -> long directly inside whole-stage codegen, and the
  * hash underlies every shingle in the dedup/winnow/substring family
  * (millions of evaluations per query at bench scale, billions at
  * corpus scale). GraftFunctionsSpec pins bit-equality against the SQL
  * form on random strings.
  */
case class Md5Hash60Expr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "md5hash60"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5hash60 expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Md5Hash60Expr.evalStatic(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Hash60Expr.evalStatic($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60Expr =
    copy(child = newChild)
}

object Md5Hash60Expr {
  def evalStatic(text: UTF8String): Long = {
    val bytes = text.getBytes
    Simhash60Expr.tokenHash(bytes, 0, bytes.length)
  }
}
