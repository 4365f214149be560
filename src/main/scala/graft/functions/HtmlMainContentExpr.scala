package graft.functions

import graft.html.HtmlStrip

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Boilerplate stripping as a native Catalyst expression: the kept
  * main-content blocks of an HTML fragment (north_rule's "HTML
  * boilerplate strip ... density-based heuristics" stage, exposed as a
  * user-facing scalar function rather than only inside the extraction
  * pipeline's `html`-span dispatch).
  *
  * `html_main_content(html) -> array<string>` — one element per text
  * block that survives graft.html.HtmlStrip's densometric filter
  * (>= 1 word, link density <= 1/3; Boilerpipe-style, Kohlschütter et
  * al. WSDM 2010). Record-local, total (malformed markup degrades to
  * text), and codegen'd via a static call so it stays inside
  * whole-stage codegen like the other graft expressions.
  */
case class HtmlMainContentExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "html_main_content"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"html_main_content expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HtmlMainContentExpr.evalStatic(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlMainContentExpr.evalStatic($c);")

  override protected def withNewChildInternal(newChild: Expression): HtmlMainContentExpr =
    copy(child = newChild)
}

object HtmlMainContentExpr {

  def evalStatic(html: UTF8String): ArrayData = {
    val blocks = HtmlStrip.mainContentBlocks(html.toString)
    new GenericArrayData(blocks.map(b => UTF8String.fromString(b): Any).toArray)
  }
}
