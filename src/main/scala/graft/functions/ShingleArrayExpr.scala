package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** TextOps.shingleArray(tokens(text), n) as ONE native expression over
  * the text: the n-gram token shingles of split(text, ' ', -1), each
  * joined with single spaces — bit-identical to the HOF formulation
  * (slice/zip_with/concat_ws), which Spark evaluates interpreted
  * per element (HOFs are CodegenFallback) and which dominated the
  * dedup/winnow/substring family's task-CPU once the md5 hash went
  * native.
  *
  * The crucial identity making this allocation-free: tokens come from
  * splitting on SINGLE spaces, so consecutive tokens are separated by
  * exactly one space in the original bytes (runs of spaces become
  * empty tokens, each still consuming one separator). Joining tokens
  * i..i+n-1 with single spaces therefore reconstructs the original
  * byte range [start_i, end_{i+n-1}) verbatim — every shingle is a
  * SUBSTRING of the input, emitted as a UTF8String over the shared
  * byte array with no per-shingle string building.
  *
  * Null/edge semantics mirror the original exactly (OpsSpec pins
  * equality): null text -> EMPTY array (the HOF's let-binding mapped
  * null through when()'s otherwise branch), fewer than n tokens ->
  * empty array, empty tokens participate.
  */
case class ShingleArrayExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width must be positive: $n")

  override def prettyName: String = "shingle_array"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_array expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleArrayExpr.Empty()
    else ShingleArrayExpr.evalStatic(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val width = n.toString
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${childGen.isNull}
            ? graft.functions.ShingleArrayExpr.Empty()
            : graft.functions.ShingleArrayExpr.evalStatic(${childGen.value}, $width);
      """
    ev.copy(code = resultCode, isNull =
      org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleArrayExpr =
    copy(child = newChild)
}

object ShingleArrayExpr {

  private val EmptyArray = new GenericArrayData(Array.empty[Any])

  /** Java-callable accessor for generated code. */
  def Empty(): ArrayData = EmptyArray

  def evalStatic(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // token boundaries under split(' ', -1): empties kept, so the
    // token count is (#spaces + 1) and token i spans
    // [starts(i), starts(i+1) - 1)
    var spaces = 0
    var i = 0
    while (i < len) {
      if (bytes(i) == ' ') spaces += 1
      i += 1
    }
    val tokCount = spaces + 1
    val m = tokCount - n + 1
    if (m <= 0) return EmptyArray
    val starts = new Array[Int](tokCount + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(tokCount) = len + 1
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val from = starts(s)
      val until = starts(s + n) - 1 // end of token s+n-1
      out(s) = UTF8String.fromBytes(bytes, from, until - from)
      s += 1
    }
    new GenericArrayData(out)
  }
}
