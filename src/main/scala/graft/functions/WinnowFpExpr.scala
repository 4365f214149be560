package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The whole winnowing selection (Schleimer/Wilkerson/Aiken, SIGMOD
  * 2003) as ONE native expression over the text: tokenize on single
  * spaces, hash every k-token shingle with the portable 60-bit md5
  * hash ([[Md5Hash60Expr]] — each shingle is a byte range of the
  * input, so no shingle string is ever built), slide a window of w
  * hashes and select each window's minimum (rightmost occurrence on
  * ties). Returns array<struct<pos:int, fp:bigint>>.
  *
  * Replaces the HOF formulation (transform over shinglesOfText for the
  * hashes, then a transform over window indices doing
  * slice/array_min/reverse/array_position per window) which Spark
  * evaluates interpreted (HOFs are CodegenFallback) and which
  * allocated two arrays per window.
  *
  * The emitted array is ADJACENT-DEDUPED, which equals the per-doc
  * `distinct()` of all window selections the old plan paid a shuffle
  * for: equal selections are always CONTIGUOUS runs of windows.
  * Proof: windows j < j' selecting the same position p require
  * p in [j', j+w), so every window i in (j, j') also contains p; the
  * minimum of window i is hashes(p) (window i's members lie in
  * window j ∪ window j', both of which have minimum hashes(p) and
  * contain p); and p is i's RIGHTMOST minimum (an occurrence right of
  * p in window i would lie in window j' too, contradicting p being
  * rightmost there). So window i selects p as well. Since the selected
  * fp is determined by the selected position, deduping on position
  * alone is exact. WinnowSpec pins set-equality against the HOF +
  * distinct formulation on adversarial (tie-heavy) corpora.
  *
  * Null/edge semantics mirror the HOF plan: null text or fewer than k
  * tokens -> empty array (explodes to no rows); fewer than w shingle
  * hashes -> one window over the whole hash sequence.
  */
case class WinnowFpExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {

  require(k >= 1 && w >= 1, s"k and w must be positive: k=$k w=$w")

  override def prettyName: String = "winnow_fp"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fp expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = WinnowFpExpr.OutType

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) WinnowFpExpr.Empty()
    else WinnowFpExpr.evalStatic(v.asInstanceOf[UTF8String], k, w)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${childGen.isNull}
            ? graft.functions.WinnowFpExpr.Empty()
            : graft.functions.WinnowFpExpr.evalStatic(${childGen.value}, $k, $w);
      """
    ev.copy(code = resultCode, isNull =
      org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFpExpr =
    copy(child = newChild)
}

object WinnowFpExpr {

  val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  private val EmptyArray = new GenericArrayData(Array.empty[Any])

  /** Java-callable accessor for generated code. */
  def Empty(): ArrayData = EmptyArray

  def evalStatic(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // token boundaries under split(' ', -1): empties kept (the
    // ShingleArrayExpr contract) — token i spans
    // [starts(i), starts(i+1) - 1)
    var spaces = 0
    var i = 0
    while (i < len) {
      if (bytes(i) == ' ') spaces += 1
      i += 1
    }
    val tokCount = spaces + 1
    val m = tokCount - k + 1
    if (m <= 0) return EmptyArray
    val starts = new Array[Int](tokCount + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(tokCount) = len + 1
    val hashes = new Array[Long](m)
    var s = 0
    while (s < m) {
      // shingle s = original bytes [starts(s), starts(s+k) - 1)
      hashes(s) = Simhash60Expr.tokenHash(bytes, starts(s), starts(s + k) - 1)
      s += 1
    }
    // windows j..j+w (clamped); one whole-sequence window when m < w
    val top = math.max(m - w, 0)
    val out = new Array[Any](top + 1)
    var cnt = 0
    var lastPos = -1
    var j = 0
    while (j <= top) {
      val end = math.min(j + w, m)
      var mn = hashes(j)
      var pos = j
      var p = j + 1
      while (p < end) {
        // <= keeps the RIGHTMOST occurrence of the minimum
        if (hashes(p) <= mn) { mn = hashes(p); pos = p }
        p += 1
      }
      if (pos != lastPos) {
        out(cnt) = new GenericInternalRow(Array[Any](pos, mn))
        cnt += 1
        lastPos = pos
      }
      j += 1
    }
    new GenericArrayData(
      if (cnt == out.length) out
      else {
        val trimmed = new Array[Any](cnt)
        System.arraycopy(out, 0, trimmed, 0, cnt)
        trimmed
      })
  }
}
