package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The whole k-component MinHash signature as ONE native expression
  * over the text: tokenize on single spaces, hash every n-token
  * shingle byte range with the portable 60-bit md5 hash mod P
  * ([[Md5Hash60Expr]] semantics), and fold the k affine hashes
  * h_i(x) = (a_i * x + b_i) mod P to their minima in a flat loop —
  * exactly Dedup.minhashSignatures' aggregate, which paid one
  * materialized row per (doc, distinct shingle) plus a 64-buffer
  * hash-aggregate probe per row. Duplicates need no array_distinct
  * pre-pass here: the min over a multiset equals the min over its
  * support set.
  *
  * No overflow: the base value is < P = 2^31 - 1 and every a_i < P,
  * so a_i * x + b_i < 2^62 — plain 64-bit arithmetic, bit-identical
  * to the SQL formulation the DuckDB oracles replay.
  *
  * Returns NULL for docs with no shingles (fewer than n tokens, or
  * null text): the aggregate formulation emitted no group for them,
  * so callers filter nulls to keep the signature frame identical.
  * OpsSpec pins row-set equality against the aggregate form.
  */
case class MinhashSigExpr(child: Expression, n: Int, k: Int) extends UnaryExpression {

  require(n >= 1 && k >= 1, s"n and k must be positive: n=$n k=$k")

  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MinhashSigExpr.evalStatic(v.asInstanceOf[UTF8String], n, k)
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
            ? null
            : graft.functions.MinhashSigExpr.evalStatic(${childGen.value}, $n, $k);
        boolean ${ev.isNull} = ${ev.value} == null;
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

object MinhashSigExpr {

  private val P = 2147483647L // == Dedup.MinhashP

  // a_i/b_i per seed (== Dedup.minhashA/minhashB), cached per k
  private val abCache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]
  private def ab(k: Int): (Array[Long], Array[Long]) =
    abCache.computeIfAbsent(k, { kk =>
      val as = new Array[Long](kk)
      val bs = new Array[Long](kk)
      var i = 0
      while (i < kk) {
        as(i) = (1664525L * i + 1013904223L) % P
        bs(i) = (22695477L * i + 1L) % P
        i += 1
      }
      (as, bs)
    })

  def evalStatic(text: UTF8String, n: Int, k: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // token boundaries under split(' ', -1): empties kept — the
    // ShingleArrayExpr contract; shingle s = bytes [starts(s),
    // starts(s+n) - 1)
    var spaces = 0
    var i = 0
    while (i < len) {
      if (bytes(i) == ' ') spaces += 1
      i += 1
    }
    val tokCount = spaces + 1
    val m = tokCount - n + 1
    if (m <= 0) return null
    val starts = new Array[Int](tokCount + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(tokCount) = len + 1
    val (as, bs) = ab(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var s = 0
    while (s < m) {
      val h = Simhash60Expr.tokenHash(bytes, starts(s), starts(s + n) - 1) % P
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
