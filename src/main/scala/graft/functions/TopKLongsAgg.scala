package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Exact top-k largest values per group as a native Catalyst aggregate
  * (`TypedImperativeAggregate`) — the aggregate-function extension tier
  * the scalar expressions (`Simhash60Expr`, `BpeCountExpr`, ...) don't
  * exercise. Returns the k largest child values (duplicates kept),
  * sorted descending, as `array<bigint>`.
  *
  * Why a native aggregate and not `slice(sort_array(collect_list(x)))`:
  * collect_list materializes the WHOLE group before truncating — O(n)
  * state per group, a driver-of-OOM on skewed groups at corpus scale.
  * This buffer is a bounded k-slot min-heap: O(k) state regardless of
  * group size, and the same heap merges map-side partials, so the
  * shuffle carries at most k longs per group per map partition.
  *
  * Determinism: the RESULT (multiset of the k largest values, emitted
  * in descending value order) is invariant to row arrival and partial
  * merge order — ties are resolved by value only, so any k-subset
  * boundary tie keeps an identical value multiset. That is what lets a
  * sequential-engine oracle (window row_number <= k on value DESC)
  * replay a distributed heap bit-for-bit.
  *
  * k rides as a foldable int literal so the function-registry builder
  * stays stateless (same convention as BpeCountExpr's packed codec).
  */
case class TopKLongsAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKLongsAgg.Buffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def prettyName: String = "topk_longs"

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_longs expects bigint values, got ${child.dataType.catalogString}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("topk_longs k must be a foldable int")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("topk_longs k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKLongsAgg.Buffer =
    new TopKLongsAgg.Buffer(k)

  override def update(b: TopKLongsAgg.Buffer, input: InternalRow): TopKLongsAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKLongsAgg.Buffer, other: TopKLongsAgg.Buffer): TopKLongsAgg.Buffer = {
    var i = 0
    while (i < other.n) { b.insert(other.heap(i)); i += 1 }
    b
  }

  override def eval(b: TopKLongsAgg.Buffer): Any = {
    val out = java.util.Arrays.copyOf(b.heap, b.n)
    java.util.Arrays.sort(out)
    // ascending -> descending in place
    var i = 0
    var j = out.length - 1
    while (i < j) { val t = out(i); out(i) = out(j); out(j) = t; i += 1; j -= 1 }
    new GenericArrayData(out)
  }

  /** n then the raw heap slots — heap order is a valid internal state,
    * so deserialize is a straight copy with no re-heapify.
    */
  override def serialize(b: TopKLongsAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.heap(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKLongsAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new TopKLongsAgg.Buffer(k)
    b.n = bb.getInt()
    var i = 0
    while (i < b.n) { b.heap(i) = bb.getLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKLongsAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object TopKLongsAgg {

  /** Bounded min-heap over the kept values: heap(0) is the smallest
    * kept value, i.e. the admission threshold once full.
    */
  final class Buffer(val k: Int) {
    val heap = new Array[Long](k)
    var n = 0

    def insert(v: Long): Unit =
      if (n < k) {
        heap(n) = v
        n += 1
        var i = n - 1
        while (i > 0 && heap((i - 1) / 2) > heap(i)) {
          val p = (i - 1) / 2
          val t = heap(p); heap(p) = heap(i); heap(i) = t
          i = p
        }
      } else if (v > heap(0)) {
        heap(0) = v
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = 2 * i + 2
          var m = i
          if (l < n && heap(l) < heap(m)) m = l
          if (r < n && heap(r) < heap(m)) m = r
          if (m == i) done = true
          else {
            val t = heap(m); heap(m) = heap(i); heap(i) = t
            i = m
          }
        }
      }
  }
}
