package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Aggregation buffer for [[CappedSortedSetAgg]]: once `overflow` is
  * set the value set is cleared and stays empty — O(1) state for
  * over-cap groups. */
final class CappedSetBuf(val set: java.util.HashSet[Long], var overflow: Boolean)

/** `capped_sorted_set(longCol, cap)` — collect the DISTINCT values of a
  * group as an ascending-sorted array, or NULL once the group's
  * distinct count exceeds `cap`.
  *
  * The memory contract is the point: `collect_set` materializes a
  * group's whole value set in the aggregation buffer BEFORE any size
  * filter can discard it — on the LSH bucket-pair path that means a
  * boilerplate bucket with millions of members builds a multi-MB
  * unspillable buffer that the `size(ids) <= cap` valve then throws
  * away. This aggregate enforces the valve INSIDE the buffer: at most
  * `cap + 1` values are ever held, and an overflowed group collapses
  * to a flag — per-bucket state is O(cap) by construction, the
  * 100 TB-safe form of the skew valve. Overflowed groups evaluate to
  * NULL (callers filter `isNotNull`, exactly where they filtered the
  * size before). */
case class CappedSortedSetAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedSetBuf]
    with UnaryLike[Expression] {

  // fail at ANALYSIS on a non-long child (update() casts blindly —
  // without this an IntegerType input surfaced as a runtime
  // ClassCastException deep in the aggregation)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"capped_sorted_set requires a BIGINT child, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): CappedSetBuf =
    new CappedSetBuf(new java.util.HashSet[Long](), overflow = false)

  private def add(buf: CappedSetBuf, v: Long): Unit =
    if (!buf.overflow) {
      buf.set.add(v)
      if (buf.set.size() > cap) { buf.overflow = true; buf.set.clear() }
    }

  override def update(buf: CappedSetBuf, input: InternalRow): CappedSetBuf = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: CappedSetBuf, b: CappedSetBuf): CappedSetBuf = {
    if (b.overflow) { a.overflow = true; a.set.clear() }
    else if (!a.overflow) {
      val it = b.set.iterator()
      while (it.hasNext && !a.overflow) add(a, it.next())
    }
    a
  }

  override def eval(buf: CappedSetBuf): Any =
    if (buf.overflow) null
    else {
      val arr = new Array[Long](buf.set.size())
      val it = buf.set.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      java.util.Arrays.sort(arr)
      new GenericArrayData(arr)
    }

  override def serialize(buf: CappedSetBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + buf.set.size() * 8)
    bb.put(if (buf.overflow) 1.toByte else 0.toByte)
    bb.putInt(buf.set.size())
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedSetBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val overflow = bb.get() == 1.toByte
    val n = bb.getInt
    val set = new java.util.HashSet[Long](math.max(16, n * 2))
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    new CappedSetBuf(set, overflow)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "capped_sorted_set"
  override def withNewMutableAggBufferOffset(o: Int): CappedSortedSetAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedSortedSetAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CappedSortedSetAgg =
    copy(child = c)
}
