package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Aggregation buffer for [[CappedDupOccAgg]]: the distinct-doc set
  * (the over-cap valve lives on ITS size, exactly as in
  * [[CappedSetBuf]]) plus the group's occurrence pairs in two parallel
  * long arrays. Once `overflow` is set everything is cleared and stays
  * empty — O(1) state for over-cap groups. */
final class CappedDupOccBuf(var cap: Int) {
  val docs = new java.util.HashSet[Long]()
  var ds: Array[Long] = new Array[Long](8)
  var ps: Array[Long] = new Array[Long](8)
  var n: Int = 0
  var overflow: Boolean = false

  def add(doc: Long, pos: Long): Unit =
    if (!overflow) {
      docs.add(doc)
      if (docs.size() > cap) {
        overflow = true; docs.clear()
        ds = Array.emptyLongArray; ps = Array.emptyLongArray; n = 0
      } else {
        if (n == ds.length) {
          ds = java.util.Arrays.copyOf(ds, n * 2)
          ps = java.util.Arrays.copyOf(ps, n * 2)
        }
        ds(n) = doc; ps(n) = pos; n += 1
      }
    }
}

/** `capped_dup_occurrences(docCol, posCol, cap)` — for one group (a
  * shingle key), collect every `(doc_id, pos)` occurrence of documents
  * OTHER than the group's keeper (min doc_id), or NULL when the group
  * is not a duplicate (fewer than 2 distinct docs) or tripped the
  * `cap` distinct-doc valve.
  *
  * This fuses q73's two consumers of the positional-shingle frame —
  * the duplicated-shingle directory (distinct docs, keeper = min) and
  * the removal-position join (occurrences of non-keeper docs) — into
  * ONE aggregate on the single `sg` exchange (guide §2.4: two
  * operations keyed the same way share one exchange). The valve
  * contract is [[CappedSortedSetAgg]]'s: the distinct-doc set never
  * exceeds `cap + 1` entries and an over-cap group collapses to a
  * flag; the occurrence arrays hold exactly the pairs the legacy
  * `ps JOIN directory` shuffled for the same group, just buffered at
  * the aggregate instead of re-shuffled. NULL output ≡ the legacy
  * `size(docs) >= 2` / valve filters (callers filter `isNotNull`). */
case class CappedDupOccAgg(
    left: Expression,
    right: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedDupOccBuf]
    with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "capped_dup_occurrences requires BIGINT children, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def createAggregationBuffer(): CappedDupOccBuf =
    new CappedDupOccBuf(cap)

  override def update(buf: CappedDupOccBuf, input: InternalRow): CappedDupOccBuf = {
    val d = left.eval(input)
    val p = right.eval(input)
    if (d != null && p != null)
      buf.add(d.asInstanceOf[Long], p.asInstanceOf[Long])
    buf
  }

  // b's doc set is fully reconstructable from its pairs (add() is the
  // only writer of both), so replaying the pairs merges the set and
  // the occurrences in one pass and re-applies the valve mid-union
  override def merge(a: CappedDupOccBuf, b: CappedDupOccBuf): CappedDupOccBuf = {
    if (b.overflow) {
      a.overflow = true; a.docs.clear()
      a.ds = Array.emptyLongArray; a.ps = Array.emptyLongArray; a.n = 0
    } else {
      var i = 0
      while (i < b.n && !a.overflow) { a.add(b.ds(i), b.ps(i)); i += 1 }
    }
    a
  }

  override def eval(buf: CappedDupOccBuf): Any =
    if (buf.overflow || buf.docs.size() < 2) null
    else {
      var keeper = Long.MaxValue
      val it = buf.docs.iterator()
      while (it.hasNext) { val d = it.next(); if (d < keeper) keeper = d }
      val out = new scala.collection.mutable.ArrayBuffer[Any](buf.n)
      var i = 0
      while (i < buf.n) {
        if (buf.ds(i) != keeper)
          out += new GenericInternalRow(Array[Any](buf.ds(i), buf.ps(i)))
        i += 1
      }
      new GenericArrayData(out.toArray)
    }

  override def serialize(buf: CappedDupOccBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + buf.n * 16)
    bb.put(if (buf.overflow) 1.toByte else 0.toByte)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ds(i)); bb.putLong(buf.ps(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedDupOccBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new CappedDupOccBuf(cap)
    buf.overflow = bb.get() == 1.toByte
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("p", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "capped_dup_occurrences"
  override def withNewMutableAggBufferOffset(o: Int): CappedDupOccAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedDupOccAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CappedDupOccAgg =
    copy(left = l, right = r)
}
