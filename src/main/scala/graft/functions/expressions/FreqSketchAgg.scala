package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.nio.ByteBuffer

/** Mergeable Misra–Gries frequency summary (the heavy-hitters sketch of
  * Misra & Gries 1982, merge rule per Agarwal et al. 2013 "Mergeable
  * Summaries" — both public): a bounded map of item → lower-bound count
  * plus one `delta`, the total decrement mass applied. Invariants the
  * consumer relies on, preserved by update AND merge:
  *
  *   - for every item x (in the map or not): est(x) ≤ true(x) ≤ est(x)
  *     + delta, with est(x) = 0 for absent items — so any item with
  *     true count > delta is guaranteed present;
  *   - the map never exceeds 2·capacity entries (the working headroom
  *     that makes the purge amortized O(1) per update: each purge
  *     subtracts the (size − capacity)-th smallest count from every
  *     entry, dropping at least size − capacity of them).
  *
  * This is the scale-critical half of exact heavy hitters at 100 TB:
  * each map task ships ≤ 2·capacity (item, count) pairs — the sketch —
  * instead of shuffling every n-gram occurrence of the corpus; the
  * guaranteed-superset candidate list then prices an EXACT second pass
  * at a broadcast semi-join (see `operators.Frequency`).
  *
  * Returns struct(items: array<struct<item, est>>, delta) — est-desc,
  * item-asc ordered for determinism of the ARRAY; note the candidate
  * SET itself is merge-order-dependent beyond the guaranteed members
  * (extra survivors vary), which is why the consumer must exact-count
  * and certify, never serve estimates.
  */
case class FreqSketchAgg(
    itemExpr: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketchAgg.Buf] {
  require(capacity >= 1, s"capacity must be positive: $capacity")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
      containsNull = false), nullable = false),
    StructField("delta", LongType, nullable = false)))

  override def createAggregationBuffer(): FreqSketchAgg.Buf =
    new FreqSketchAgg.Buf(new java.util.HashMap[UTF8String, java.lang.Long](), 0L)

  /** Reduce to ≤ capacity entries: subtract the (size − capacity)-th
    * smallest count from all, drop non-positives. Subtracting v_m (m =
    * size − capacity) zeroes at least the m entries with count ≤ v_m.
    */
  private def purge(buf: FreqSketchAgg.Buf): Unit = {
    val size = buf.counts.size()
    if (size <= capacity) return
    val m = size - capacity
    val vals = new Array[Long](size)
    var i = 0
    val it0 = buf.counts.values().iterator()
    while (it0.hasNext) { vals(i) = it0.next().longValue(); i += 1 }
    java.util.Arrays.sort(vals)
    val v = vals(m - 1)
    buf.delta += v
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.longValue() - v
      if (c <= 0L) it.remove() else e.setValue(java.lang.Long.valueOf(c))
    }
  }

  override def update(buf: FreqSketchAgg.Buf, input: InternalRow): FreqSketchAgg.Buf = {
    val v = itemExpr.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      val prev = buf.counts.get(item)
      if (prev != null || buf.counts.size() < 2 * capacity) {
        // clone: the UTF8String may point into a reused row buffer
        val key = if (prev != null) item else item.clone()
        buf.counts.put(key,
          java.lang.Long.valueOf((if (prev == null) 0L
            else prev.longValue()) + 1L))
      } else {
        buf.counts.put(item.clone(), java.lang.Long.valueOf(1L))
        purge(buf)
      }
    }
    buf
  }

  override def merge(b1: FreqSketchAgg.Buf, b2: FreqSketchAgg.Buf): FreqSketchAgg.Buf = {
    b1.delta += b2.delta
    val it = b2.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = b1.counts.get(e.getKey)
      b1.counts.put(e.getKey, java.lang.Long.valueOf(
        (if (prev == null) 0L else prev.longValue())
          + e.getValue.longValue()))
    }
    purge(b1)
    b1
  }

  override def eval(buf: FreqSketchAgg.Buf): Any = {
    val entries = new Array[(UTF8String, Long)](buf.counts.size())
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue.longValue())
      i += 1
    }
    val sorted = entries.sortWith { (a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1.compareTo(b._1) < 0)
    }
    InternalRow(
      new GenericArrayData(sorted.map { case (s, c) =>
        InternalRow(s, c)
      }.toArray[Any]),
      buf.delta)
  }

  override def serialize(buf: FreqSketchAgg.Buf): Array[Byte] = {
    var bytes = 12 // delta + size
    val it0 = buf.counts.keySet().iterator()
    while (it0.hasNext) bytes += 12 + it0.next().numBytes()
    val bb = ByteBuffer.allocate(bytes)
    bb.putLong(buf.delta)
    bb.putInt(buf.counts.size())
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      bb.putInt(b.length); bb.put(b); bb.putLong(e.getValue.longValue())
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqSketchAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val delta = bb.getLong
    val n = bb.getInt
    val m = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      m.put(UTF8String.fromBytes(b), java.lang.Long.valueOf(bb.getLong))
      i += 1
    }
    new FreqSketchAgg.Buf(m, delta)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0))
}

object FreqSketchAgg {
  final class Buf(val counts: java.util.HashMap[UTF8String, java.lang.Long],
      var delta: Long)

  /** Column form: freq_sketch(item, capacity) →
    * struct(items: array<struct<item, est>>, delta).
    */
  def freq_sketch(item: Column, capacity: Int): Column =
    GraftExprBridge.column(
      FreqSketchAgg(GraftExprBridge.expression(item), capacity)
        .toAggregateExpression())
}
