package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** Mergeable KMV (k-minimum-values) distinct sketch (Bar-Yossef et al.
  * 2002; Beyer et al. SIGMOD 2007 "On Synopses for Distinct-Value
  * Estimation"; the Apache DataSketches theta-sketch family — all
  * public): keep the `k` smallest DISTINCT hash values of the input
  * stream. The result is a pure function of the input SET — update
  * order, partitioning, and merge order cannot change it (the k
  * smallest of a set is the k smallest of any cover of it), so the
  * sketch itself is deterministic and oracle-replayable: DuckDB's
  * `SELECT DISTINCT h ... ORDER BY h LIMIT k` reproduces it verbatim.
  *
  * The input is the hash ITSELF (a long, typically the engine-portable
  * md5-52-bit value — see `operators.Sketches.hash52`), not the raw
  * item: keeping the hashing upstream in the plan is what lets the
  * DuckDB oracle replay it digit for digit, and what makes two
  * sketches built by different queries combinable (same seed → same
  * hash space).
  *
  * Scale shape: this is the bounded-state alternative to
  * `count(DISTINCT item)`'s corpus-wide distinct exchange — each map
  * task ships ≤ k longs per group, the reduce merges tiny sorted
  * arrays, and downstream set algebra (union / Jaccard / intersection,
  * `operators.Sketches`) runs on k-row frames.
  *
  * Returns array<long> — the ≤ k smallest distinct hashes, ascending.
  */
case class KmvAgg(
    hashExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  require(k >= 2, s"k must be >= 2 (the estimator needs k-1 > 0): $k")

  override def children: Seq[Expression] = Seq(hashExpr)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    // cheap reject before the insert: full buffer and h >= current max
    if (buf.size() < k) { buf.add(java.lang.Long.valueOf(h)); return }
    if (h >= buf.last().longValue()) return
    if (buf.add(java.lang.Long.valueOf(h))) buf.pollLast()
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = hashExpr.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next().longValue())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size())
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(java.lang.Long.valueOf(bb.getLong)); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hashExpr = newChildren(0))
}

object KmvAgg {
  /** Column form: kmv(hash, k) → array<long> (≤ k smallest distinct
    * hash values, ascending).
    */
  def kmv(hash: Column, k: Int): Column =
    GraftExprBridge.column(
      KmvAgg(GraftExprBridge.expression(hash), k).toAggregateExpression())
}
