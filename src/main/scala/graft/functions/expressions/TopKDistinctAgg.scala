package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** [[TopKAgg]] with per-id dedup folded INTO the bounded buffer: an id
  * already held keeps its best score instead of occupying two slots.
  * Exists for inputs that legitimately repeat (id, score) pairs —
  * NN-Descent's per-round merge of the current graph with rescored
  * candidate edges — where TopKAgg would need a `groupBy(group, id)`
  * dedup SHUFFLE first; folding the dedup into the aggregate's linear
  * buffer scan (k is small) deletes that exchange per round. Same
  * output contract as TopKAgg: array<struct<id, score>> best-first,
  * ties (score desc, id asc).
  */
case class TopKDistinctAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: ArrayBuffer[(Double, Long)], e: (Double, Long)): Unit = {
    // id dedup first: keep the better of the held/new entry in place
    var i = 0
    while (i < buf.size) {
      if (buf(i)._2 == e._2) {
        if (beats(e, buf(i))) buf(i) = e
        return
      }
      i += 1
    }
    if (buf.size < k) {
      buf += e
    } else {
      var worst = 0
      i = 1
      while (i < buf.size) {
        if (beats(buf(worst), buf(i))) worst = i
        i += 1
      }
      if (beats(e, buf(worst))) buf(worst) = e
    }
  }

  override def update(
      buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      insert(buf, (s.asInstanceOf[Double], id.asInstanceOf[Long]))
    buf
  }

  override def merge(
      b1: ArrayBuffer[(Double, Long)],
      b2: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val sorted = buf.sortWith(beats)
    new GenericArrayData(sorted.map { case (s, id) =>
      InternalRow(id, s)
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, id) => bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { val s = bb.getDouble; val id = bb.getLong; buf += ((s, id)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKDistinctAgg {
  /** Column form: top_k_distinct(score, id, k) → array<struct<id, score>>. */
  def top_k_distinct(score: Column, id: Column, k: Int): Column =
    GraftExprBridge.column(
      TopKDistinctAgg(GraftExprBridge.expression(score),
        GraftExprBridge.expression(id), k).toAggregateExpression())
}
