package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** Bounded top-k aggregate (operator T2 at scale): keeps the k best
  * (score desc, id asc) pairs in a fixed-size buffer with partial
  * aggregation — each map task ships AT MOST k rows per group instead of
  * every scored row, which is what makes exact kNN viable at 100 TB
  * (the window `row_number() <= k` formulation shuffles the full scored
  * cross product). Returns array<struct<id, score>> best-first;
  * `posexplode` downstream yields (rank-1, struct).
  *
  * Ties break by id asc — identical to the window path, so both
  * formulations are hash-compatible with the same DuckDB oracle.
  */
case class TopKAgg(
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

  /** true when a beats b under (score desc, id asc) */
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: ArrayBuffer[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size < k) {
      buf += e
    } else {
      // replace the current worst if e beats it
      var worst = 0
      var i = 1
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

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {
  /** Column form: top_k(score, id, k) → array<struct<id, score>>. */
  def top_k(score: Column, id: Column, k: Int): Column =
    GraftExprBridge.column(
      TopKAgg(GraftExprBridge.expression(score),
        GraftExprBridge.expression(id), k).toAggregateExpression())

  /** The per-query ranking tail every retrieval operator shares —
    * `scored` grouped by `query_id`, bounded top-k on `(score, id)`,
    * exploded to `(query_id, rank, <idName>, <scoreName>)`. ONE
    * definition of the ranking/tie-break semantics (score desc, id
    * asc) for the dense, adaptive, BM25, jaccard, and RRF paths — a
    * change to rounding or tie order happens here or nowhere.
    */
  def rankedTail(scored: org.apache.spark.sql.DataFrame, score: Column,
      id: Column, k: Int, idName: String,
      scoreName: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, posexplode}
    scored.groupBy("query_id")
      .agg(top_k(score, id, k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as(idName), col("hit.score").as(scoreName))
  }
}
