package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed element-wise vector mean (SURVEY.md §2.5 A8, §2.10 UDAF):
  * `Aggregator[Array[Float], (sums, count), Array[Double]]` registered
  * through `functions.udaf` — the centroid building block. Partial
  * aggregation (map-side combine) comes for free from the Aggregator
  * contract: `reduce` runs per partition, `merge` across partitions.
  */
object VectorMeanAgg extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), a: Array[Float]): (Array[Double], Long) = {
    if (a == null) b
    else {
      val sums = if (b._1.isEmpty) new Array[Double](a.length) else b._1
      var i = 0
      val n = math.min(sums.length, a.length)
      while (i < n) { sums(i) += a(i); i += 1 }
      (sums, b._2 + 1)
    }
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._1.isEmpty) y
    else if (y._1.isEmpty) x
    else {
      var i = 0
      val n = math.min(x._1.length, y._1.length)
      while (i < n) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
  }

  override def finish(b: (Array[Double], Long)): Array[Double] =
    if (b._2 == 0L) Array.emptyDoubleArray else b._1.map(_ / b._2)

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(ExpressionEncoder[Array[Double]](), Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()

  /** Column form: `vector_mean(embedding)`. */
  def asColumn(e: Column): Column = udaf(this).apply(e)
}
