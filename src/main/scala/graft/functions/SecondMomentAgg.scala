package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Uncentered second-moment matrix S = E[x xᵀ] of a vector column,
  * flattened row-major (d² doubles) — the one-pass input to the PCA /
  * OPQ-style rotation ([[graft.operators.SimilaritySearch
  * .rotationModel]]): S's eigenbasis is the energy-compacting
  * orthogonal transform, and because S is UNCENTERED the resulting
  * rotation is a pure isometry (dot products and cosines preserved
  * exactly — no mean shift), so rotated search output is identical to
  * plain search BY ALGEBRA, not by margin.
  *
  * Scale shape: a typed Aggregator — each task accumulates d² double
  * sums in place over its rows (map-side partial), merges are d²
  * adds; nothing per-row materializes the outer product as a column.
  * The d² result is a bounded model artifact (the collectCodebook
  * discipline: 64² = 4 096 doubles), never corpus-sized.
  */
object SecondMomentAgg extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), a: Array[Float]): (Array[Double], Long) = {
    if (a == null) b
    else {
      val d = a.length
      val sums = if (b._1.isEmpty) new Array[Double](d * d) else b._1
      require(sums.length == d * d,
        s"second_moment: dimension changed mid-aggregate (${sums.length} vs ${d * d})")
      var i = 0
      while (i < d) {
        val xi = a(i).toDouble
        var j = 0
        while (j < d) { sums(i * d + j) += xi * a(j); j += 1 }
        i += 1
      }
      (sums, b._2 + 1)
    }
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._1.isEmpty) y
    else if (y._1.isEmpty) x
    else {
      require(x._1.length == y._1.length,
        s"second_moment: dimension mismatch (${x._1.length} vs ${y._1.length})")
      var i = 0
      while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
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

  /** Column form: `second_moment(embedding)` → d²-length array. */
  def asColumn(e: Column): Column = udaf(this).apply(e)
}
