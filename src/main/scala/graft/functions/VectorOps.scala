package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector scalar kernels over `ArrayType(FloatType|DoubleType)` columns
  * (operator P6 in SURVEY.md §2.2; motivated by the reference's cosine index
  * metric at `/root/reference/AI.py:52`).
  *
  * The hot kernels are native Catalyst expressions with codegen
  * (graft.functions.expressions.VectorExpressions); composed-builtin
  * higher-order-function twins are kept for cross-checking. All math is
  * DOUBLE precision with strict left-to-right accumulation so results are
  * reproducible against the DuckDB oracle.
  */
object VectorOps {
  import graft.functions.expressions.VectorExpressions

  /** Element-wise cast to double — all downstream math is double-precision. */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  // Native single-pass Catalyst expressions (codegen) — the hot path.
  def dot(a: Column, b: Column): Column = VectorExpressions.dot_f(a, b)
  def l2Norm(a: Column): Column = VectorExpressions.norm_f(a)
  def cosine(a: Column, b: Column): Column = VectorExpressions.cosine_f(a, b)

  def normSq(a: Column): Column =
    aggregate(toDouble(a), lit(0.0), (acc, x) => acc + x * x)

  // Composed-builtin (higher-order-function) twins, kept as the
  // cross-check reference for the native expressions in tests.
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  def cosineHof(a: Column, b: Column): Column = {
    val d = dotHof(a, b)
    val n = sqrt(normSq(a)) * sqrt(normSq(b))
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** L2-normalize into a double array (zero vector stays zero). */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(toDouble(a), x => when(n === 0.0, lit(0.0)).otherwise(x / n))
  }

  // ---- pure-Scala twins (unit tests + row-level pipelines) ----

  def dotScala(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def normScala(a: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  def cosineScala(a: Array[Float], b: Array[Float]): Double = {
    val n = normScala(a) * normScala(b)
    if (n == 0.0) 0.0 else dotScala(a, b) / n
  }
}
