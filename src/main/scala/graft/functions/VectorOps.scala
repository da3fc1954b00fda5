package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector scalar kernels over `ArrayType(FloatType|DoubleType)` columns
  * (operator P6 in SURVEY.md §2.2; motivated by the reference's cosine index
  * metric at `/root/reference/AI.py:52`).
  *
  * All kernels are composed from built-in higher-order functions
  * (`transform` / `zip_with` / `aggregate`), so they stay inside Catalyst —
  * no Scala UDF, no serialization, codegen-eligible — and compute in DOUBLE
  * precision with strict left-to-right accumulation so results are
  * reproducible against the DuckDB oracle.
  */
object VectorOps {

  /** Element-wise cast to double — all downstream math is double-precision. */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  def normSq(a: Column): Column =
    aggregate(toDouble(a), lit(0.0), (acc, x) => acc + x * x)

  def l2Norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0.0 when either vector has zero norm (matches the
    * convention of returning a neutral score instead of NaN).
    */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
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
