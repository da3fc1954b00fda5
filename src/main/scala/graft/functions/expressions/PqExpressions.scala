package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst kernels for product quantization (PQ) — the
  * compression tier past SQ8 (`QuantizeI8F`): instead of one byte PER
  * COMPONENT, PQ stores one byte PER SUBSPACE (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — the layout
  * faiss ships as `PQ<M>`). The d-dim vector is split into `numSub`
  * contiguous subvectors; each subvector is replaced by the id of its
  * nearest centroid in a per-subspace codebook of `ksub` entries
  * (ksub ≤ 256 so one byte holds a code).
  *
  * Query-side scoring is ADC (asymmetric distance computation): the
  * query is NOT quantized — one `numSub × ksub` table of
  * `dot(codebook[m][j], q_m)` per query, and each index vector's
  * approximate dot product is `numSub` table lookups. The scan kernel
  * reads `numSub` bytes per vector (64-dim at numSub=16: 16 B vs
  * 256 B float32 = 16× less bandwidth; the reference's 1536-dim at
  * numSub=96 with the full ksub=256 codebook — the certified 1536
  * operating point, `AnnTune pqdim`: 96 B vs 6 KiB = 64×) and does
  * no multiplies at all.
  *
  * The codebook rides along as a flat `Array[Double]` constructor
  * parameter (layout `[sub][cid][dim-within-sub]`), bounded by
  * `numSub · ksub · dsub` — model parameters, embedded as a codegen
  * reference object, never a per-row column.
  *
  * All dot math is double-precision strict left-to-right, matching the
  * repo-wide kernel discipline (`VectorExpressions`).
  */
object PqExpressions {

  private def col(e: Expression): Column = GraftExprBridge.column(e)
  private def ex(c: Column): Expression = GraftExprBridge.expression(c)

  /** PQ codes of a float/double vector: BINARY of `numSub` bytes, byte m
    * = argmin-L2 centroid id of subvector m (ties: lowest id).
    */
  def pq_encode(vec: Column, codebook: Array[Double], numSub: Int, ksub: Int): Column =
    col(PqEncodeF(ex(vec), codebook, numSub, ksub))

  /** [[pq_encode]] with ARRAY<INT> output instead of binary — the
    * Lloyd-training inner loop's assignment kernel, where the code must
    * feed `element_at`/grouping directly (binary byte extraction has no
    * codegen-friendly SQL accessor). Same argmin-L2, same tie rule.
    */
  def pq_encode_codes(vec: Column, codebook: Array[Double], numSub: Int,
      ksub: Int): Column =
    col(PqEncodeCodesF(ex(vec), codebook, numSub, ksub))

  /** Per-query ADC lookup table: array<double> of length `numSub · ksub`,
    * element `m · ksub + j` = dot(codebook[m][j], q_m).
    */
  def pq_table(queryVec: Column, codebook: Array[Double], numSub: Int, ksub: Int): Column =
    col(PqTableF(ex(queryVec), codebook, numSub, ksub))

  /** ADC approximate dot product: Σ_m table[m · ksub + codes[m]]. */
  def pq_adc_dot(codes: Column, table: Column): Column =
    col(PqAdcDotF(ex(codes), ex(table)))
}

private object PqKernels {
  /** Validate (codebook, numSub, ksub) and return dsub. */
  def dsubOf(codebook: Array[Double], numSub: Int, ksub: Int): Int = {
    require(numSub >= 1, s"numSub must be >= 1, got $numSub")
    require(ksub >= 1 && ksub <= 256,
      s"ksub must be in [1, 256] (codes are one byte), got $ksub")
    require(codebook.length % (numSub * ksub) == 0 && codebook.nonEmpty,
      s"codebook length ${codebook.length} is not a multiple of " +
        s"numSub*ksub = ${numSub * ksub}")
    codebook.length / (numSub * ksub)
  }

  def checkDim(n: Int, numSub: Int, dsub: Int, what: String): Unit =
    if (n != numSub * dsub) throw new IllegalArgumentException(
      s"$what: vector dimension $n does not match the codebook's " +
        s"numSub*dsub = ${numSub * dsub} — encode/query and codebook must " +
        "agree on dimensionality")
}

/** argmin-L2 sub-codebook assignment per subspace, one byte per
  * subspace. Index-build-side (one pass at encode time, like
  * `LshBucketsF`) — interpreted eval, not codegen.
  */
case class PqEncodeF(child: Expression, codebook: Array[Double],
    numSub: Int, ksub: Int)
    extends UnaryExpression with CodegenFallback {
  private val dsub = PqKernels.dsubOf(codebook, numSub, ksub)
  override def dataType: DataType = BinaryType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val g = VecKernels.getter(child)
    PqKernels.checkDim(x.numElements(), numSub, dsub, "pq_encode")
    val out = new Array[Byte](numSub)
    var m = 0
    while (m < numSub) {
      val base = m * ksub * dsub
      var bestJ = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        val cb = base + j * dsub
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val diff = g(x, m * dsub + i) - codebook(cb + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; bestJ = j } // strict < keeps lowest id on ties
        j += 1
      }
      out(m) = bestJ.toByte
      m += 1
    }
    out
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[PqEncodeF]] with array<int> output — identical assignment loop
  * (argmin L2 per subspace, strict < keeps the lowest id on ties), the
  * form the PQ-training refresh aggregates on.
  */
case class PqEncodeCodesF(child: Expression, codebook: Array[Double],
    numSub: Int, ksub: Int)
    extends UnaryExpression with CodegenFallback {
  private val dsub = PqKernels.dsubOf(codebook, numSub, ksub)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val g = VecKernels.getter(child)
    PqKernels.checkDim(x.numElements(), numSub, dsub, "pq_encode_codes")
    val out = new Array[Int](numSub)
    var m = 0
    while (m < numSub) {
      val base = m * ksub * dsub
      var bestJ = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        val cb = base + j * dsub
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val diff = g(x, m * dsub + i) - codebook(cb + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; bestJ = j } // strict < keeps lowest id on ties
        j += 1
      }
      out(m) = bestJ
      m += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC table — query-broadcast-side, bounded by the query
  * batch, so interpreted eval.
  */
case class PqTableF(child: Expression, codebook: Array[Double],
    numSub: Int, ksub: Int)
    extends UnaryExpression with CodegenFallback {
  private val dsub = PqKernels.dsubOf(codebook, numSub, ksub)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val g = VecKernels.getter(child)
    PqKernels.checkDim(x.numElements(), numSub, dsub, "pq_table")
    val out = new Array[Double](numSub * ksub)
    var m = 0
    while (m < numSub) {
      val base = m * ksub * dsub
      var j = 0
      while (j < ksub) {
        val cb = base + j * dsub
        var s = 0.0
        var i = 0
        while (i < dsub) { s += codebook(cb + i) * g(x, m * dsub + i); i += 1 }
        out(m * ksub + j) = s
        j += 1
      }
      m += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The PQ scan kernel: `numSub` byte loads + table lookups per index
  * vector, zero multiplies — codegen'd into the whole-stage loop. The
  * table length must be an exact `ksub` multiple of the code length
  * (a mismatch means query and index disagree on the codebook — throw
  * loudly rather than score garbage, the `DotI8F` discipline).
  */
case class PqAdcDotF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val table = b.asInstanceOf[ArrayData]
    if (codes.length == 0 || table.numElements() % codes.length != 0)
      throw new IllegalArgumentException(
        s"pq_adc_dot: table length ${table.numElements()} is not a " +
          s"multiple of code length ${codes.length} — query table and " +
          "index codes must come from the same codebook")
    val ksub = table.numElements() / codes.length
    var s = 0.0
    var m = 0
    while (m < codes.length) {
      s += table.getDouble(m * ksub + (codes(m) & 0xFF))
      m += 1
    }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val ks = ctx.freshName("ksub")
      s"""
         |if ($a.length == 0 || $b.numElements() % $a.length != 0) {
         |  throw new IllegalArgumentException(
         |    "pq_adc_dot: table length " + $b.numElements() + " is not a " +
         |    "multiple of code length " + $a.length + " — query table and " +
         |    "index codes must come from the same codebook");
         |}
         |int $ks = $b.numElements() / $a.length;
         |double ${ev.value}_acc = 0.0;
         |for (int $m = 0; $m < $a.length; $m++) {
         |  ${ev.value}_acc += $b.getDouble($m * $ks + ($a[$m] & 0xFF));
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
