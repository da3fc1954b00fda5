package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Greedy maximal-marginal-relevance selection over a bounded,
  * per-query candidate array — the `search_type="mmr"` retriever mode
  * of the reference's LangChain stack (public API; Carbonell & Goldstein,
  * SIGIR'98): starting from the relevance top-1, repeatedly pick
  *
  *   argmax_d  λ · sim(q, d)  −  (1 − λ) · max_{s ∈ selected} sim(d, s)
  *
  * trading relevance against redundancy with the already-selected set.
  *
  * The kernel runs AFTER a distributed top-`fetchK` fetch: its input is
  * one array of at most fetchK (rank, id, score, embedding) structs —
  * bounded by the fetch budget, never by the index — so the greedy
  * O(k · fetchK) inner loop with its data-dependent running state is
  * per-row local work, exactly where imperative logic belongs in a
  * Spark plan. Candidate-to-candidate similarity is exact cosine
  * (double, strict left-to-right); ties break to the lowest id, making
  * the selection deterministic for a deterministic candidate array.
  */
object MmrExpression {
  private def col(e: Expression): Column = GraftExprBridge.column(e)
  private def ex(c: Column): Expression = GraftExprBridge.expression(c)

  /** `cands`: array<struct<rank int, vec_id long, score double,
    * emb array<float|double>>> sorted by rank (the fetch order — fixes
    * the float accumulation order). Returns array<struct<rank int,
    * vec_id long, mmr double>> of the `k` selections in pick order.
    */
  def mmr_select(cands: Column, k: Int, lambda: Double): Column =
    col(MmrSelectF(ex(cands), k, lambda))
}

case class MmrSelectF(child: Expression, k: Int, lambda: Double)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"k must be >= 1, got $k")
  require(lambda >= 0.0 && lambda <= 1.0,
    s"lambda must be in [0, 1], got $lambda")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("vec_id", LongType, nullable = false),
    StructField("mmr", DoubleType, nullable = false))),
    containsNull = false)

  private lazy val embIsDouble: Boolean = child.dataType match {
    case ArrayType(st: StructType, _) => st.fields(3).dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    case _ => false
  }

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val rel = new Array[Double](n)
    val embs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 4)
      ids(i) = row.getLong(1)
      rel(i) = row.getDouble(2)
      val e = row.getArray(3)
      val d = new Array[Double](e.numElements())
      var j = 0
      while (j < d.length) {
        d(j) = if (embIsDouble) e.getDouble(j) else e.getFloat(j).toDouble
        j += 1
      }
      // unit-normalize once so candidate-candidate sim is one dot
      var nn = 0.0
      j = 0
      while (j < d.length) { nn += d(j) * d(j); j += 1 }
      if (nn > 0.0) {
        val inv = 1.0 / math.sqrt(nn)
        j = 0
        while (j < d.length) { d(j) *= inv; j += 1 }
      }
      embs(i) = d
      i += 1
    }
    val nSel = math.min(k, n)
    val out = new Array[Any](nSel)
    val taken = new Array[Boolean](n)
    val maxSim = new Array[Double](n) // max cos to the selected set
    var s = 0
    while (s < nSel) {
      var best = -1
      var bestV = Double.NegativeInfinity
      i = 0
      while (i < n) {
        if (!taken(i)) {
          // first pick reduces to pure relevance (maxSim all zero and
          // lambda-weighting preserves the ordering for any λ>0; λ=0
          // degenerates to pure-diversity after an arbitrary dense
          // first pick — still deterministic via the id tie-break)
          val v = if (s == 0) rel(i)
            else lambda * rel(i) - (1.0 - lambda) * maxSim(i)
          if (v > bestV || (v == bestV && best >= 0 && ids(i) < ids(best))) {
            bestV = v; best = i
          }
        }
        i += 1
      }
      taken(best) = true
      out(s) = new GenericInternalRow(Array[Any](
        s + 1, ids(best), if (s == 0) rel(best) else bestV))
      // fold the new selection into every survivor's redundancy term
      i = 0
      while (i < n) {
        if (!taken(i)) {
          val a = embs(i); val b = embs(best)
          var dp = 0.0
          var j = 0
          val len = math.min(a.length, b.length)
          while (j < len) { dp += a(j) * b(j); j += 1 }
          if (dp > maxSim(i)) maxSim(i) = dp
        }
        i += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
