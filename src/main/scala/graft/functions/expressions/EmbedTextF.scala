package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The deterministic hashing embedder as a native expression: signed
  * feature-hashing of whitespace tokens into `dim` buckets, L2-normalized
  * (bit-identical to `graft.rag.Embedder.embed` — same MurmurHash3 over
  * the same lowercased tokens). Replaces the Scala UDF in the hot
  * chunk→embed pipeline so the projection stays in the Catalyst
  * evaluation path with no Row↔JVM conversion per call.
  */
case class EmbedTextF(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val text = in.asInstanceOf[UTF8String].toString
    new GenericArrayData(
      graft.rag.Embedder.embed(text, dim).map(java.lang.Float.valueOf))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EmbedTextF {
  def embed_text(text: Column, dim: Int): Column =
    GraftExprBridge.column(EmbedTextF(GraftExprBridge.expression(text), dim))
}
