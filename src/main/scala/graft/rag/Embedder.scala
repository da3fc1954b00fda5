package graft.rag

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Deterministic local text embedder replacing the reference's remote
  * embedding calls (`OpenAIEmbeddings` at `/root/reference/AI.py:58`, index
  * dim 1536 at `AI.py:51`) so the pipeline runs offline: signed
  * feature-hashing of whitespace tokens into `dim` buckets, L2-normalized —
  * the classic hashing-trick text vectorizer. Fixture embeddings are 64-dim
  * (FIXTURES.md), so the default matches.
  *
  * Deterministic across JVMs/partitions: bucket and sign derive only from
  * MurmurHash3 of the token.
  */
object Embedder {
  val DefaultDim = 64
  private val Seed = 42

  def embed(text: String, dim: Int = DefaultDim): Array[Float] = {
    val v = new Array[Double](dim)
    if (text != null) {
      val tokens = text.toLowerCase.split("\\s+")
      var i = 0
      while (i < tokens.length) {
        val t = tokens(i)
        if (t.nonEmpty) {
          val h = MurmurHash3.stringHash(t, Seed)
          val bucket = math.floorMod(h, dim)
          val sign = if (((h >>> 31) & 1) == 0) 1.0 else -1.0
          v(bucket) += sign
        }
        i += 1
      }
    }
    var n = 0.0
    var j = 0
    while (j < dim) { n += v(j) * v(j); j += 1 }
    val norm = math.sqrt(n)
    val out = new Array[Float](dim)
    j = 0
    while (j < dim) {
      out(j) = if (norm == 0.0) 0.0f else (v(j) / norm).toFloat
      j += 1
    }
    out
  }

  /** Column form — a native expression (EmbedTextF) rather than a Scala
    * UDF, so the per-row projection stays inside Catalyst evaluation.
    * Embedding is a per-row transform: parallel across partitions, no
    * shuffle.
    */
  def embedCol(textCol: Column, dim: Int = DefaultDim): Column =
    graft.functions.expressions.EmbedTextF.embed_text(textCol, dim)

  /** UDF twin kept as the cross-check reference in tests. */
  def embedColUdf(textCol: Column, dim: Int = DefaultDim): Column = {
    val f = udf((s: String) => embed(s, dim))
    f(textCol)
  }
}
