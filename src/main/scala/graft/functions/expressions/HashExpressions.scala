package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass signature expressions for the dedup operators
  * (SURVEY.md A9). These replace nested higher-order-function
  * formulations that evaluated one lambda per (token × bit/seed) pair —
  * the signature loops now run as tight Scala over the raw UTF8String
  * bytes (one xxhash64 per token/seed, no boxing). CodegenFallback: the
  * per-row work dwarfs the virtual-call overhead.
  *
  * Hash semantics match Spark's built-in xxhash64 (seed 42) exactly, so
  * signatures are identical to the composed-builtin versions.
  */
object HashExpressions {
  private def col(e: Expression): Column = GraftExprBridge.column(e)
  private def ex(c: Column): Expression = GraftExprBridge.expression(c)

  /** 64-bit SimHash over a token array column. */
  def simhash64(tokens: Column): Column = col(SimHash64F(ex(tokens)))

  /** MinHash signature (numHashes seeded minima) over a token array. */
  def minhash_sig(tokens: Column, numHashes: Int): Column =
    col(MinHashSigF(ex(tokens), numHashes))

  /** Min k-window polynomial rolling hash over a token array. */
  def rolling_min_hash(tokens: Column, k: Int): Column =
    col(RollingMinHashF(ex(tokens), k))

  /** Distinct k-token shingles (space-joined) over a token array. */
  def shingles_k(tokens: Column, k: Int): Column =
    col(ShinglesF(ex(tokens), k))

  /** [[shingles_k]] with the strict short-input contract: fewer than k
    * tokens yields an EMPTY array (no whole-text fallback shingle) —
    * matching `CorpusOps.wordShingles` ONLY on that short-input rule.
    * NOT a drop-in multiset replacement: this emits DISTINCT shingles
    * (first-occurrence order) while `wordShingles` keeps positional
    * duplicates — equivalent only under a consumer that ends in a
    * distinct/set aggregate (every current caller does).
    */
  def shingles_k_strict(tokens: Column, k: Int): Column =
    col(ShinglesF(ex(tokens), k, emptyBelowK = true))

  /** POSITIONAL k-token shingles: every window in order, duplicates
    * kept, fewer than k tokens → empty array — exact
    * `CorpusOps.wordShingles` multiset semantics, natively. Index i of
    * the result is the shingle starting at token i (the property
    * span-removal needs; [[shingles_k]] destroys it by dedup).
    */
  def shingles_k_positional(tokens: Column, k: Int): Column =
    col(PositionalShinglesF(ex(tokens), k))

  /** Distinct character trigrams of space-padded tokens. */
  def char_trigrams(tokens: Column): Column = col(CharTrigramsF(ex(tokens)))
}

/** All contiguous k-token shingles in positional order, duplicates
  * preserved (output index = start token index); n < k yields an empty
  * array. The duplicates-preserving twin of [[ShinglesF]] — see
  * [[HashExpressions.shingles_k_positional]].
  */
case class PositionalShinglesF(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8
        else arr.getUTF8String(i)
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      val win = new Array[UTF8String](k)
      var j = 0
      while (j < k) { win(j) = toks(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, win: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct contiguous k-token shingles, space-joined — one pass with a
  * hash-set dedup, first-occurrence order (identical set semantics to
  * `array_distinct(transform(sequence(...), slice+concat_ws))`, which
  * evaluates a lambda expression tree per window and was the measured
  * bottleneck of every shingle-based dedup operator). n < k (or empty)
  * degenerates to one whole-text shingle, matching the composed form —
  * unless `emptyBelowK` is set, in which case short inputs yield an
  * empty array (the `CorpusOps.wordShingles` strict contract).
  */
case class ShinglesF(child: Expression, k: Int,
    emptyBelowK: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8
        else arr.getUTF8String(i)
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    if (n < k) {
      if (emptyBelowK) return new GenericArrayData(Array.empty[Any])
      return new GenericArrayData(Array[Any](UTF8String.concatWs(sep, toks: _*)))
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i <= n - k) {
      val win = new Array[UTF8String](k)
      var j = 0
      while (j < k) { win(j) = toks(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, win: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct character trigrams of each token padded with spaces
  * (" tok " → " to", "tok", "ok ") — the signature set for n-gram
  * language identification, one pass per row.
  */
case class CharTrigramsF(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val padded = " " + arr.getUTF8String(i).toString + " "
        if (padded.length < 3) seen.add(padded)
        else {
          var j = 0
          while (j <= padded.length - 3) {
            seen.add(padded.substring(j, j + 3))
            j += 1
          }
        }
      }
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Polynomial rolling hash over k-token windows (Rabin-Karp style),
  * returning the MINIMUM window hash — the winnowing-style document
  * fingerprint. O(n) in token count: each window hash derives from the
  * previous via one multiply-subtract, instead of re-hashing k tokens.
  * Windows shorter than k (n < k) produce a single whole-document window.
  */
case class RollingMinHashF(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  private val B = 0x9E3779B97F4A7C15L // odd multiplier (golden-ratio)

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return 0L
    val tok = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) tok(i) = 0L
      else {
        val s = arr.getUTF8String(i)
        tok(i) = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      }
      i += 1
    }
    val m = math.min(k, n)
    // B^(m-1) for the roll-out term
    var bPow = 1L
    i = 1
    while (i < m) { bPow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < m) { h = h * B + tok(i); i += 1 }
    var minH = h
    i = m
    while (i < n) {
      h = (h - tok(i - m) * bPow) * B + tok(i)
      if (h < minH) minH = h
      i += 1
    }
    minH
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash64F(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinHashSigF(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes()
        var k = 0
        while (k < numHashes) {
          // = built-in xxhash64(lit(k), token): int seed hashed first
          val seedK = XXH64.hashInt(k, 42L)
          val h = XXH64.hashUnsafeBytes(base, off, len, seedK)
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
