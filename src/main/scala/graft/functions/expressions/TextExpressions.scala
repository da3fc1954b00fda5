package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text-statistics expressions (SURVEY.md §2.10a),
  * same rationale as [[HashExpressions]]: the composed-builtin
  * formulations evaluate an interpreted lambda expression tree per
  * array element (and `array_sort` allocates + comparison-sorts per
  * row), which made the repetition-signal scan the slowest per-row
  * operator in the bench. The native fold is one O(L) pass over the
  * token array with open-hash counting — identical output, ~10× less
  * per-row work. CodegenFallback: the per-row loop dwarfs the
  * virtual-call overhead.
  */
object TextExpressions {
  private def col(e: Expression): Column = GraftExprBridge.column(e)
  private def ex(c: Column): Expression = GraftExprBridge.expression(c)

  /** (n_tok, top_count, n_bi, n_bi_distinct) over a token array. */
  def repetition_stats(tokens: Column): Column =
    col(RepetitionStatsF(ex(tokens)))

  /** (raw_len, deflate_len) of a string's UTF-8 bytes — the
    * compression-ratio quality signal. */
  def deflate_stats(text: Column, level: Int = 6): Column =
    col(DeflateStatsF(ex(text), level))

  /** Gopher-rule repetition statistics over a token array: top-{2,3,4}
    * word-n-gram character coverage and duplicated-{5..10}-gram token
    * coverage. See [[GopherStatsF]]. */
  def gopher_stats(tokens: Column): Column =
    col(GopherStatsF(ex(tokens)))

  /** Winnowing fingerprints of a token array — md5-52bit gram hashes,
    * window minima, distinct (first occurrence). See [[WinnowFpF]]. */
  def winnow_fp(tokens: Column, k: Int, w: Int): Column =
    col(WinnowFpF(ex(tokens), k, w))

  /** Unicode NFC normalization of a string (java.text.Normalizer —
    * identical results to any conformant implementation; Unicode
    * normalization is fully specified). See [[NfcNormalizeF]]. */
  def nfc_normalize(text: Column): Column = col(NfcNormalizeF(ex(text)))

  /** Hashed bag-of-words feature vector (the hashing trick):
    * array<float> of length `dim`; bucket = murmur3 of the token's
    * UTF-8 bytes mod dim. `binary` → presence (0/1), else counts
    * normalized by token count. See [[HashedBowF]]. */
  def hashed_bow(tokens: Column, dim: Int, binary: Boolean = true): Column =
    col(HashedBowF(ex(tokens), dim, binary))
}

/** Raw-DEFLATE size of a string's UTF-8 bytes in one per-row pass —
  * the compression-ratio quality signal production corpus filters use
  * (public: e.g. CCNet/RefinedWeb-class pipelines drop documents whose
  * bytes compress too well — boilerplate/repetition — or too poorly —
  * high-entropy gibberish). Returns struct(raw_len, deflate_len);
  * downstream SQL derives the ratio so rounding stays in the query.
  * `nowrap` raw deflate (no zlib header/checksum) at the given level;
  * the JDK's bundled zlib makes the byte count deterministic within a
  * runtime, and every oracled check on it is an invariant (bounds,
  * subadditivity), never an exact byte count.
  */
case class DeflateStatsF(child: Expression, level: Int)
    extends UnaryExpression with CodegenFallback {
  require(level >= 0 && level <= 9, s"deflate level must be 0..9: $level")
  override def dataType: DataType = StructType(Seq(
    StructField("raw_len", LongType, nullable = false),
    StructField("deflate_len", LongType, nullable = false)))

  override def nullSafeEval(in: Any): Any = {
    val bytes = in.asInstanceOf[UTF8String].getBytes
    val d = new java.util.zip.Deflater(level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bytes.length.toLong, total))
    } finally d.end()
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The Gopher repetitious-text rule set (Rae et al. 2021, §A1.1 —
  * public), computed per row in O(L) passes with zero shuffle:
  *
  *   - `top{2,3,4}_cov`: the maximal CHARACTER coverage of any single
  *     word n-gram — max over n-grams g of count(g) × numChars(g),
  *     where g's characters include its n−1 separator spaces (the
  *     "fraction of characters in the most frequent n-gram" family;
  *     taking the max of the product is a total order, so no tie-break
  *     is needed and the derived fraction is unambiguous).
  *   - `dup{5..10}_cov`: the number of TOKEN positions covered by at
  *     least one occurrence of an n-gram appearing ≥ 2 times within
  *     the document (the "fraction of characters in duplicated
  *     n-grams" family, in its token-coverage variant — overlapping
  *     occurrences count each position once).
  *
  * Both families divide downstream (by char length / token count) so
  * rounding stays in the query. The naive formulation explodes every
  * n-gram of every document and shuffles them 9 times (once per n) —
  * at 100 TB that is 9 corpus-sized exchanges; this expression does
  * the same counting in per-row hash maps. Null array elements count
  * as empty strings (the [[RepetitionStatsF]] convention).
  */
case class GopherStatsF(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(
    StructField("n_tok", LongType, nullable = false) +:
    (2 to 4).map(n => StructField(s"top${n}_cov", LongType, nullable = false)) ++:
    (5 to 10).map(n => StructField(s"dup${n}_cov", LongType, nullable = false)))

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
    def windows(k: Int): Array[UTF8String] = {
      val m = math.max(0, n - k + 1)
      val out = new Array[UTF8String](m)
      var j = 0
      while (j < m) {
        out(j) = UTF8String.concatWs(sep,
          java.util.Arrays.copyOfRange(toks, j, j + k): _*)
        j += 1
      }
      out
    }
    def counts(ws: Array[UTF8String]): java.util.HashMap[UTF8String, Integer] = {
      val m = new java.util.HashMap[UTF8String, Integer](ws.length * 2)
      var j = 0
      while (j < ws.length) {
        val prev = m.get(ws(j))
        m.put(ws(j), if (prev == null) 1 else prev.intValue() + 1)
        j += 1
      }
      m
    }
    val vals = new Array[Any](1 + 3 + 6)
    vals(0) = n.toLong
    var slot = 1
    var k = 2
    while (k <= 4) { // top-k-gram char coverage: max count x numChars
      val ws = windows(k)
      val m = counts(ws)
      var best = 0L
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cov = e.getValue.longValue() * e.getKey.numChars()
        if (cov > best) best = cov
      }
      vals(slot) = best
      slot += 1
      k += 1
    }
    k = 5
    val covered = new Array[Boolean](n)
    while (k <= 10) { // duplicated-k-gram token coverage
      val ws = windows(k)
      val m = counts(ws)
      java.util.Arrays.fill(covered, false)
      var j = 0
      while (j < ws.length) {
        if (m.get(ws(j)).intValue() >= 2) {
          var p = j
          while (p < j + k) { covered(p) = true; p += 1 }
        }
        j += 1
      }
      var cov = 0L
      j = 0
      while (j < n) { if (covered(j)) cov += 1; j += 1 }
      vals(slot) = cov
      slot += 1
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization per row — the canonical-composition step
  * of every text-normalization pipeline (decomposed accents compose,
  * singleton equivalences collapse; byte-identical content that only
  * differs in representation becomes identical, which upstream exact
  * dedup then catches). Normalization is fully specified by Unicode,
  * so the JVM's Normalizer and DuckDB's utf8proc produce identical
  * output — the oracle replays it with `nfc_normalize`. Per-row, zero
  * shuffle; the fast path (already-NFC ASCII, the overwhelming corpus
  * majority) is a cheap isNormalized check with no allocation.
  */
case class NfcNormalizeF(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(in: Any): Any = {
    val s = in.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s,
        java.text.Normalizer.Form.NFC)) in
    else UTF8String.fromString(java.text.Normalizer.normalize(s,
      java.text.Normalizer.Form.NFC))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed bag-of-words features (Weinberger et al. 2009's hashing
  * trick — public; the fastText/CCNet quality-classifier feature map):
  * one O(L) pass hashing each token's UTF-8 bytes (UTF8String's
  * murmur3-based hashCode — deterministic across JVMs) into `dim`
  * buckets. `binary` emits presence 0/1 per bucket; otherwise counts
  * normalized by the token count. Zero shuffle, linear in corpus
  * tokens; array<float> so the vector reuses the native [[DotF]] /
  * VectorMeanAgg kernels downstream.
  */
case class HashedBowF(child: Expression, dim: Int, binary: Boolean)
    extends UnaryExpression with CodegenFallback {
  require(dim >= 1, s"dim must be positive: $dim")
  override def dataType: DataType =
    ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Float](dim)
    var i = 0
    while (i < n) {
      val t = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8
        else arr.getUTF8String(i)
      val j = ((t.hashCode % dim) + dim) % dim
      if (binary) v(j) = 1.0f else v(j) += 1.0f
      i += 1
    }
    if (!binary && n > 0) {
      var j = 0
      while (j < dim) { v(j) /= n; j += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(v)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Repetition statistics of a token array in one pass:
  * `n_tok` token count, `top_count` the highest single-token
  * multiplicity, `n_bi` the adjacent-bigram count (n−1, 0 when n<2),
  * `n_bi_distinct` the distinct adjacent-bigram count. Token
  * multiplicity via a hash map, bigram distinctness via a hash set of
  * the space-joined pair — byte-equality on UTF8String, so the
  * semantics equal the sorted-array-fold formulation (longest equal
  * run = max multiplicity; sorted boundary count = distinct count)
  * it replaces. Null array elements count as empty strings.
  */
case class RepetitionStatsF(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("n_bi", LongType, nullable = false),
    StructField("n_bi_distinct", LongType, nullable = false)))

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var top = 0
    var i = 0
    while (i < n) {
      val t = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8
        else arr.getUTF8String(i)
      toks(i) = t
      val prev = counts.get(t)
      val c = if (prev == null) 1 else prev.intValue() + 1
      counts.put(t, c)
      if (c > top) top = c
      i += 1
    }
    var nBiDistinct = 0L
    if (n >= 2) {
      val seen = new java.util.HashSet[UTF8String](n * 2)
      val sep = UTF8String.fromString(" ")
      i = 0
      while (i < n - 1) {
        if (seen.add(UTF8String.concatWs(sep, toks(i), toks(i + 1))))
          nBiDistinct += 1
        i += 1
      }
    }
    val nBi = if (n >= 2) (n - 1).toLong else 0L
    InternalRow(n.toLong, top.toLong, nBi, nBiDistinct)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass winnowing fingerprint selection over a token array
  * (Schleimer–Wilkerson–Aiken, SIGMOD 2003): md5-52bit hash per
  * k-token gram, sliding window of w gram hashes, each window's
  * minimum kept, distinct in first-occurrence order — value-identical
  * to the composed `transform`/`slice`/`array_min`/`md5` column
  * formulation, but each gram is hashed ONCE (the nested
  * higher-order-function tree re-evaluated the full O(L) hash array
  * inside every window's lambda, turning 5 000 sf0.1 documents into a
  * 120-second projection; this pass is ~400× cheaper). Fewer than one
  * gram → empty array (callers filter those rows out).
  */
case class WinnowFpF(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1, s"need k, w >= 1: ($k, $w)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ng = n - k + 1
    if (ng < 1)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder()
    val h = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(arr.getUTF8String(i + j).toString)
        j += 1
      }
      md.reset()
      val d = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 13 hex chars = first 52 bits, big-endian (the
      // conv(substring(md5, 1, 13), 16, 10) / DuckDB-replayable value)
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      h(i) = v >>> 4
      i += 1
    }
    val nw = math.max(ng - w + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < nw) {
      var m = h(j)
      var t = j + 1
      val e = math.min(j + w, ng)
      while (t < e) { if (h(t) < m) m = h(t); t += 1 }
      seen.add(m)
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
