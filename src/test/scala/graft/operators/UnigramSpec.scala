package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer (Kudo 2018 hard-EM variant): the full EM
  * arithmetic hand-computed on a 3-word corpus — seed counts, E-step
  * Viterbi counts, M-step floors and drops, pruning, final probs —
  * plus the tie-break and unknown-char contracts of the Viterbi DP
  * and the encode/fertility surfaces.
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // word freqs: abab×2, ab×3, cd×1
  private def docs = Seq(
    (1L, "abab ab cd"), (2L, "abab ab"), (3L, "ab"))
    .toDF("doc_id", "text")

  test("seed counts: per-position substrings, freq-weighted — " +
      "hand-computed") {
    val got = CorpusOps.unigramSeedCounts(docs, maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // abab×2 contributes a:4 b:4 ab:4 ba:2; ab×3 a:3 b:3 ab:3;
    // cd×1 c:1 d:1 cd:1
    assert(got === Map("a" -> 7L, "b" -> 7L, "ab" -> 7L, "ba" -> 2L,
      "c" -> 1L, "d" -> 1L, "cd" -> 1L))
  }

  test("one EM round, hand-computed: Viterbi counts are integers, " +
      "unused multi-char pieces drop, chars floor at 1, probs " +
      "normalize over the shipped vocabulary") {
    val v = CorpusOps.unigramVocab(docs, vocabSize = 6,
      maxPieceLen = 2, emRounds = 1, seedSize = 10)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getInt(1), r.getLong(2), r.getDouble(3)))).toMap
    // E-step under seed probs (total 26): abab → [ab,ab] (score
    // 2·ln(7/26) beats [a,b,a,b], [a,ba,b], [ab,a,b]); ab → [ab];
    // cd → [cd]. Hard counts: ab = 2·2 + 3 = 7, cd = 1; "ba" unused →
    // dropped; chars floor at 1. Final E-step over the pruned vocab
    // re-derives the same paths; total = 7 + 1 + 4·1 = 12.
    def p(n: Long) = BigDecimal(n / 12.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(v === Map(
      "ab" -> ((2, 7L, p(7))), "cd" -> ((2, 1L, p(1))),
      "a" -> ((1, 1L, p(1))), "b" -> ((1, 1L, p(1))),
      "c" -> ((1, 1L, p(1))), "d" -> ((1, 1L, p(1)))))
  }

  test("pruning keeps ALL single chars and the top multi-char pieces " +
      "by (count desc, piece asc)") {
    // vocabSize 5 leaves room for ONE multi-char piece: ab (count 7)
    // survives, cd (count 1) is pruned — its word re-segments to
    // [c, d] in the final E-step
    val v = CorpusOps.unigramVocab(docs, vocabSize = 5,
      maxPieceLen = 2, emRounds = 1, seedSize = 10)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(v.keySet === Set("a", "b", "c", "d", "ab"))
    assert(v("ab") === 7L && v("c") === 1L && v("d") === 1L)
  }

  test("Viterbi tie-break: at bit-equal scores the longer last piece " +
      "wins; unknown chars fall back to the floor, never crash") {
    val L = math.log(5.0 / 20.0)
    // paths [a,aa] and [aa,a] score L+L exactly — the tie-break picks
    // back(3) = 2: segmentation [a, aa]
    assert(CorpusOps.viterbiSegment("aaa",
      Map("a" -> L, "aa" -> L), 2, 20.0) === Seq("a", "aa"))
    // unseen chars segment as floor-prob singletons
    assert(CorpusOps.viterbiSegment("xy",
      Map("a" -> L), 2, 20.0) === Seq("x", "y"))
    assert(CorpusOps.viterbiSegment("", Map("a" -> L), 2, 20.0) === Nil)
  }

  test("encode: lossless roundtrip, token counts, and the fertility " +
      "twin aggregates like tokenizerFertility") {
    val vocab = CorpusOps.unigramVocab(docs, vocabSize = 6,
      maxPieceLen = 2, emRounds = 1, seedSize = 10)
    val enc = CorpusOps.unigramEncodeTokens(docs, vocab,
      maxPieceLen = 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getBoolean(4))))
      .toMap
    assert(enc(1L) === ((3L, 4L, "ab|ab|ab|cd", true)))
    assert(enc(2L) === ((2L, 3L, "ab|ab|ab", true)))
    assert(enc(3L) === ((1L, 1L, "ab", true)))
    val fert = CorpusOps.unigramFertility(
      docs.withColumn("lang", lit("xx")), vocab, maxPieceLen = 2,
      byCol = "lang").collect().head
    // 6 words, 8 tokens → fertility 8/6; chars: 4+4+2+2+2+2+2=... per
    // word lengths 4,2,2 / 4,2 / 2 = 16 chars, 16/8 = 2 chars/token
    assert(fert.getLong(1) === 6L && fert.getLong(2) === 8L)
    assert(fert.getDouble(3) === BigDecimal(8.0 / 6.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(fert.getDouble(4) === 2.0)
  }
}
