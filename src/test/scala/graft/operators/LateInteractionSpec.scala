package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MaxSim late-interaction scoring: hand-computed sums of per-token
  * maxima, the tokenizer split, and the two-stage (fetch → rerank)
  * composition identity on a fixture where the candidate set is total.
  */
class LateInteractionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // doc 1: axis-aligned chunks — matches both query tokens perfectly.
  // doc 2: diagonal chunks — best cos 0.8 for each token.
  private def docVecs = Seq(
    (1L, Array(1.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f)),
    (2L, Array(0.6f, 0.8f)),
    (2L, Array(0.8f, 0.6f))).toDF("doc_id", "embedding")

  private def qTok = Seq(
    (1L, 0, Array(1.0f, 0.0f)),
    (1L, 1, Array(0.0f, 1.0f))).toDF("query_id", "qpos", "qvec")

  test("maxSimTopK: hand-computed Σ-of-max scores and ranking") {
    val hits = LateInteraction.maxSimTopK(qTok, docVecs, k = 2)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    // doc1: max(1, 0) + max(0, 1) = 2.0; doc2: 0.8 + 0.8 = 1.6
    assert(hits.map(h => (h._1, h._2, h._3)).toSeq ===
      Seq((1L, 1, 1L), (1L, 2, 2L)))
    assert(math.abs(hits(0)._4 - 2.0) < 1e-6)
    assert(math.abs(hits(1)._4 - 1.6) < 1e-6)
  }

  test("queryTokens: lexical split with positions, embedder vectors") {
    val qt = LateInteraction.queryTokens(
      Seq((7L, "Spark JOIN shuffle")).toDF("query_id", "query_text"))
      .orderBy("qpos")
      .as[(Long, Int, Array[Float])].collect()
    assert(qt.map(t => (t._1, t._2)).toSeq ===
      Seq((7L, 0), (7L, 1), (7L, 2)))
    assert(qt(0)._3.toSeq === graft.rag.Embedder.embed("spark").toSeq)
    assert(qt(2)._3.toSeq === graft.rag.Embedder.embed("shuffle").toSeq)
  }

  test("maxSimRerank over a total candidate set ≡ full scan; over a " +
      "partial set scores only the candidates") {
    val full = LateInteraction.maxSimTopK(qTok, docVecs, k = 2)
      .select("query_id", "rank", "doc_id").as[(Long, Int, Long)]
      .collect().toSet
    val allCand = Seq((1L, 1L), (1L, 2L)).toDF("query_id", "doc_id")
    val served = LateInteraction.maxSimRerank(qTok, docVecs, allCand, k = 2)
      .select("query_id", "rank", "doc_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(served === full)
    // candidates = {doc 2} only: doc 1 must not appear, doc 2 is rank 1
    val partial = LateInteraction.maxSimRerank(qTok, docVecs,
      Seq((1L, 2L)).toDF("query_id", "doc_id"), k = 2)
      .select("query_id", "rank", "doc_id").as[(Long, Int, Long)]
      .collect().toSeq
    assert(partial === Seq((1L, 1, 2L)))
  }

  test("maxSimQuantizedTopK with a total shortlist ≡ full-scan MaxSim " +
      "(the exact rerank erases the int8 approximation)") {
    val full = LateInteraction.maxSimTopK(qTok, docVecs, k = 2)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Int, Long, Double)].collect().toSet
    val viaSq8 = LateInteraction.maxSimQuantizedTopK(qTok, docVecs,
      k = 2, mDocs = 2)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(viaSq8 === full)
  }

  test("meanPoolCandidates: per-doc chunk mean, cosine fetch order") {
    // query mean = (0.5, 0.5). doc1 mean = (0.5, 0.5) → cos 1; doc3
    // chunks average to (0.5, 0) → cos 1/√2 — strict order, no float
    // ties (the shared docVecs pair is deliberately COLINEAR means,
    // where order is ulp-noise — a set assertion there, covered by the
    // rerank test above)
    val docs13 = Seq(
      (1L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 0.0f)), (3L, Array(0.0f, 0.0f)))
      .toDF("doc_id", "embedding")
    val ranked = LateInteraction.meanPoolCandidatesRanked(qTok, docs13,
      fetchK = 2)
      .select("query_id", "doc_id", "fetch_rank")
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(ranked.toSeq === Seq((1L, 1L, 1), (1L, 3L, 2)))
  }
}
