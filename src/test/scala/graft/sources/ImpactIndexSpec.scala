package graft.sources

import graft.{Tables, TestSpark}
import graft.operators.KeywordSearch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Block-max WAND over the impact-banded layout: identity to the
  * exhaustive BM25 ranking (the whole point — pruning must be lossless
  * under the 6-decimal ranking), band-assignment invariants, real
  * pruning on a skewed corpus, lifecycle freshness.
  */
class ImpactIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val runTag = java.util.UUID.randomUUID.toString.take(8)

  private def docs: DataFrame =
    Tables.load(spark, TestSpark.Sf0001, "documents")
      .select("doc_id", "text")

  private def queries: DataFrame =
    graft.queries.PipelineQueries.retrievalQueryDf(spark)

  private def hits(df: DataFrame): Set[(Long, Int, Long, Double)] =
    df.select("query_id", "rank", "doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("wandTopK is row-identical to exhaustive bm25TopK on the fixture " +
      "corpus (k=5 and k=1), and deterministic across runs") {
    val key = s"bmw-$runTag-a"
    ImpactIndex.ensureImpacts(spark, key, docs)
    val full5 = hits(KeywordSearch.bm25TopK(queries, docs, k = 5))
    assert(hits(ImpactIndex.wandTopK(spark, key, queries, k = 5)) === full5)
    assert(hits(ImpactIndex.wandTopK(spark, key, queries, k = 5)) === full5)
    assert(hits(ImpactIndex.wandTopK(spark, key, queries, k = 1))
      === hits(KeywordSearch.bm25TopK(queries, docs, k = 1)))
    // p1Bands=1 (weakest θ) must still be exact — θ quality affects
    // pruning, never correctness
    assert(hits(ImpactIndex.wandTopK(spark, key, queries, k = 5,
      p1Bands = 1)) === full5)
  }

  test("a query with under k matching docs disables pruning (θ = −∞) " +
      "and still answers exactly; an all-absent query yields no rows " +
      "on both paths") {
    val key = s"bmw-$runTag-b"
    val tiny = Seq(
      (1L, "alpha beta"), (2L, "alpha gamma"), (3L, "delta epsilon"))
      .toDF("doc_id", "text")
    ImpactIndex.ensureImpacts(spark, key, tiny)
    val q = Seq((1L, "alpha"), (2L, "zzz qqq")).toDF("query_id", "query_text")
    val full = hits(KeywordSearch.bm25TopK(q, tiny, k = 5))
    val wand = hits(ImpactIndex.wandTopK(spark, key, q, k = 5))
    assert(wand === full)
    assert(wand.map(_._1) === Set(1L))
  }

  test("band assignment: block 0 holds each term's max impact; blockmax " +
      "covers every (term, block); the counted df equals the postings df") {
    val key = s"bmw-$runTag-c"
    val h = ImpactIndex.ensureImpacts(spark, key, docs)
    // every term's global max row sits in band 0
    val misplacedMax = h.impacts.groupBy("term")
      .agg(max("impact").as("gmax"),
        max(when(col("block") === 0, col("impact"))).as("b0max"))
      .filter(col("b0max") =!= col("gmax"))
    assert(misplacedMax.count() === 0)
    // bmax really bounds every row in its band
    val overBound = h.impacts.join(h.blockmax, Seq("term", "block"))
      .filter(col("impact") > col("bmax"))
    assert(overBound.count() === 0)
    // df from band counts = df from postings
    val dfFromBands = h.blockmax.groupBy("term")
      .agg(sum("cnt").as("df_bands"))
    val dfFromRows = h.impacts.groupBy("term")
      .agg(count(lit(1)).as("df_rows"))
    assert(dfFromBands.join(dfFromRows, Seq("term"))
      .filter(col("df_bands") =!= col("df_rows")).count() === 0)
  }

  test("pruning is REAL on a skewed corpus: candidate pairs well under " +
      "the exhaustive aggregate input, answers still identical") {
    val key = s"bmw-$runTag-d"
    // one stopword-ish term in every doc, rare terms in a few: the
    // worst case for exhaustive scoring (the high-df scan), the best
    // case for WAND (common-term bands prune once θ locks in)
    val skewed = (0 until 400).map { i =>
      val rare = if (i % 40 == 3) s" special token$i" else ""
      (i.toLong, s"common filler word$rare w${i % 7} w${i % 13}")
    }.toDF("doc_id", "text")
    ImpactIndex.ensureImpacts(spark, key, skewed)
    val q = Seq((1L, "special common")).toDF("query_id", "query_text")
    val fr = ImpactIndex.wandFrames(spark, key, q, k = 3, p1Bands = 3)
    assert(hits(fr.result) === hits(KeywordSearch.bm25TopK(q, skewed,
      k = 3)))
    val exhaustivePairs = fr.qterms.agg(sum("df")).head().getDouble(0)
    val candidates = fr.candidates.count()
    assert(exhaustivePairs >= 400.0, "common term must hit every doc")
    assert(candidates < exhaustivePairs / 2,
      s"pruning must bite: $candidates candidates vs " +
        s"$exhaustivePairs exhaustive pairs")
  }

  test("deleteImpacts POISONS the layout: serving refuses loudly until " +
      "a rebuild over the survivors; replayed delete skips") {
    val key = s"bmw-$runTag-p"
    val d1 = Seq((1L, "alpha beta"), (2L, "beta gamma"),
      (3L, "alpha gamma")).toDF("doc_id", "text")
    ImpactIndex.ensureImpacts(spark, key, d1)
    assert(ImpactIndex.deleteImpacts(spark, key, Seq(2L).toDF("doc_id"),
      batchId = Some(1L)) === 1L)
    assert(ImpactIndex.impactsTombstoned(spark, key))
    // replay skip
    assert(ImpactIndex.deleteImpacts(spark, key, Seq(2L).toDF("doc_id"),
      batchId = Some(1L)) === 1L)
    val q = Seq((1L, "alpha")).toDF("query_id", "query_text")
    val e = intercept[IllegalArgumentException] {
      ImpactIndex.wandTopK(spark, key, q, k = 2)
    }
    assert(e.getMessage.contains("poisoned"), e.getMessage)
    // ensure over the SURVIVORS rebuilds, clears the poison, and the
    // served ranking equals exhaustive BM25 over the survivors
    val survivors = d1.filter(col("doc_id") =!= 2L)
    ImpactIndex.ensureImpacts(spark, key, survivors)
    assert(!ImpactIndex.impactsTombstoned(spark, key))
    val got = ImpactIndex.wandTopK(spark, key, q, k = 2)
      .select("query_id", "rank", "doc_id", "score").collect()
      .map(_.toSeq).toSet
    assert(got === KeywordSearch.bm25TopK(q, survivors, k = 2)
      .select("query_id", "rank", "doc_id", "score").collect()
      .map(_.toSeq).toSet)
  }

  test("freshness: same content reuses (no rebuild), changed content " +
      "rebuilds; openImpacts without an ensure fails loudly") {
    val key = s"bmw-$runTag-e"
    val d1 = Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    ImpactIndex.ensureImpacts(spark, key, d1)
    val mtime1 = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"/tmp/graft_kwbmw_${IndexStore.pathTag(key)}/impacts"))
    ImpactIndex.ensureImpacts(spark, key, d1)
    val mtime2 = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"/tmp/graft_kwbmw_${IndexStore.pathTag(key)}/impacts"))
    assert(mtime1 === mtime2, "unchanged content must not rebuild")
    // same cardinality, different text → fingerprint rebuild
    val d2 = Seq((1L, "alpha beta"), (2L, "beta DELTA"))
      .toDF("doc_id", "text")
    ImpactIndex.ensureImpacts(spark, key, d2)
    val q = Seq((1L, "delta")).toDF("query_id", "query_text")
    assert(hits(ImpactIndex.wandTopK(spark, key, q, k = 2))
      === hits(KeywordSearch.bm25TopK(q, d2, k = 2)))
    val e = intercept[IllegalArgumentException] {
      ImpactIndex.openImpacts(spark, s"bmw-$runTag-never")
    }
    assert(e.getMessage.contains("ensureImpacts"))
  }
}
