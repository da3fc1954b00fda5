package graft.sources

import graft.TestSpark
import graft.operators.CorpusOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tokenizer artifact store: stored models are row-identical to the
  * trainers' output; a same-content re-ensure SERVES the store (no
  * retrain); content change retrains; snapshotId gives the O(1)
  * no-scan reuse path.
  */
class TokenizerStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val runTag = java.util.UUID.randomUUID.toString.take(8)

  private def corpus = Seq(
    (1L, "aa ab aa ab cd"), (2L, "aa ab ef"), (3L, "aa gh"))
    .toDF("doc_id", "text")

  private def mtimes(dir: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try s.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(p => p.toString ->
        java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
    finally s.close()
  }

  test("BPE merges: stored ≡ trainer output; same content re-ensure " +
      "serves the store; content change retrains") {
    val key = s"tok-$runTag-bpe"
    val direct = CorpusOps.bpeMergesLocal(corpus, numMerges = 3)
      .select("step", "lhs", "rhs").collect().map(_.toSeq).toSeq
    val stored = TokenizerStore.ensureBpeMerges(spark, key, corpus,
      numMerges = 3).select("step", "lhs", "rhs")
      .collect().map(_.toSeq).toSeq
    assert(stored === direct)
    val dir = s"/tmp/graft_tok_bpe_${IndexStore.pathTag(key)}/merges"
    val m1 = mtimes(dir)
    val again = TokenizerStore.ensureBpeMergeList(spark, key, corpus,
      numMerges = 3)
    assert(again === direct.map(r => (r(1), r(2))))
    assert(mtimes(dir) === m1, "same content must not retrain")
    // content change → retrain (files rewritten)
    TokenizerStore.ensureBpeMerges(spark, key,
      corpus.unionByName(Seq((9L, "zz zz zz zz zz zq"))
        .toDF("doc_id", "text")), numMerges = 3)
    assert(mtimes(dir) !== m1, "changed content must retrain")
    TokenizerStore.drop(spark, key)
  }

  test("unigram vocab: stored ≡ trainer output; encode through the " +
      "stored artifact matches the direct path; snapshotId reuse is " +
      "O(1) (trusted without a content scan)") {
    val key = s"tok-$runTag-uni"
    val direct = CorpusOps.unigramVocab(corpus, vocabSize = 8,
      maxPieceLen = 2, emRounds = 1, seedSize = 16)
    val stored = TokenizerStore.ensureUnigramVocab(spark, key, corpus,
      vocabSize = 8, maxPieceLen = 2, emRounds = 1, seedSize = 16,
      snapshotId = Some("v1"))
    assert(stored.collect().map(_.toSeq).toSet ===
      direct.collect().map(_.toSeq).toSet)
    val encDirect = CorpusOps.unigramEncodeTokens(corpus, direct,
      maxPieceLen = 2).collect().map(_.toSeq).toSet
    val encStored = CorpusOps.unigramEncodeTokens(corpus, stored,
      maxPieceLen = 2).collect().map(_.toSeq).toSet
    assert(encStored === encDirect)
    // snapshotId trust: SAME id with DIFFERENT content serves the
    // stored artifact outright — the immutable-snapshot contract
    // (a content scan would retrain here)
    val mutated = Seq((1L, "totally different corpus now"))
      .toDF("doc_id", "text")
    val trusted = TokenizerStore.ensureUnigramVocab(spark, key,
      mutated, vocabSize = 8, maxPieceLen = 2, emRounds = 1,
      seedSize = 16, snapshotId = Some("v1"))
    assert(trusted.collect().map(_.toSeq).toSet ===
      stored.collect().map(_.toSeq).toSet)
    // a NEW id with the new content retrains and re-records
    val v2 = TokenizerStore.ensureUnigramVocab(spark, key, mutated,
      vocabSize = 8, maxPieceLen = 2, emRounds = 1, seedSize = 16,
      snapshotId = Some("v2"))
    assert(v2.filter(col("piece") === "aa").count() === 0L)
    TokenizerStore.drop(spark, key)
  }
}
