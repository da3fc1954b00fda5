package graft.sources

import graft.TestSpark
import graft.rag.RagPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** S1–S5 + O1: binary ingestion with error→"" extraction semantics, the
  * index store DDL/sidecar, and the content-hash incremental rebuild.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tempDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  test("S1-S3: binaryFile dir read extracts text; extraction errors yield empty string") {
    val dir = tempDir("graft_docs")
    Files.writeString(dir.resolve("a.txt"), "hello spark world")
    Files.writeString(dir.resolve("b.txt"), "second document")
    val df = DocumentSource.readBinaryDir(spark, dir.toString, "*.txt")
    val texts = df.select("text").collect().map(_.getString(0)).toSet
    assert(texts === Set("hello spark world", "second document"))
    // reference semantics AI.py:69-71: failure → "" (never a crash)
    assert(DocumentSource.extractText(null) === "")
  }

  test("S5: index DDL sidecar records dim and metric") {
    val dir = tempDir("graft_idx_meta")
    IndexStore.create(spark, dir.toString, dim = 64, metric = "cosine")
    assert(IndexStore.readMeta(dir.toString) === Some(IndexStore.Meta(64, "cosine")))
  }

  test("S4+O1: incremental rebuild only re-embeds changed documents") {
    import spark.implicits._
    val dir = tempDir("graft_idx")
    IndexStore.create(spark, dir.toString, dim = 64)
    var buildCalls = 0
    def build(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      buildCalls += 1
      RagPipeline.buildIndex(spark, docs.select("doc_id", "text"), chunkSize = 50)
        .join(docs.select("doc_id", "doc_hash"), Seq("doc_id"))
    }
    val v1 = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val idx1 = IndexStore.incremental(spark, v1, dir.toString)(build)
    val n1 = idx1.count()
    assert(n1 > 0)
    // second run, one doc changed, one unchanged
    val v2 = Seq((1L, "alpha beta gamma"), (2L, "CHANGED text here"))
      .toDF("doc_id", "text")
    val idx2 = IndexStore.incremental(spark, v2, dir.toString)(docs => {
      // only doc 2 must flow through the rebuild path
      assert(docs.select("doc_id").collect().map(_.getLong(0)).toSet === Set(2L))
      build(docs)
    })
    assert(idx2.filter(col("doc_id") === 1L).count() > 0) // carried over
    assert(idx2.filter(col("doc_id") === 2L).count() > 0) // rebuilt
    // unchanged corpus → zero docs rebuilt
    IndexStore.incremental(spark, v2, dir.toString)(docs => {
      assert(docs.isEmpty, "no docs should be rebuilt when nothing changed")
      build(docs)
    })
  }
}
