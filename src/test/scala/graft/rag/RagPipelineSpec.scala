package graft.rag

import graft.{Tables, TestSpark}
import graft.queries.PipelineQueries
import org.scalatest.funsuite.AnyFunSuite

/** E2 retrieval paths: the ANN-index retriever must be output-identical
  * to the exact retriever at the shipped recall-1.0 operating point.
  */
class RagPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("retrieveAnn equals exact retrieve at the shipped operating point") {
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
    val index = RagPipeline.buildIndex(spark, docs, chunkSize = 200).cache()
    val queries = PipelineQueries.retrievalQueryDf(spark)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "chunk_id", "doc_id")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val exact = canon(RagPipeline.retrieve(queries, index, k = 4))
    val ann = canon(RagPipeline.retrieveAnn(queries, index, k = 4))
    assert(ann === exact)
    index.unpersist()
  }
}
