package graft

import graft.queries.{PipelineQueries, RelationalQueries}
import graft.rag.RagPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory of SURVEY.md §2 as named
  * DataFrame pipelines; `oracleSql` carries the DuckDB-equivalent SQL for
  * every SQL-expressible query (hash-based ops are rows-only and covered
  * by ScalaTest instead).
  */
object SparkEntry {

  /** Flagship: the reference's E2 retrieval path (chunk → embed → cosine
    * top-4) on sf0.001; driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val index = RagPipeline.buildIndex(spark, docs, chunkSize = 200)
    RagPipeline.retrieve(PipelineQueries.retrievalQueryDf(spark), index, k = 4)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ PipelineQueries.queries

  /** DuckDB-runnable ANSI SQL equivalents (same column names/aliases —
    * the driver's compare hashes column-name-sorted values).
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ PipelineQueries.oracles
}
