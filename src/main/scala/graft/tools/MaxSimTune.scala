package graft.tools

import graft.Tables
import graft.operators.LateInteraction
import graft.queries.PipelineQueries
import graft.rag.RagPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MaxSim two-stage operating point: for each fixture scale, the DEPTH
  * the mean-pooled first stage needs so its candidates contain every
  * MaxSim top-4 doc (the q229 identity point) — measured as the max
  * first-stage rank over all full-scan winners. Run:
  *
  *   sbt "runMain graft.tools.MaxSimTune /root/testdata/sf0.01"
  */
object MaxSimTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val index = RagPipeline.buildIndex(spark,
      Tables.load(spark, sfDir, "documents"), chunkSize = 200)
      .localCheckpoint(true)
    val nDocs = index.select("doc_id").distinct().count()
    val qt = LateInteraction.queryTokens(
      PipelineQueries.retrievalQueryDf(spark)).localCheckpoint(true)
    val full = LateInteraction.maxSimTopK(qt, index, k = 4)
      .select("query_id", "doc_id")
    // rank EVERY doc in the first stage, then find the winners' depth
    val fetchAll = LateInteraction.meanPoolCandidatesRanked(qt, index,
      nDocs.toInt)
    val depth = full.join(fetchAll, Seq("query_id", "doc_id"))
      .agg(max("fetch_rank")).head().getInt(0)
    println(s"MAXSIM n_docs=$nDocs required_depth=$depth")
    spark.stop()
  }
}
