package graft.tools

import graft.Tables
import graft.operators.{KnnGraph, SimilaritySearch}
import graft.queries.PipelineQueries
import graft.rag.RagPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q239 operating-point probe: the graph-served RAG surface vs exact
  * chunk kNN, swept over (build rounds, maxDegree, beam, search rounds,
  * entryTables) — the evidence for closing the round-12 sf0.1 single
  * miss (one winner chunk in a weak NN-Descent neighborhood).
  *
  * Usage: runMain graft.tools.GraphRagProbe <sfDir> \
  *          <buildRounds> <maxDegree> <beam> <searchRounds> <entryTables>
  */
object GraphRagProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val buildRounds = args.lift(1).flatMap(_.toIntOption).getOrElse(4)
    val maxDegree = args.lift(2).flatMap(_.toIntOption).getOrElse(24)
    val beam = args.lift(3).flatMap(_.toIntOption).getOrElse(32)
    val searchRounds = args.lift(4).flatMap(_.toIntOption).getOrElse(3)
    val entryTables = args.lift(5).flatMap(_.toIntOption).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        math.max(16, cpus.toInt).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val index = RagPipeline.buildIndex(spark,
      Tables.load(spark, sfDir, "documents"), chunkSize = 200)
      .select(col("chunk_id").as("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val q = PipelineQueries.retrievalQueryDf(spark)
      .select(col("query_id"),
        graft.rag.Embedder.embedCol(col("query_text")).as("query_vec"))
      .localCheckpoint(true)
    val exact = SimilaritySearch.bruteForceTopK(q, index, k = 4)
      .select("query_id", "vec_id").localCheckpoint(true)
    val nExact = exact.count()

    val graph = KnnGraph.nnDescent(index, k = 8, rounds = buildRounds,
      blockSize = 50, maxDegreeOpt = Some(maxDegree))
      .select("src", "dst").localCheckpoint(true)
    val served = KnnGraph.graphSearch(q, index, graph, k = 4,
      beam = beam, rounds = searchRounds, entryTables = entryTables)
      .select("query_id", "vec_id")
    val hits = exact.join(served, Seq("query_id", "vec_id"), "left_semi")
      .count()
    val missed = exact.join(served, Seq("query_id", "vec_id"), "left_anti")
      .collect().map(r => s"${r.getLong(0)}->${r.getLong(1)}")
    println(s"GRAPHRAG sf=$sfDir buildRounds=$buildRounds " +
      s"maxDegree=$maxDegree beam=$beam searchRounds=$searchRounds " +
      s"entryTables=$entryTables hits=$hits/$nExact " +
      s"missed=[${missed.mkString(",")}]")
    spark.stop()
  }
}
