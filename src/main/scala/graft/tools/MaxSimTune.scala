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

    // sq8 mode: the quantized first stage's required shortlist — the
    // worst approx-MaxSim rank of any full-scan winner
    if (args.length > 1 && args(1) == "sq8") {
      import graft.functions.expressions.VectorExpressions.{dot_i8,
        max_abs, quantize_i8}
      import org.apache.spark.sql.expressions.Window
      val qi = graft.operators.SimilaritySearch.quantizeIndex(index,
        idCol = "doc_id", vecCol = "embedding")
      val qq = broadcast(qt.select(col("query_id"), col("qpos"),
        quantize_i8(col("qvec")).as("qcodes"),
        (max_abs(col("qvec")) / 127.0).as("qqscale"),
        graft.functions.VectorOps.l2Norm(col("qvec")).as("qqnorm")))
      val ranked = qi.crossJoin(qq)
        .withColumn("acos",
          when(col("qnorm") * col("qqnorm") === 0.0, lit(0.0))
            .otherwise(dot_i8(col("codes"), col("qcodes")).cast("double")
              * col("qscale") * col("qqscale")
              / (col("qnorm") * col("qqnorm"))))
        .groupBy("query_id", "doc_id", "qpos").agg(max("acos").as("mx"))
        .groupBy("query_id", "doc_id").agg(sum("mx").as("ascore"))
        .withColumn("arank", row_number().over(Window
          .partitionBy("query_id").orderBy(desc("ascore"), col("doc_id"))))
      val d2 = full.join(ranked, Seq("query_id", "doc_id"))
        .agg(max("arank")).head().getInt(0)
      println(s"MAXSIM_SQ8 n_docs=$nDocs required_mdocs=$d2")
    }

    // plaid mode: the clustered layout's required shortlist at a given
    // nProbe — the worst stage-1 rank of any full-scan winner — plus
    // the candidate fraction (probed chunk rows / full-scan chunk rows
    // per query batch), the scan win the partitioned layout exists for.
    // plaidq mode: the same measurement for the QUANTIZED stage 1 (the
    // stored int8 codes), certifying the q247 operating point.
    if (args.length > 1 &&
        (args(1) == "plaid" || args(1) == "plaidq")) {
      import graft.sources.PlaidIndex
      import org.apache.spark.sql.expressions.Window
      val nProbe = args.lift(2).flatMap(_.toIntOption).getOrElse(8)
      val lists = args.lift(3).flatMap(_.toIntOption).getOrElse(32)
      val key = s"$sfDir#plaidtune$lists"
      PlaidIndex.ensurePlaid(spark, key,
        index.select(col("doc_id"), col("chunk_id").as("vec_id"),
          col("embedding")), lists = lists, snapshotId = Some(sfDir))
      val h = PlaidIndex.openPlaid(spark, key)
      val stage1 = if (args(1) == "plaidq")
        PlaidIndex.plaidStage1Quantized(qt, h, nProbe)
      else PlaidIndex.plaidStage1(qt, h, nProbe)
      val ranked = stage1
        .withColumn("prank", row_number().over(Window
          .partitionBy("query_id")
          .orderBy(desc("ascore"), col("doc_id"))))
      val nWinners = full.count()
      val covered = full.join(ranked, Seq("query_id", "doc_id"))
        .localCheckpoint(true)
      val nCovered = covered.count()
      val depth =
        if (nCovered == 0) -1
        else covered.agg(max("prank")).head().getInt(0)
      val probes = PlaidIndex.plaidProbes(qt, h, nProbe)
        .localCheckpoint(true)
      val probedRows = h.lists.join(broadcast(probes),
        Seq("centroid_id")).count()
      val nQueries = probes.select("query_id").distinct().count()
      val fullRows = h.lists.count() * nQueries
      println(s"MAXSIM_${args(1).toUpperCase} n_docs=$nDocs " +
        s"lists=$lists nProbe=$nProbe " +
        s"winners_covered=$nCovered/$nWinners required_mdocs=$depth " +
        s"probed_rows=$probedRows full_rows=$fullRows " +
        f"fraction=${probedRows.toDouble / math.max(1L, fullRows)}%.4f")
    }
    spark.stop()
  }
}
