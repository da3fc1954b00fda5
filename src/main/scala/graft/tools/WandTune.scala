package graft.tools

import graft.Tables
import graft.operators.KeywordSearch
import graft.queries.PipelineQueries
import graft.sources.ImpactIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Block-max WAND measurement: identity to the exhaustive BM25 ranking
  * plus the pruning ratio — the aggregate-input rows the exhaustive
  * path pays (Σ_t df_t per query) vs the candidate pairs and scored
  * rows WAND admits — and min-of-N serving times for both paths over
  * the PERSISTED layouts (postings+stats vs impact bands).
  *
  * Usage: runMain graft.tools.WandTune [sfDir] [runs] [k] [mode]
  * mode `skew` measures the q246 stopword-skewed corpus (one common
  * term in every doc, a rare one in doc_id%40==3) with its
  * "special common" query — the Zipf shape where the candidate cut
  * matters; default `uniform` is the fixtures' own documents table.
  */
object WandTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).flatMap(_.toIntOption).getOrElse(3)
    val k = args.lift(2).flatMap(_.toIntOption).getOrElse(5)
    val mode = args.lift(3).getOrElse("uniform")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = Tables.load(spark, sfDir, "documents")
    val docs = (if (mode == "skew")
        raw.select(col("doc_id"),
          concat(lit("common filler w"),
            (col("doc_id") % 7).cast("string"), lit(" w"),
            (col("doc_id") % 13).cast("string"),
            when(col("doc_id") % 40 === 3,
              concat(lit(" special token"), col("doc_id").cast("string")))
              .otherwise(lit(""))).as("text"))
      else raw.select("doc_id", "text")).cache()
    docs.count()
    val q = if (mode == "skew")
      spark.createDataFrame(Seq((1L, "special common")))
        .toDF("query_id", "query_text")
    else PipelineQueries.retrievalQueryDf(spark)
    val key = s"${sFDirKey(sfDir)}-$mode"
    ImpactIndex.ensureImpacts(spark, key, docs, snapshotId = Some(sfDir))
    graft.sources.KeywordIndex.ensurePostings(spark, key, docs,
      snapshotId = Some(sfDir))

    val fr = ImpactIndex.wandFrames(spark, key, q, k, p1Bands = 3)
    def keyd(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "doc_id", "score")
    val full = KeywordSearch.bm25TopK(q, docs, k).localCheckpoint(true)
    val nDiff = keyd(fr.result).exceptAll(keyd(full))
      .unionByName(keyd(full).exceptAll(keyd(fr.result))).count()
    val exhaustivePairs = fr.qterms.agg(coalesce(sum("df"), lit(0.0)))
      .head().getDouble(0).toLong
    val candDocs = fr.candidates.count()
    // rows actually entering the exact-scoring aggregate
    val h = ImpactIndex.openImpacts(spark, key)
    val scoredRows = h.impacts
      .join(broadcast(fr.qterms.select("query_id", "term")), Seq("term"))
      .join(broadcast(fr.candidates), Seq("query_id", "doc_id"),
        "left_semi").count()
    val blocksAll = h.blockmax
      .join(broadcast(fr.qterms.select("query_id", "term")), Seq("term"))
      .count()
    val blocksKept = fr.survivingBlocks.count()
    println(s"WAND sf=$sfDir k=$k n_diff=$nDiff " +
      s"exhaustive_pairs=$exhaustivePairs candidate_docs=$candDocs " +
      s"scored_rows=$scoredRows " +
      f"row_fraction=${scoredRows.toDouble / math.max(1L, exhaustivePairs)}%.4f " +
      s"blocks_kept=$blocksKept/$blocksAll")

    def time(label: String)(body: => Unit): Unit = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[wandtune] $label%-24s min=${times.min}%6.2f s " +
        f"(runs: ${times.map(t => f"$t%.2f").mkString(" ")})")
    }
    val post = graft.sources.KeywordIndex.openPostings(spark, key)
    val stats = graft.sources.KeywordIndex.statsFor(spark, key)
    time("exhaustive(postings)") {
      KeywordSearch.bm25TopKFromPostings(q, post, k, stats = stats)
        .queryExecution.toRdd.foreach(_ => ())
    }
    time("wand(impacts)") {
      ImpactIndex.wandTopK(spark, key, q, k)
        .queryExecution.toRdd.foreach(_ => ())
    }
    spark.stop()
  }

  private def sFDirKey(sfDir: String): String = s"$sfDir#wandtune"
}
