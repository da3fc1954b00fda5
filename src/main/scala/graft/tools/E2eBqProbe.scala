package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch

/** Dev measurement: (nProbe, m) identity frontier of the composed
  * IVF-BQ path vs the float IVF at the same centroids, over REAL
  * chunk→embed(1536) hashing-trick vectors (the q193 fixture) — the
  * `AnnTune ivfbq` sweep for the end-to-end canary's operating point.
  * Usage: runMain graft.tools.E2eBqProbe <sfDir...>
  */
object E2eBqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val index = graft.rag.RagPipeline.buildIndex(spark,
          graft.Tables.load(spark, dir, "documents"),
          chunkSize = 200, dim = 1536)
        .select(col("chunk_id").as("vec_id"), col("embedding"))
        .localCheckpoint(true)
      println(s"$dir chunks=" + index.count())
      val q = index
        .filter(col("vec_id") < 80000 && col("vec_id") % 10000 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val cents = SimilaritySearch.kMeansCentroids(index, 8, 2)
        .localCheckpoint(true)
      val fl = SimilaritySearch.ivfTopK(q, index, cents, k = 4,
          nProbe = 4)
        .select("query_id", "rank", "vec_id").localCheckpoint(true)
      val exact = SimilaritySearch.bruteForceTopKAgg(q, index, k = 4)
        .select("query_id", "vec_id").localCheckpoint(true)
      for (m <- Seq(256, 1024, 4096, 16384)) {
        val bq = SimilaritySearch.ivfBqTopK(q, index, cents, k = 4,
            nProbe = 4, m = m)
          .select("query_id", "rank", "vec_id").localCheckpoint(true)
        val d = bq.exceptAll(fl).unionByName(fl.exceptAll(bq)).count()
        val rec = bq.join(exact, Seq("query_id", "vec_id"), "left_semi")
          .count()
        println(s"  m=$m n_diff_float=$d recall_hits=$rec/32")
      }
    }
    spark.stop()
  }
}
