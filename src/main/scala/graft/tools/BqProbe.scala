package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch

/** Worst-case diagnostic behind q162's certified (k, m) point: builds
  * the q162 md5-jitter 1536-dim fixture at a given jitter scale
  * (args: sfDir sigma) and reports, per query, the HAMMING rank of
  * its worst true exact-kNN neighbor — the smallest m that would keep
  * output identity for that query. `AnnTune bq` sweeps (recall,
  * identity) per m; this shows WHERE the frontier sits and which
  * query pins it, which is what you tune m against (q162 ships
  * m = 256 ≥ 1.8× the worst rank measured at any fixture scale).
  */
object BqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.expressions.VectorExpressions.{hamming, sign_pack, tile_jitter}
    val emb = graft.Tables.load(spark, args(0), "embeddings")
    val sigma = args(1).toDouble
    val tiled = emb.select(col("vec_id"),
      tile_jitter(col("vec_id"), col("embedding"), reps = 24,
        sigma = sigma).as("embedding")).cache()
    val q = tiled.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = SimilaritySearch.bruteForceTopKAgg(q, tiled, 4)
      .select("query_id", "vec_id")
    // hamming rank of every exact hit
    val bi = tiled.select(col("vec_id"), sign_pack(col("embedding")).as("bc"))
    val bq = broadcast(q.select(col("query_id"), sign_pack(col("query_vec")).as("qc")))
    val ranked = bi.crossJoin(bq)
      .withColumn("h", hamming(col("bc"), col("qc")))
      .withColumn("hrank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("h").asc, col("vec_id").asc)))
    exact.join(ranked, Seq("query_id", "vec_id"))
      .groupBy("query_id").agg(max("hrank").as("worst_hrank"))
      .orderBy(desc("worst_hrank"))
      .show(8, false)
    spark.stop()
  }
}
