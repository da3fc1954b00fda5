package graft.sources

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §4 bucketed layout: co-located joins on the bucket key carry zero
  * shuffle exchanges — the storage half of shuffle minimization.
  */
class BucketedLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(name)
    p.toFile.deleteOnExit()
    p.toString
  }

  test("bucketed-by-key self-join plans with zero exchanges") {
    val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")
    IndexStore.writeBucketed(emb.select("vec_id", "embedding"),
      "t_bucket_vecs", tmp("graft_bkt_v"), buckets = 4, key = "vec_id")
    IndexStore.writeBucketed(emb.select("vec_id", "label"),
      "t_bucket_labels", tmp("graft_bkt_l"), buckets = 4, key = "vec_id")
    val joined = IndexStore.readBucketed(spark, "t_bucket_vecs").hint("merge")
      .join(IndexStore.readBucketed(spark, "t_bucket_labels"), Seq("vec_id"))
      .select("vec_id", "label")
    val rows = joined.collect()
    assert(rows.length === emb.count())
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected exchange-free plan:\n$plan")
    assert(plan.contains("SortMergeJoin"), plan)
    // both scans report the bucket layout
    assert(plan.contains("SelectedBucketsCount"), plan)
  }

  test("the same join on plain parquet DOES shuffle (the layout is the win)") {
    val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")
    val a = emb.select("vec_id", "embedding")
    val b = emb.select("vec_id", "label")
    val joined = a.hint("merge").join(b, Seq("vec_id")).select("vec_id", "label")
    joined.collect()
    assert(joined.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("bucketed aggregation on the bucket key also avoids the shuffle") {
    val agg = IndexStore.readBucketed(spark, "t_bucket_vecs")
      .groupBy("vec_id").agg(count(lit(1)).as("n"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected exchange-free agg:\n$plan")
  }
}
