package graft.plans

import graft.{Tables, TestSpark}
import graft.operators.SimilaritySearch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ANN plan rewrite: exact-kNN crossJoin plans re-planned through the
  * bucketed LSH path, output-identical at the recall-1.0 operating point.
  */
class LshAnnPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def exactKnnDf(k: Int = 4): DataFrame = {
    val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("vec_id"))
    emb.crossJoin(broadcast(q))
      .withColumn("score",
        graft.functions.VectorOps.cosine(col("embedding"), col("query_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("score"), 6).as("score"))
  }

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("rewrite fires: no cartesian/nested-loop join in the physical plan") {
    LshAnnPlan.enable(spark)
    try {
      val plan = physical(exactKnnDf())
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      // the substituted path is there: bucket equi-join + bounded top-k
      assert(plan.contains("topkagg") || plan.contains("TopKAgg") ||
        plan.contains("top_k"), plan)
    } finally LshAnnPlan.disable(spark)
  }

  test("rewritten output is identical to the exact plan (recall 1.0)") {
    val exact = exactKnnDf().collect().map(_.toSeq).sortBy(_.toString)
    LshAnnPlan.enable(spark)
    try {
      val ann = exactKnnDf().collect().map(_.toSeq).sortBy(_.toString)
      assert(ann.length === exact.length)
      assert(ann.toSeq === exact.toSeq)
    } finally LshAnnPlan.disable(spark)
  }

  test("disabled session keeps the naive plan (rule is opt-in)") {
    LshAnnPlan.disable(spark)
    val plan = physical(exactKnnDf())
    assert(plan.contains("CartesianProduct") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("guard: non-top-k filters and other window shapes are not touched") {
    LshAnnPlan.enable(spark)
    try {
      val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      // rank ascending by score — not a top-k-by-similarity shape
      val w = Window.partitionBy("query_id").orderBy(asc("score"), asc("vec_id"))
      val df = emb.crossJoin(broadcast(q))
        .withColumn("score",
          graft.functions.VectorOps.cosine(col("embedding"), col("query_vec")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 4)
        .select("query_id", "rank", "vec_id", "score")
      val plan = physical(df)
      assert(plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally LshAnnPlan.disable(spark)
  }

  // ---- the two other naive kNN formulations the rule serves ----

  private def aggKnnDf(k: Int = 4): DataFrame = {
    import graft.functions.expressions.TopKAgg.top_k
    val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    emb.crossJoin(broadcast(q))
      .withColumn("score",
        graft.functions.VectorOps.cosine(col("embedding"), col("query_vec")))
      .groupBy("query_id")
      .agg(top_k(col("score"), col("vec_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as("vec_id"), round(col("hit.score"), 6).as("score"))
  }

  private def limitKnnDf(k: Int = 4): DataFrame = {
    val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    emb.crossJoin(broadcast(q))
      .withColumn("score",
        graft.functions.VectorOps.cosine(col("embedding"), col("query_vec")))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(k)
      .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
  }

  test("aggregate shape: rewrite fires and output is identical") {
    val exact = aggKnnDf().collect().map(_.toSeq).sortBy(_.toString)
    LshAnnPlan.enable(spark)
    try {
      val plan = physical(aggKnnDf())
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      val ann = aggKnnDf().collect().map(_.toSeq).sortBy(_.toString)
      assert(ann.toSeq === exact.toSeq)
    } finally LshAnnPlan.disable(spark)
  }

  test("aggregate shape with the cosine INLINED in top_k (no withColumn) " +
      "also rewrites, output-identical") {
    import graft.functions.expressions.TopKAgg.top_k
    def df: DataFrame = {
      val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      emb.crossJoin(broadcast(q))
        .groupBy("query_id")
        .agg(top_k(
          graft.functions.VectorOps.cosine(col("embedding"), col("query_vec")),
          col("vec_id"), 4).as("topk"))
        .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
        .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
          col("hit.id").as("vec_id"), round(col("hit.score"), 6).as("score"))
    }
    val exact = df.collect().map(_.toSeq).sortBy(_.toString)
    LshAnnPlan.enable(spark)
    try {
      val plan = physical(df)
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      val ann = df.collect().map(_.toSeq).sortBy(_.toString)
      assert(ann.toSeq === exact.toSeq)
    } finally LshAnnPlan.disable(spark)
  }

  test("global-limit shape: rewrite fires and output is identical") {
    val exact = limitKnnDf().collect().map(_.toSeq).sortBy(_.toString)
    LshAnnPlan.enable(spark)
    try {
      val plan = physical(limitKnnDf())
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      val ann = limitKnnDf().collect().map(_.toSeq).sortBy(_.toString)
      assert(ann.toSeq === exact.toSeq)
    } finally LshAnnPlan.disable(spark)
  }

  test("guard: a global limit without the deterministic vec_id tiebreak " +
      "is not touched") {
    LshAnnPlan.enable(spark)
    try {
      val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val df = emb.crossJoin(broadcast(q))
        .withColumn("score",
          graft.functions.VectorOps.cosine(col("embedding"), col("query_vec")))
        .orderBy(desc("score")) // ties unspecified — not the served shape
        .limit(4)
        .select("query_id", "vec_id", "score")
      val plan = physical(df)
      assert(plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally LshAnnPlan.disable(spark)
  }

  test("extension-injected rule: conf-gated rewrite via spark.sql.extensions") {
    import org.apache.spark.sql.SparkSession
    // a sibling session on the same context, with GraftExtensions applied
    // at instantiation (the cluster-deployment path)
    val prior = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // `spark.sql.extensions` is a STATIC conf — on a shared test
      // SparkContext it can't be injected via config(), so register the
      // same extension object through the builder API (the conf-string
      // path exercises identical code at real cluster startup)
      val s2 = SparkSession.builder()
        .master("local[8]")
        .withExtensions(new graft.GraftExtensions())
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      def knn = {
        import org.apache.spark.sql.functions._
        val emb = graft.Tables.load(s2, graft.TestSpark.Sf0001, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(desc("score"), asc("vec_id"))
        emb.crossJoin(broadcast(q))
          .withColumn("score",
            graft.functions.VectorOps.cosine(col("embedding"), col("query_vec")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 4)
          .select("query_id", "rank", "vec_id", "score")
      }
      // gate off: naive plan
      s2.conf.unset("spark.graft.ann.rewrite")
      assert(knn.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      // gate on: rewritten, exchanges are equi-join shaped
      s2.conf.set("spark.graft.ann.rewrite", "true")
      val plan = knn.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
      // spark.graft.ann.source routes onto the PERSISTED index — the
      // conf-only cluster twin of Config.persistedSource
      graft.sources.AnnIndex.ensureLsh(s2, graft.TestSpark.Sf0001,
        graft.Tables.load(s2, graft.TestSpark.Sf0001, "embeddings")
          .select("vec_id", "embedding"), tables = 64, bits = 12)
      s2.conf.set("spark.graft.ann.source", graft.TestSpark.Sf0001)
      val persistedPlan = knn.queryExecution.executedPlan.toString
      assert(persistedPlan.contains("graft_lsh_buckets_"), persistedPlan)
      s2.conf.unset("spark.graft.ann.source")
      // and the extension also registered the SQL functions
      assert(s2.sql("SELECT lsh_buckets(array(1.0F, 0.0F), 2, 4) AS b")
        .head().getSeq[Long](0).length === 2)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  test("guard: broadcast-index shapes (IVF centroid probing) are left alone") {
    LshAnnPlan.enable(spark)
    try {
      import graft.functions.VectorOps
      val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"),
          VectorOps.toDouble(col("embedding")).as("centroid_vec"))
      val cand = SimilaritySearch.ivfCandidates(q, emb, cents, nProbe = 2)
      // the probe-selection window (rank over cosine over a crossJoin with
      // the BROADCAST centroid set) must keep its exact top-nProbe plan
      val plan = cand.queryExecution.optimizedPlan.toString
      assert(!plan.toLowerCase.contains("lshbuckets"), plan)
      assert(cand.count() > 0)
    } finally LshAnnPlan.disable(spark)
  }

  test("rewrite agrees with SimilaritySearch.lshTopK at the same point") {
    val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val cfg = LshAnnPlan.Config()
    val direct = SimilaritySearch.lshTopK(q, emb, 4, cfg.tables, cfg.bits,
      cfg.probes).collect().map(_.toSeq).sortBy(_.toString)
    LshAnnPlan.enable(spark, cfg)
    try {
      val viaRule = exactKnnDf().collect()
        .map(r => Seq(r.get(0), r.get(1), r.get(2))).sortBy(_.toString)
      val directIds = direct.map(r => Seq(r(0), r(1), r(2))).sortBy(_.toString)
      assert(viaRule.toSeq === directIds.toSeq)
    } finally LshAnnPlan.disable(spark)
  }

  test("persistedSource: the rewritten plan reads the stored bucket table " +
      "and stays output-identical") {
    val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")
    graft.sources.AnnIndex.ensureLsh(spark, TestSpark.Sf0001,
      emb.select("vec_id", "embedding"), tables = 64, bits = 12)
    val exact = exactKnnDf().collect().map(_.toSeq).sortBy(_.toString)
    LshAnnPlan.enable(spark,
      LshAnnPlan.Config(persistedSource = Some(TestSpark.Sf0001)))
    try {
      val df = exactKnnDf()
      val plan = physical(df)
      assert(plan.contains("graft_lsh_buckets_"),
        s"expected the stored bucket table in the plan:\n$plan")
      assert(!plan.contains("CartesianProduct"), plan)
      val viaIndex = df.collect().map(_.toSeq).sortBy(_.toString)
      assert(viaIndex.toSeq === exact.toSeq)
    } finally LshAnnPlan.disable(spark)
  }

  test("persistedSource + inline-cosine aggregate shape: served from the " +
      "stored bucket table") {
    import graft.functions.expressions.TopKAgg.top_k
    val emb0 = Tables.load(spark, TestSpark.Sf0001, "embeddings")
    graft.sources.AnnIndex.ensureLsh(spark, TestSpark.Sf0001,
      emb0.select("vec_id", "embedding"), tables = 64, bits = 12)
    def df: DataFrame = {
      val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      emb.crossJoin(broadcast(q))
        .groupBy("query_id")
        .agg(top_k(
          graft.functions.VectorOps.cosine(col("embedding"), col("query_vec")),
          col("vec_id"), 4).as("topk"))
        .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
        .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
          col("hit.id").as("vec_id"), round(col("hit.score"), 6).as("score"))
    }
    val exact = df.collect().map(_.toSeq).sortBy(_.toString)
    LshAnnPlan.enable(spark,
      LshAnnPlan.Config(persistedSource = Some(TestSpark.Sf0001)))
    try {
      val plan = physical(df)
      assert(plan.contains("graft_lsh_buckets_"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
      val viaIndex = df.collect().map(_.toSeq).sortBy(_.toString)
      assert(viaIndex.toSeq === exact.toSeq)
    } finally LshAnnPlan.disable(spark)
  }

  test("guard: a global limit whose projection reads no query-side id " +
      "column is not touched") {
    LshAnnPlan.enable(spark)
    try {
      val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      // selects only (vec_id, score): no per-query grouping key for the
      // substitute to anchor on → the rule must leave the plan alone
      val df = emb.crossJoin(broadcast(q))
        .withColumn("score",
          graft.functions.VectorOps.cosine(col("embedding"), col("query_vec")))
        .orderBy(desc("score"), asc("vec_id"))
        .limit(4)
        .select("vec_id", "score")
      val plan = physical(df)
      assert(plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally LshAnnPlan.disable(spark)
  }

  test("persistedSource guard: a FILTERED index side falls back to the " +
      "in-memory path — the stored index must not resurrect excluded rows") {
    val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")
    def filteredKnn(): DataFrame = {
      val idx = emb.filter(col("vec_id") % 2 === 0)
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("vec_id"))
      idx.crossJoin(broadcast(q))
        .withColumn("score",
          graft.functions.VectorOps.cosine(col("embedding"), col("query_vec")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 4)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }
    val exact = filteredKnn().collect().map(_.toSeq).sortBy(_.toString)
    assert(exact.forall(r => r(2).asInstanceOf[Long] % 2 == 0))
    LshAnnPlan.enable(spark,
      LshAnnPlan.Config(persistedSource = Some(TestSpark.Sf0001)))
    try {
      val df = filteredKnn()
      val plan = physical(df)
      assert(!plan.contains("graft_lsh_buckets_"),
        s"filtered index side must not be served from the full index:\n$plan")
      val got = df.collect().map(_.toSeq).sortBy(_.toString)
      assert(got.toSeq === exact.toSeq)
    } finally LshAnnPlan.disable(spark)
  }

  test("persistedSource guard: a missing index falls back to the in-memory " +
      "path") {
    val exact = exactKnnDf().collect().map(_.toSeq).sortBy(_.toString)
    LshAnnPlan.enable(spark,
      LshAnnPlan.Config(persistedSource = Some("/tmp/no_such_graft_fixture")))
    try {
      val df = exactKnnDf()
      assert(!physical(df).contains("graft_lsh_buckets_"))
      assert(df.collect().map(_.toSeq).sortBy(_.toString).toSeq === exact.toSeq)
    } finally LshAnnPlan.disable(spark)
  }

  test("persistedSource guard: a scan of a DIFFERENT table under the same " +
      "source dir is NOT served from the index (recorded-path identity)") {
    val tmpDir = "/tmp/graft_guard_" + java.util.UUID.randomUUID.toString.take(8)
    val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select("vec_id", "embedding")
    emb.write.parquet(s"$tmpDir/embeddings.parquet")
    emb.filter(col("vec_id") % 2 === 0).write.parquet(s"$tmpDir/other.parquet")
    graft.sources.AnnIndex.ensureLsh(spark, tmpDir,
      spark.read.parquet(s"$tmpDir/embeddings.parquet"), tables = 64, bits = 12)
    def knnOver(path: String): DataFrame = {
      val idx = spark.read.parquet(path)
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("vec_id"))
      idx.crossJoin(broadcast(q))
        .withColumn("score",
          graft.functions.VectorOps.cosine(col("embedding"), col("query_vec")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 4)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }
    val exactOther = knnOver(s"$tmpDir/other.parquet").collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(exactOther.forall(r => r(2).asInstanceOf[Long] % 2 == 0))
    LshAnnPlan.enable(spark,
      LshAnnPlan.Config(persistedSource = Some(tmpDir)))
    try {
      // positive control: the indexed relation itself routes to the index
      assert(physical(knnOver(s"$tmpDir/embeddings.parquet"))
        .contains("graft_lsh_buckets_"))
      // the sibling table under the same dir must NOT — the stored index
      // answers for a different vector set (odd ids would resurrect)
      val df = knnOver(s"$tmpDir/other.parquet")
      assert(!physical(df).contains("graft_lsh_buckets_"),
        s"different table must not be served from the index:\n${physical(df)}")
      assert(df.collect().map(_.toSeq).sortBy(_.toString).toSeq ===
        exactOther.toSeq)
    } finally LshAnnPlan.disable(spark)
  }

  test("persistedSource guard: meta present but layout deleted falls back " +
      "instead of failing the query (NonFatal, not just IllegalArgument)") {
    val src = "graft-broken-" + java.util.UUID.randomUUID.toString.take(8)
    val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select("vec_id", "embedding")
    graft.sources.AnnIndex.ensureLsh(spark, src, emb, tables = 64, bits = 12)
    val tag = graft.sources.IndexStore.pathTag(src)
    // simulate a lost layout under a surviving meta in a fresh JVM:
    // parquet dirs gone, catalog registration gone, meta still there
    spark.sql(s"DROP TABLE IF EXISTS graft_lsh_buckets_$tag")
    spark.sql(s"DROP TABLE IF EXISTS graft_lsh_vecs_$tag")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"/tmp/graft_ann_lsh_$tag/buckets"))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"/tmp/graft_ann_lsh_$tag/vecs"))
    val exact = exactKnnDf().collect().map(_.toSeq).sortBy(_.toString)
    LshAnnPlan.enable(spark, LshAnnPlan.Config(persistedSource = Some(src)))
    try {
      val df = exactKnnDf() // must not throw AnalysisException
      assert(!physical(df).contains("graft_lsh_buckets_"))
      assert(df.collect().map(_.toSeq).sortBy(_.toString).toSeq === exact.toSeq)
    } finally LshAnnPlan.disable(spark)
  }
}
