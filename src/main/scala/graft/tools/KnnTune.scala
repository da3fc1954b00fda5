package graft.tools

import graft.Tables
import graft.operators.{Dedup, KnnGraph}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** NN-Descent operating-point sweep: recall vs exact kNN graph per
  * round, at each (k, blockSize, maxDegree) — the measured table behind
  * the q226 recall floor (the AnnTune/DedupTune discipline: assert only
  * what was measured, with margin). Run:
  *
  *   sbt "runMain graft.tools.KnnTune /root/testdata/sf0.01"
  */
object KnnTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        math.max(16, cpus.toInt).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // `docs` as 2nd arg prefix: kNN graph over EMBEDDED DOCUMENT TEXT
    // (the structured real-world case) instead of the random-noise
    // embeddings fixture (the measured pathological case — within-label
    // and across-label cosine are identical there).
    val useDocs = args.length > 1 && args(1).startsWith("docs")
    val emb = (if (useDocs) {
      import graft.rag.Embedder
      Tables.load(spark, sfDir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id").as("vec_id"),
          Embedder.embedCol(col("text")).as("embedding"))
    } else Tables.load(spark, sfDir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism))
      .localCheckpoint(true)
    val n = emb.count()

    // nnonly: time each stage of the q226 body separately
    if (args.length > 1 && args(1).endsWith("nnonly")) {
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val base = timed("checkpoint-base") { emb }
      val sampled = base.filter(col("vec_id") % 5 === 0)
      val exact = timed("exact-sampled") {
        KnnGraph.exactGraph(base, 8, sources = Some(sampled))
          .select("src", "dst").localCheckpoint(true)
      }
      timed("exact-count") { exact.count() }
      val approx = timed("nnDescent-build+materialize") {
        KnnGraph.nnDescent(base, 8, rounds = 5, blockSize = 50,
          maxDegreeOpt = Some(24)).localCheckpoint(true)
      }
      timed("recall-join") {
        println(exact.join(approx.select("src", "dst"),
          Seq("src", "dst"), "left_semi").count())
      }
      spark.stop(); return
    }

    // search mode: graphSearch recall vs exact, per (beam, rounds)
    if (args.length > 1 && args(1).endsWith("search")) {
      // HELD-OUT protocol: query docs are excluded from the index (a
      // corpus-member query is degenerate — its own node seeds via LSH
      // and its exact out-edges ARE the answer; measured recall 1.0
      // at every operating point, i.e. no measurement at all)
      val q = emb.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec")).localCheckpoint(true)
      val idx = emb.filter(col("vec_id") % 25 =!= 0).localCheckpoint(true)
      val exact = graft.operators.SimilaritySearch
        .bruteForceTopK(q, idx, k = 4)
        .select("query_id", "vec_id").localCheckpoint(true)
      val nExact = exact.count()
      val tg0 = System.nanoTime()
      // `nnsearch`: the approximate (NN-Descent) graph — what the
      // persisted GraphIndex layout actually serves
      val graphE = (if (args(1).contains("nn"))
          KnnGraph.nnDescent(idx, 8, rounds = 4, blockSize = 50,
            maxDegreeOpt = Some(24))
        else KnnGraph.exactGraph(idx, 8))
        .select("src", "dst").localCheckpoint(true)
      println(f"SEARCH graph-build ${(System.nanoTime() - tg0) / 1e9}%.1f s")
      for (beam <- Seq(8, 16, 32); rounds <- Seq(2, 3, 4)) {
        val t0 = System.nanoTime()
        val got = KnnGraph.graphSearch(q, idx, graphE, k = 4,
          beam = beam, rounds = rounds).select("query_id", "vec_id")
        val hits = exact.join(got, Seq("query_id", "vec_id"), "left_semi")
          .count()
        println(f"SEARCH n=$n beam=$beam rounds=$rounds " +
          f"recall=${hits.toDouble / nExact}%.4f " +
          f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
      }
      spark.stop(); return
    }

    // gscale mode: graph-search recall as the INDEX GROWS 10×/100×
    // (the AnnTune `scale` recipe — replicas jittered with
    // deterministic hash noise so filler clusters around the corpus
    // instead of piling into duplicates; replica 0 untouched so the
    // held-out queries' true neighborhoods survive). This measures the
    // round-12 verdict's open question: does the shipped
    // (beam=32, rounds=3) point hold as n grows, and does LSH
    // entry-seed quality degrade — the evidence the flat-vs-
    // hierarchical entry decision needs.
    if (args.length > 1 && args(1).endsWith("gscale")) {
      val q = emb.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec")).localCheckpoint(true)
      val idx0 = emb.filter(col("vec_id") % 25 =!= 0).localCheckpoint(true)
      val n0 = idx0.count()
      for (factor <- Seq(1, 10, 100)) {
        val idx = (if (factor == 1) idx0 else {
          val sigma = 2.0
          idx0.crossJoin(spark.range(factor).toDF("rep"))
            .select(
              (col("vec_id") + col("rep") * n0 * 32).as("vec_id"),
              when(col("rep") === 0, col("embedding")).otherwise(
                transform(col("embedding"), (x, i) =>
                  (x + lit(sigma)
                    * sqrt(aggregate(col("embedding"), lit(0.0d),
                        (a, e) => a + e * e) / size(col("embedding")))
                    * (hash(col("vec_id"), col("rep"), i).cast("double")
                      / Int.MaxValue)).cast("float")))
                .as("embedding"))
        }).localCheckpoint(true)
        val nIdx = idx.count()
        val exact = graft.operators.SimilaritySearch
          .bruteForceTopK(q, idx, k = 4)
          .select("query_id", "vec_id").localCheckpoint(true)
        val nExact = exact.count()
        val tg = System.nanoTime()
        val graphE = KnnGraph.nnDescent(idx, 8, rounds = 4,
          blockSize = 50, maxDegreeOpt = Some(24))
          .select("src", "dst").localCheckpoint(true)
        val buildSec = (System.nanoTime() - tg) / 1e9
        // seed quality: fraction of queries whose LSH entry buckets
        // contain at least one true top-4 neighbor
        for ((beam, rounds, entryTables) <- Seq(
            (32, 3, 2), (32, 4, 2), (32, 3, 4), (64, 3, 2))) {
          val t0 = System.nanoTime()
          val got = KnnGraph.graphSearch(q, idx, graphE, k = 4,
            beam = beam, rounds = rounds, entryTables = entryTables)
            .select("query_id", "vec_id")
          val hits = exact.join(got, Seq("query_id", "vec_id"),
            "left_semi").count()
          println(f"GSCALE f=$factor%-3d n=$nIdx build=$buildSec%.0fs " +
            f"beam=$beam rounds=$rounds entry=$entryTables " +
            f"recall=${hits.toDouble / nExact}%.4f " +
            f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
        }
      }
      spark.stop(); return
    }

    // point mode: one (k, rounds, block, maxDegree) cell, recall per round
    if (args.length > 1 && args(1).endsWith("point")) {
      val k = args(2).toInt; val block = args(4).toInt
      val maxDeg = args(5).toInt
      val exact = KnnGraph.exactGraph(emb, k).select("src", "dst")
        .localCheckpoint(true)
      val nExact = exact.count()
      for (rounds <- 1 to args(3).toInt) {
        val t0 = System.nanoTime()
        val approx = KnnGraph.nnDescent(emb, k, rounds = rounds,
          blockSize = block, maxDegreeOpt = Some(maxDeg))
          .select("src", "dst")
        val hits = exact.join(approx, Seq("src", "dst"), "left_semi").count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"POINT n=$n k=$k rounds=$rounds block=$block deg=$maxDeg " +
          f"recall=${hits.toDouble / nExact}%.4f  (${secs}%.1f s)")
      }
      spark.stop(); return
    }

    for (k <- Seq(4, 6, 8)) {
      val exact = KnnGraph.exactGraph(emb, k).select("src", "dst")
        .localCheckpoint(true)
      val nExact = exact.count()
      for (rounds <- Seq(1, 2, 3, 4, 5); blockSize <- Seq(20, 30, 50)) {
        val t0 = System.nanoTime()
        val approx = KnnGraph.nnDescent(emb, k, rounds = rounds,
          blockSize = blockSize).select("src", "dst")
        val hits = exact.join(approx, Seq("src", "dst"), "left_semi").count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"n=$n k=$k rounds=$rounds block=$blockSize " +
          f"recall=${hits.toDouble / nExact}%.4f  (${secs}%.1f s)")
      }
    }
    // mutual-kNN clustering shape at the shipped point
    val g = KnnGraph.nnDescent(emb, 6, rounds = 4, blockSize = 30)
    val cl = Dedup.clustersAlternating(
      KnnGraph.mutualEdges(g, minScore = 0.0)
        .select("doc_id_a", "doc_id_b"))
    val summary = cl.groupBy("cluster_id").count()
      .agg(count(lit(1)).as("n_clusters"), max("count").as("max_size"))
      .head()
    println(s"mutual-kNN clusters: $summary")
    spark.stop()
  }
}
