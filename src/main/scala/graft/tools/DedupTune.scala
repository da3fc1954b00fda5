package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup banding scale sweep (round-4 verdict item 3): measure how the
  * minhash and simhash band-bucket joins grow when the corpus is
  * replicated 10× / 100× — the same asserted-vs-measured closure AnnTune
  * gave the LSH-ANN candidate fraction. Run:
  *
  *   sbt "runMain graft.tools.DedupTune /root/testdata/sf0.01"
  *
  * Replication model: replica r > 0 of a document has every token
  * suffixed with `_r`, which preserves each replica-universe's internal
  * shingle/Jaccard structure exactly (true near-dup pairs scale linearly
  * with the factor) while making cross-replica shingles disjoint —
  * filler that repeats the corpus's own duplication structure rather
  * than colliding with it. What this deliberately does NOT model is
  * cross-document boilerplate concentrating into ubiquitous shingles
  * (the skew `ngramJaccard`'s doc-frequency cap exists for); the
  * measured quantity here is the banding key-space itself: candidate
  * pairs per doc, hot-bucket size, and verified output, vs n.
  *
  * Healthy banding ⇒ candidate pairs grow O(n) (fraction of all pairs
  * COLLAPSES ~1/n) and the hottest bucket stays bounded by the true
  * duplicate-cluster size, independent of n. Quadratic growth or a
  * hot bucket tracking n would mean the band join degenerates at scale.
  */
object DedupTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val mode = if (args.length > 1) args(1) else "bands"

    // `cosine` mode: recall/cost curve of the cluster-local below-floor
    // pairing (embeddingCosineClustered) vs the exact all-pairs set, at
    // the q34 threshold — picks the shipped (lists, assignTop) point
    // and the q77 recall floor.
    if (mode == "cosine") {
      // optional 3rd arg: replication factor — extends the measured
      // recall envelope beyond fixture n with the same jittered-replica
      // recipe AnnTune's scale mode uses (hash-derived uniform noise at
      // 2× per-component RMS; replica 0 untouched)
      val factor = if (args.length > 2) args(2).toInt else 1
      val baseEmb = Tables.load(spark, sfDir, "embeddings")
        .select("vec_id", "embedding")
      val nBaseV = baseEmb.count()
      val emb = (if (factor == 1) baseEmb else {
        val sigma = 2.0
        baseEmb.crossJoin(spark.range(factor).toDF("rep"))
          .select(
            (col("vec_id") + col("rep") * nBaseV).as("vec_id"),
            when(col("rep") === 0, col("embedding")).otherwise(
              transform(col("embedding"), (x, i) =>
                (x + lit(sigma)
                  * sqrt(aggregate(col("embedding"), lit(0.0d),
                      (a, e) => a + e * e) / size(col("embedding")))
                  * (hash(col("vec_id"), col("rep"), i).cast("double")
                    / Int.MaxValue)).cast("float")))
              .as("embedding"))
      }).cache()
      val n = emb.count()
      val threshold = 0.35
      def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("vec_id_a", "vec_id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairSet(Dedup.embeddingCosineExact(emb, threshold))
      println(s"n=$n factor=$factor threshold=$threshold " +
        s"exact_pairs=${exact.size}")
      val shipped = math.max(8L, n / 64).toInt
      val grid =
        if (factor == 1)
          for (l <- Seq(8, 16, 32); a <- Seq(2, 4)) yield (l, a)
        else Seq((shipped, 4), (math.max(8L, n / 32).toInt, 4))
      for ((lists, assignTop) <- grid) {
        val t0 = System.nanoTime()
        val got = pairSet(Dedup.embeddingCosineClustered(
          emb, threshold, lists, assignTop))
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = if (exact.isEmpty) 1.0
          else (exact & got).size.toDouble / exact.size
        val sound = (got -- exact).isEmpty
        println(f"lists=$lists%-4d top=$assignTop  recall=$recall%.3f " +
          f"sound=$sound found=${got.size}%-8d sec=$sec%.1f" +
          (if (lists == shipped) "  <- shipped point (n/64)" else ""))
      }
      spark.stop()
      return
    }

    // `cc` mode: rounds + wall time of min-label propagation vs the
    // alternating (large-star/small-star) connected components, on the
    // fixture's REAL near-dup pair graph and on adversarial chains of
    // growing depth — the measurement behind shipping both: propagation
    // wins on star-shaped near-dup clusters (diameter ≈ 2), alternating
    // is the answer once boilerplate chains make diameter grow with n.
    if (mode == "cc") {
      import spark.implicits._
      def measure(tag: String, pairs: DataFrame, propIter: Int,
          altIter: Int = 25): Unit = {
        val cached = pairs.cache(); cached.count()
        val t0 = System.nanoTime()
        val prop =
          try {
            val (labels, rounds) = Dedup.clustersWithRounds(cached, propIter)
            val n = labels.count()
            f"rounds=$rounds sec=${(System.nanoTime() - t0) / 1e9}%.1f nodes=$n"
          } catch {
            case _: IllegalStateException =>
              f"DNF(>$propIter rounds) sec=${(System.nanoTime() - t0) / 1e9}%.1f"
          }
        val t1 = System.nanoTime()
        val (altLabels, altRounds) =
          Dedup.clustersAlternatingWithRounds(cached, altIter)
        val nAlt = altLabels.count()
        println(f"$tag%-28s propagation: $prop%-36s " +
          f"alternating: rounds=$altRounds " +
          f"sec=${(System.nanoTime() - t1) / 1e9}%.1f nodes=$nAlt")
        cached.unpersist()
      }
      val docs0 = Tables.load(spark, sfDir, "documents")
        .select("doc_id", "text")
      measure("near-dup graph (fixture)",
        Dedup.ngramJaccard(docs0, k = 3, threshold = 0.12)
          .select("doc_id_a", "doc_id_b"), propIter = 10)
      for (depth <- Seq(64, 512, 4096)) {
        measure(s"chain depth=$depth",
          spark.range(depth).select((col("id") + 1).as("doc_id_a"),
            col("id").as("doc_id_b")), propIter = 20)
      }
      spark.stop()
      return
    }

    // `kw` mode: BM25 candidate growth under 10× / 100× corpus
    // replication (plain replication, fresh doc_ids — the "corpus grows
    // with similar content" shape, so df scales with the factor). The
    // measured claims the 100 TB lexical design rests on: postings are
    // O(n); per-query CANDIDATE FRACTION is scale-invariant (candidate
    // count grows linearly, like the ANN sweep); and the candidate join
    // stays broadcast-side (no corpus shuffle at query time against a
    // prebuilt postings frame).
    if (mode == "kw") {
      import graft.operators.KeywordSearch
      val docs0 = Tables.load(spark, sfDir, "documents")
        .select("doc_id", "text")
      val nB = docs0.count()
      val queries = graft.queries.PipelineQueries.retrievalQueryDf(spark)
      val nQ = queries.count()
      for (factor <- Seq(1, 10, 100)) {
        val big = (if (factor == 1) docs0
          else docs0.crossJoin(spark.range(factor).toDF("rep"))
            .select((col("doc_id") + col("rep") * nB).as("doc_id"),
              col("text"))).cache()
        val n = big.count()
        val post = KeywordSearch.bm25Postings(big).cache()
        val nPost = post.count()
        // candidate rows = postings matching any query term (the rows
        // the scoring aggregate actually touches)
        val qt = queries.select(
          explode(KeywordSearch.tokens(col("query_text"))).as("term"))
          .distinct()
        val cand = post.join(broadcast(qt), Seq("term")).count()
        // discarded warmup so the 1× row doesn't absorb codegen/JIT
        // first-run cost and fake a scaling anomaly
        KeywordSearch.bm25TopKFromPostings(queries, post, k = 5).count()
        val t0 = System.nanoTime()
        val topk = KeywordSearch.bm25TopKFromPostings(queries, post, k = 5)
        val nOut = topk.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"factor=$factor%-4d n=$n%-7d postings=$nPost%-9d " +
          f"postPerDoc=${nPost.toDouble / n}%.1f cand=$cand%-9d " +
          f"candFrac=${cand.toDouble / nPost}%.3f " +
          f"querySec=$sec%.2f topkRows=$nOut (expect ${nQ * 5})")
        post.unpersist(); big.unpersist()
      }
      spark.stop()
      return
    }

    // `curation` mode: the decontamination and dup-shingle scans under
    // 10× / 100× replication. Contamination uses PLAIN replication
    // (same text, fresh ids — every replica of a benchmark-overlapping
    // doc must be flagged): flagged docs must grow exactly linearly
    // while the benchmark side stays constant (it broadcasts — the
    // corpus-size-independent half of the join). The dup-shingle scan
    // uses SUFFIXED replication (per-replica token universes, the bands
    // model): rows grow linearly while mean dup_frac is scale-INVARIANT
    // — the per-replica duplication structure is preserved, so a
    // changing mean would mean the hash-join plan itself distorts
    // results with n.
    if (mode == "curation") {
      import graft.operators.CorpusOps
      val docs0 = Tables.load(spark, sfDir, "documents")
        .select("doc_id", "text")
      val nB = docs0.count()
      val bench = docs0.filter(col("doc_id") % 97 === 0)
        .select(concat_ws(" ", slice(split(col("text"), " "), 1, 12))
          .as("text")).cache()
      bench.count()
      var baseFlagged = -1L
      for (factor <- Seq(1, 10, 100)) {
        def replicate(suffixed: Boolean) =
          (if (factor == 1) docs0
          else docs0.crossJoin(spark.range(factor).toDF("rep"))
            .select((col("doc_id") + col("rep") * nB).as("doc_id"),
              (if (!suffixed) col("text")
              else when(col("rep") === 0, col("text")).otherwise(
                array_join(transform(split(col("text"), "\\s+"),
                  t => concat(t, lit("_"), col("rep"))), " ")))
                .as("text"))).cache()
        val plain = replicate(suffixed = false)
        val n = plain.count()
        CorpusOps.contamination(plain, bench).count() // discard warmup
        var t0 = System.nanoTime()
        val nFlag = CorpusOps.contamination(plain, bench).count()
        val cSec = (System.nanoTime() - t0) / 1e9
        if (factor == 1) baseFlagged = nFlag
        val sufx = replicate(suffixed = true)
        sufx.count()
        CorpusOps.dupShingleStats(sufx).agg(count(lit(1))).head() // warmup
        t0 = System.nanoTime()
        val row = CorpusOps.dupShingleStats(sufx)
          .agg(count(lit(1)), round(avg("dup_frac"), 4)).head()
        val dSec = (System.nanoTime() - t0) / 1e9
        println(f"factor=$factor%-4d n=$n%-7d " +
          f"contamFlagged=$nFlag%-6d (expect ${baseFlagged * factor}%-6d) " +
          f"contamSec=$cSec%5.2f  dupDocs=${row.getLong(0)}%-7d " +
          f"meanDupFrac=${row.getDouble(1)}%.4f dupSec=$dSec%5.2f")
        plain.unpersist(); sufx.unpersist()
      }
      spark.stop()
      return
    }

    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").cache()
    val nBase = docs.count()
    println(s"base_docs=$nBase sf=$sfDir")

    for (factor <- Seq(1, 10, 100)) {
      val big = (if (factor == 1) docs
        else docs.crossJoin(spark.range(factor).toDF("rep"))
          .select(
            (col("doc_id") + col("rep") * nBase).as("doc_id"),
            when(col("rep") === 0, col("text")).otherwise(
              array_join(transform(split(col("text"), "\\s+"),
                w => concat(w, lit("_"), col("rep"))), " ")).as("text"))
        ).cache()
      val n = big.count()

      // --- minhash at the shipped q32 point (32 hashes, r=2/b=16) ---
      val mhBanded = Dedup.minHashBandRows(
        Dedup.minHashSigned(big, k = 3, numHashes = 32), 32, 16).cache()
      val mhBuckets = mhBanded.groupBy("band", "bucket")
        .agg(count(lit(1)).as("sz")).agg(
          max("sz").as("hot"), count(lit(1)).as("n_buckets"))
        .collect()(0)
      // candidate pairs exactly as the operator generates them
      val a = mhBanded.select(col("band"), col("bucket"),
        col("doc_id").as("doc_id_a"))
      val b = mhBanded.select(col("band"), col("bucket"),
        col("doc_id").as("doc_id_b"))
      val mhCand = a.join(b, Seq("band", "bucket"))
        .filter(col("doc_id_a") < col("doc_id_b"))
        .select("doc_id_a", "doc_id_b")
        .dropDuplicates("doc_id_a", "doc_id_b").count()
      val mhOut = Dedup.minHashLsh(big, k = 3, numHashes = 32, bands = 16,
        threshold = 0.5).count()
      val allPairs = n.toDouble * (n - 1) / 2
      println(f"factor=$factor%-4d minhash  n=$n%-7d cand=$mhCand%-9d " +
        f"candPerDoc=${mhCand.toDouble / n}%.2f " +
        f"candFrac=${mhCand / allPairs}%.2e " +
        f"hotBucket=${mhBuckets.getLong(0)}%-5d verified=$mhOut")
      mhBanded.unpersist()

      // --- simhash at the shipped q33 point (4 pieces, hamming<=3) ---
      val shBanded = Dedup.simHashBandRows(big, pieces = 4).cache()
      val shBuckets = shBanded.groupBy("piece", "piece_val")
        .agg(count(lit(1)).as("sz")).agg(
          max("sz").as("hot"), count(lit(1)).as("n_buckets"))
        .collect()(0)
      val la = shBanded.select(col("piece"), col("piece_val"),
        col("doc_id").as("doc_id_a"))
      val lb = shBanded.select(col("piece"), col("piece_val"),
        col("doc_id").as("doc_id_b"))
      val shCand = la.join(lb, Seq("piece", "piece_val"))
        .filter(col("doc_id_a") < col("doc_id_b"))
        .select("doc_id_a", "doc_id_b")
        .dropDuplicates("doc_id_a", "doc_id_b").count()
      val shOut = Dedup.simHashDedup(big, maxHamming = 3, pieces = 4).count()
      println(f"factor=$factor%-4d simhash  n=$n%-7d cand=$shCand%-9d " +
        f"candPerDoc=${shCand.toDouble / n}%.2f " +
        f"candFrac=${shCand / allPairs}%.2e " +
        f"hotBucket=${shBuckets.getLong(0)}%-5d verified=$shOut")

      // q61's completeness invariant at the swept size: every pair with
      // hamming <= 3 must be in the simhash output (pigeonhole). The
      // exact all-pairs reference is O(n²) — run it up to 10× and skip
      // at 100× (1.25e9 pairs), where the pigeonhole argument is
      // structural and the measured quantities above are the point.
      if (factor <= 10) {
        val hashes = big.select(col("doc_id"), Dedup.simHash(col("text")).as("sh64"))
        val exact = hashes.select(col("doc_id").as("doc_id_a"), col("sh64").as("h_a"))
          .crossJoin(hashes.select(col("doc_id").as("doc_id_b"), col("sh64").as("h_b")))
          .filter(col("doc_id_a") < col("doc_id_b"))
          .filter(Dedup.hammingDist(col("h_a"), col("h_b")) <= 3)
          .count()
        println(f"factor=$factor%-4d simhash  exactPairs=$exact " +
          s"setEqual=${exact == shOut}")
        require(exact == shOut,
          s"simhash banding lost pairs at factor=$factor: $shOut != $exact")
      }
      shBanded.unpersist()
      big.unpersist()
    }
    spark.stop()
  }
}
