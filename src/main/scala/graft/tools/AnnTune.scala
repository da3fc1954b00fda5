package graft.tools

import graft.Tables
import graft.operators.SimilaritySearch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN operating-point tuner: prints recall@k vs the exact kNN and the
  * candidate fraction for a grid of LSH (tables × bits × probes) and IVF
  * (centroid set × nProbe) configurations on a fixture scale. Run:
  *
  *   sbt "runMain graft.tools.AnnTune /root/testdata/sf0.01"
  *
  * Used to choose the shipped defaults (recall ≥ 0.9 at candidate
  * fraction < 30%) and the recall-1.0 point the ANN plan rewrite uses.
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.load(spark, sfDir, "embeddings").cache()
    val nIndex = emb.count()
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .cache()
    val nQueries = q.count()
    val k = 4

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    def ranked(df: DataFrame): Set[(Long, Int, Long)] =
      df.select("query_id", "rank", "vec_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    val exact = pairs(SimilaritySearch.bruteForceTopK(q, emb, k))
    println(s"index=$nIndex queries=$nQueries exact_hits=${exact.size}")

    def report(name: String, cand: DataFrame, topk: DataFrame): Unit = {
      val nCand = cand.count()
      val got = pairs(topk)
      val recall = (exact & got).size.toDouble / exact.size
      val frac = nCand.toDouble / (nQueries * nIndex)
      println(f"$name%-34s recall=$recall%.3f candFrac=$frac%.3f nCand=$nCand")
    }

    val mode = if (args.length > 1) args(1) else "all"

    // "scale": measure the LSH occupancy claim (LshAnnPlan: candidates
    // per probe scale as n/2^bits) on synthetically grown indexes —
    // each replica r>0 of a vector is jittered with deterministic
    // hash-derived uniform noise at 2x the vector's per-component RMS
    // (cos(original, replica) ~ 0.65: filler that clusters around the
    // real corpus the way real data does, NOT exact duplicates that
    // would pile into the same buckets). Replica 0 is untouched, so the
    // query set and its true neighborhood structure survive. Reports
    // candidate fraction + recall for the shipped q36 (64x12x16) and
    // q59 (64x12x48) operating points at each size, plus the
    // bits-raised points that restore per-bucket occupancy at scale.
    if (mode == "scale") {
      for (factor <- Seq(1, 10, 100)) {
        val big = (if (factor == 1) emb else {
          val sigma = 2.0
          emb.crossJoin(spark.range(factor).toDF("rep"))
            .select(
              (col("vec_id") + col("rep") * nIndex).as("vec_id"),
              when(col("rep") === 0, col("embedding")).otherwise(
                transform(col("embedding"), (x, i) =>
                  (x + lit(sigma)
                    * sqrt(aggregate(col("embedding"), lit(0.0d),
                        (a, e) => a + e * e) / size(col("embedding")))
                    * (hash(col("vec_id"), col("rep"), i).cast("double")
                      / Int.MaxValue)).cast("float")))
                .as("embedding"))
        }).cache()
        val n = big.count()
        val exactBig = pairs(SimilaritySearch.bruteForceTopKAgg(q, big, k))
        println(s"scale factor=$factor n=$n exact_hits=${exactBig.size}")
        for ((tables, bits, probes) <- Seq(
            (64, 12, 16), (64, 12, 48), (64, 14, 16), (64, 16, 16))) {
          val t0 = System.nanoTime()
          val nCand = SimilaritySearch
            .lshCandidates(q, big, tables, bits, probes).count()
          val got = pairs(
            SimilaritySearch.lshTopK(q, big, k, tables, bits, probes))
          val recall = (exactBig & got).size.toDouble / exactBig.size
          val frac = nCand.toDouble / (nQueries * n)
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"scale f=$factor%-3d t=$tables b=$bits p=$probes%-2d " +
            f"recall=$recall%.3f candFrac=$frac%.4f nCand=$nCand sec=$sec%.1f")
        }
        big.unpersist()
      }
    }

    // "dim": measure the shipped operating points at the REFERENCE's
    // dimensionality (1536, /root/reference/AI.py:51) instead of the
    // 64-dim fixture. The 1536-dim set tiles each fixture vector 24×
    // and jitters every tile with deterministic hash-derived uniform
    // noise at 0.25x the vector's per-component RMS: ambient dim is
    // genuinely 1536 (every hyperplane projection mixes all 1536
    // components), while the intrinsic dimensionality stays ~64 — the
    // shape real text embeddings have (ambient 1536, intrinsic ~tens).
    // Tiling preserves the fixture's neighborhood structure (each tile
    // contributes the same inner product, jitter perturbs cosines by
    // O(sigma)), so recall is measured against a meaningful exact
    // top-k rather than pure-noise neighbors that nothing can recall.
    if (mode == "dim") {
      val reps = if (args.length > 2) args(2).toInt else 24 // 24*64 = 1536
      val sigma = 0.25
      val rms = sqrt(aggregate(col("embedding"), lit(0.0d),
        (a, e) => a + e * e) / size(col("embedding")))
      val big = emb.select(col("vec_id"),
        flatten(transform(sequence(lit(0), lit(reps - 1)), r =>
          transform(col("embedding"), (x, i) =>
            (x + lit(sigma) * rms
              * (hash(col("vec_id"), r, i).cast("double") / Int.MaxValue))
              .cast("float")))).as("embedding")).cache()
      val dim = big.select(size(col("embedding"))).head().getInt(0)
      val qd = big.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec")).cache()
      val exactD = pairs(SimilaritySearch.bruteForceTopKAgg(qd, big, k))
      println(s"dim=$dim n=$nIndex exact_hits=${exactD.size}")
      for ((tables, bits, probes) <- Seq(
          (64, 12, 16), (64, 12, 48), (64, 14, 16), (96, 12, 16),
          (64, 10, 16), (64, 12, 32))) {
        val t0 = System.nanoTime()
        val nCand = SimilaritySearch
          .lshCandidates(qd, big, tables, bits, probes).count()
        val got = pairs(
          SimilaritySearch.lshTopK(qd, big, k, tables, bits, probes))
        val recall = (exactD & got).size.toDouble / exactD.size
        val frac = nCand.toDouble / (nQueries * nIndex)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"dim$dim lsh t=$tables b=$bits p=$probes%-2d " +
          f"recall=$recall%.3f candFrac=$frac%.4f nCand=$nCand sec=$sec%.1f")
      }
      for ((kC, nProbe) <- Seq((64, 16), (64, 24), (64, 32))) {
        val t0 = System.nanoTime()
        val cents = SimilaritySearch.kMeansCentroids(big, kC, iters = 5).cache()
        cents.count()
        val nCand = SimilaritySearch.ivfCandidates(qd, big, cents, nProbe).count()
        val got = pairs(SimilaritySearch.ivfTopK(qd, big, cents, k, nProbe))
        val recall = (exactD & got).size.toDouble / exactD.size
        val frac = nCand.toDouble / (nQueries * nIndex)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"dim$dim ivf k=$kC nProbe=$nProbe%-2d " +
          f"recall=$recall%.3f candFrac=$frac%.4f nCand=$nCand sec=$sec%.1f")
        cents.unpersist()
      }
      big.unpersist()
    }

    // "sq8": smallest re-rank candidate count m at which the int8
    // quantized scan is output-IDENTICAL to the exact kNN (the q103/q105
    // operating-point evidence), at the fixture's 64 dims and at the
    // reference's 1536 (tile-and-jitter construction of the "dim" mode:
    // ambient 1536, intrinsic ~64 — quantization error grows with
    // ambient dim, so this is the conservative measurement).
    if (mode == "sq8") {
      def sweep(label: String, idx: DataFrame, qs: DataFrame): Unit = {
        val ex = pairs(SimilaritySearch.bruteForceTopKAgg(qs, idx, k))
        for (m <- Seq(4, 8, 16, 32)) {
          val t0 = System.nanoTime()
          val got = pairs(SimilaritySearch.quantizedTopK(qs, idx, k, m))
          val recall = (ex & got).size.toDouble / ex.size
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"sq8 $label m=$m%-3d recall=$recall%.3f " +
            f"identical=${got == ex}%-5s sec=$sec%.1f")
        }
      }
      sweep(s"dim64 n=$nIndex", emb, q)
      val reps = 24
      val sigma = 0.25
      val rms = sqrt(aggregate(col("embedding"), lit(0.0d),
        (a, e) => a + e * e) / size(col("embedding")))
      val big = emb.select(col("vec_id"),
        flatten(transform(sequence(lit(0), lit(reps - 1)), r =>
          transform(col("embedding"), (x, i) =>
            (x + lit(sigma) * rms
              * (hash(col("vec_id"), r, i).cast("double") / Int.MaxValue))
              .cast("float")))).as("embedding")).cache()
      val qd = big.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec")).cache()
      sweep(s"dim${64 * reps} n=$nIndex", big, qd)
      big.unpersist(); qd.unpersist()
    }

    // "bq": binary (1-bit) quantization operating points — the m
    // frontier where the Hamming shortlist + exact re-rank reaches
    // output identity to exact kNN (the q162 evidence), on the 64-dim
    // fixture AND at the reference's 1536 ambient dim (tiled+jittered
    // like the sq8/pqdim sweeps: more bits per code = a finer Hamming
    // ranking, the regime binary quantization is actually used in).
    if (mode == "bq") {
      def sweep(label: String, idx: DataFrame, qs: DataFrame): Unit = {
        val ex = pairs(SimilaritySearch.bruteForceTopKAgg(qs, idx, k))
        val exR = ranked(SimilaritySearch.bruteForceTopKAgg(qs, idx, k))
        for (m <- Seq(16, 64, 128, 256, 512)) {
          val t0 = System.nanoTime()
          val topk = SimilaritySearch.binaryTopK(qs, idx, k, m)
          val got = pairs(topk)
          val recall = (ex & got).size.toDouble / ex.size
          val identical = ranked(topk) == exR
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"bq $label m=$m%-4d recall=$recall%.3f " +
            f"identical=$identical%-5s sec=$sec%.1f")
        }
      }
      sweep(s"dim64 n=$nIndex", emb, q)
      // two jitter scales at 1536: 0.25× rms tiles are sign-copies of
      // the base (information-poor bits — the failure shape), 2× rms
      // flips ~40% of tile bits independently (the q162 fixture)
      val reps = 24
      for (sigma <- Seq(0.25, 2.0)) {
        val rms = sqrt(aggregate(col("embedding"), lit(0.0d),
          (a, e) => a + e * e) / size(col("embedding")))
        val big = emb.select(col("vec_id"),
          flatten(transform(sequence(lit(0), lit(reps - 1)), r =>
            transform(col("embedding"), (x, i) =>
              (x + lit(sigma) * rms
                * (hash(col("vec_id"), r, i).cast("double") / Int.MaxValue))
                .cast("float")))).as("embedding")).cache()
        val qd = big.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec")).cache()
        sweep(s"dim1536 sigma=$sigma n=$nIndex", big, qd)
        big.unpersist(); qd.unpersist()
      }
    }

    // "rot": what the PCA/OPQ-style rotation buys a downstream
    // quantizer — the energy spectrum before/after (top-d' energy
    // share), SQ8 reconstruction MSE plain vs rotated, and the
    // truncated-dim identity frontier in the rotated basis (the MRL
    // serving shape on arbitrary embeddings: rotation front-loads
    // energy the way MRL training does).
    if (mode == "rot") {
      val model = SimilaritySearch.rotationModel(emb)
      val tot = model.eigvals.sum
      for (dp <- Seq(8, 16, 32)) {
        val share = model.eigvals.take(dp).sum / tot
        println(f"rot spectrum top$dp/${model.dim} energy=$share%.3f")
      }
      val rot = SimilaritySearch.rotate(emb, model).cache()
      rot.count()
      // SQ8 MSE: mean squared (x - dequant(quant(x))) per component
      def mse(idx: DataFrame): Double = {
        import graft.functions.expressions.VectorExpressions.max_abs
        val d = idx.withColumn("s", max_abs(col("embedding")) / 127.0)
          .select(avg(aggregate(col("embedding"), lit(0.0d),
            (acc, x) => {
              val q = round(x.cast("double") / col("s"))
              val e = x.cast("double") - q * col("s")
              acc + e * e
            }) / size(col("embedding"))))
        d.head().getDouble(0)
      }
      println(f"rot sq8_mse plain=${mse(emb)}%.6g rotated=${mse(rot)}%.6g")
      val exR = ranked(SimilaritySearch.bruteForceTopKAgg(q, emb, k))
      val qrot = rot.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec")).cache()
      for (dp <- Seq(8, 16, 32); m <- Seq(16, 32)) {
        val got = ranked(
          SimilaritySearch.truncatedTopK(qrot, rot, k, d = dp, m = m))
        println(f"rot trunc d=$dp%-3d m=$m%-3d identical=${got == exR}")
      }
      rot.unpersist(); qrot.unpersist()

      // RECOVERY control: the flat fixture has no axis-aligned energy
      // to find (negative control above). Build the front-loaded
      // spectrum (0.8^i — the mrlfl shape), HIDE it with a fixed
      // deterministic orthogonal mix Q, and check rotationModel
      // recovers the compaction from the scrambled corpus alone —
      // spectrum share and the truncated-basis identity frontier
      // should match the unscrambled front-loaded fixture's.
      val fl = emb.select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x * pow(lit(0.8), i)).cast("float")).as("embedding"))
      val dmix = 64
      val m0 = Array.tabulate(dmix * dmix) { kk =>
        val i = kk / dmix; val j = kk % dmix
        math.sin(i * 7919.0 + j * 104729.0) +
          math.sin(j * 7919.0 + i * 104729.0)
      }
      val (_, qcols) = SimilaritySearch.jacobiEig(m0, dmix)
      val qrows = Array.tabulate(dmix * dmix)(kk =>
        qcols((kk % dmix) * dmix + kk / dmix))
      val mixModel = SimilaritySearch.RotationModel(
        qrows, Array.fill(dmix)(0.0), dmix)
      val scrambled = SimilaritySearch.rotate(fl, mixModel).cache()
      scrambled.count()
      val rec = SimilaritySearch.rotationModel(scrambled)
      val rtot = rec.eigvals.sum
      for (dp <- Seq(8, 16, 32)) {
        val share = rec.eigvals.take(dp).sum / rtot
        println(f"rot recovered spectrum top$dp/64 energy=$share%.3f")
      }
      val unscr = SimilaritySearch.rotate(scrambled, rec).cache()
      val qs = unscr.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val exS = ranked(SimilaritySearch.bruteForceTopKAgg(qs, unscr, k))
      for (dp <- Seq(8, 16); m <- Seq(16, 32)) {
        val got = ranked(
          SimilaritySearch.truncatedTopK(qs, unscr, k, d = dp, m = m))
        println(f"rot recovered trunc d=$dp%-3d m=$m%-3d " +
          f"identical=${got == exS}")
      }
      scrambled.unpersist(); unscr.unpersist()
    }

    // "opq": rotate-then-PQ vs plain PQ at EQUAL BYTES on the
    // scrambled front-loaded fixture (energy deliberately off-axis —
    // plain PQ's worst case, the q221 serving fixture). Reports, per
    // (numSub, ksub): ADC-score MSE vs the true cosine (the
    // quantization-fidelity number the rotation buys) and recall/
    // identity across the m sweep for both variants.
    if (mode == "opq") {
      val fl = emb.select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x * pow(lit(0.8), i)).cast("float")).as("embedding"))
      val dmix = 64
      val m0 = Array.tabulate(dmix * dmix) { kk =>
        val i = kk / dmix; val j = kk % dmix
        math.sin(i * 7919.0 + j * 104729.0) +
          math.sin(j * 7919.0 + i * 104729.0)
      }
      val (_, qcols) = SimilaritySearch.jacobiEig(m0, dmix)
      val qrows = Array.tabulate(dmix * dmix)(kk =>
        qcols((kk % dmix) * dmix + kk / dmix))
      val mixModel = SimilaritySearch.RotationModel(
        qrows, Array.fill(dmix)(0.0), dmix)
      val scrambled = SimilaritySearch.rotate(fl, mixModel)
        .withColumn("embedding", col("embedding").cast("array<float>"))
        .cache()
      scrambled.count()
      val qs = scrambled.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec")).cache()
      val exS = pairs(SimilaritySearch.bruteForceTopKAgg(qs, scrambled, k))
      val rec = SimilaritySearch.rotationModel(scrambled)
      // the SHIPPED rotation: PCA rows permuted by the parametric-OPQ
      // eigenvalue allocation (per numSub); the unbalanced PCA variant
      // is also measured below as the negative control
      def permuted(numSub: Int): SimilaritySearch.RotationModel = {
        val d = rec.dim
        val order = SimilaritySearch.balancedOrder(rec.eigvals, numSub)
        val rot = new Array[Double](d * d)
        (0 until d).foreach(r => System.arraycopy(
          rec.rot, order(r) * d, rot, r * d, d))
        SimilaritySearch.RotationModel(rot,
          order.map(rec.eigvals), d)
      }
      def rotatedPair(model: SimilaritySearch.RotationModel)
          : (DataFrame, DataFrame) = {
        val idx = SimilaritySearch.rotate(scrambled, model)
          .withColumn("embedding",
            col("embedding").cast("array<float>")).cache()
        idx.count()
        val qq = idx.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec")).cache()
        (idx, qq)
      }
      // ADC-score fidelity: mean squared (adc cosine − true cosine)
      // over every (query, vector) pair in the given space
      def adcMse(idx: DataFrame, qq: DataFrame, numSub: Int,
          ksub: Int): Double = {
        import graft.functions.expressions.PqExpressions.{pq_adc_dot, pq_encode, pq_table}
        val cb = SimilaritySearch.pqCodebooks(idx, numSub, ksub, 2)
        val flat = SimilaritySearch.collectCodebook(cb, numSub, ksub)
        val enc = idx.select(col("vec_id"),
          pq_encode(col("embedding"), flat, numSub, ksub).as("pqcodes"),
          graft.functions.VectorOps.l2Norm(col("embedding")).as("pnorm"),
          col("embedding"))
        enc.crossJoin(broadcast(qq.select(col("query_id"),
            pq_table(col("query_vec"), flat, numSub, ksub).as("adc"),
            graft.functions.VectorOps.l2Norm(col("query_vec"))
              .as("qqnorm"),
            col("query_vec"))))
          .withColumn("ascore",
            when(col("pnorm") * col("qqnorm") === 0.0, lit(0.0))
              .otherwise(pq_adc_dot(col("pqcodes"), col("adc"))
                / (col("pnorm") * col("qqnorm"))))
          .withColumn("tscore", graft.functions.VectorOps.cosine(
            col("embedding"), col("query_vec")))
          .agg(avg(org.apache.spark.sql.functions.pow(
            col("ascore") - col("tscore"), 2)))
          .head().getDouble(0)
      }
      for ((numSub, ksub) <- Seq((16, 64), (32, 64))) {
        val (rotIdx, rotQ) = rotatedPair(permuted(numSub))
        val (pcaIdx, pcaQ) = rotatedPair(rec) // unbalanced control
        val msePlain = adcMse(scrambled, qs, numSub, ksub)
        val msePca = adcMse(pcaIdx, pcaQ, numSub, ksub)
        val mseOpq = adcMse(rotIdx, rotQ, numSub, ksub)
        println(f"opq numSub=$numSub%-3d ksub=$ksub adc_mse " +
          f"plain=$msePlain%.6g pca_unbalanced=$msePca%.6g " +
          f"opq_balanced=$mseOpq%.6g win=${msePlain / mseOpq}%.1fx " +
          f"(equal bytes/vec=$numSub)")
        val cbP = SimilaritySearch.pqCodebooks(scrambled, numSub, ksub, 2)
          .cache()
        cbP.count()
        val cbO = SimilaritySearch.pqCodebooks(rotIdx, numSub, ksub, 2)
          .cache()
        cbO.count()
        for (m <- Seq(32, 64, 128)) {
          val gotP = pairs(SimilaritySearch.pqTopK(qs, scrambled, k, m,
            numSub, ksub, 2, codebooks = Some(cbP)))
          val gotO = pairs(SimilaritySearch.pqTopK(rotQ, rotIdx, k, m,
            numSub, ksub, 2, codebooks = Some(cbO)))
          val rP = (exS & gotP).size.toDouble / exS.size
          val rO = (exS & gotO).size.toDouble / exS.size
          println(f"opq numSub=$numSub%-3d ksub=$ksub m=$m%-4d " +
            f"plain recall=$rP%.3f identical=${gotP == exS}%-5s | " +
            f"opq recall=$rO%.3f identical=${gotO == exS}")
        }
        cbP.unpersist(); cbO.unpersist()
        rotIdx.unpersist(); rotQ.unpersist()
        pcaIdx.unpersist(); pcaQ.unpersist()
      }
      scrambled.unpersist(); qs.unpersist()
    }

    // "pq": product-quantization operating points — for a grid of
    // (numSub, ksub, m), whether the ADC scan + exact re-rank is
    // output-IDENTICAL to the exact kNN (the q115 evidence), plus the
    // bytes-per-vector compression each point buys. Codebooks train
    // once per (numSub, ksub) and are reused across the m sweep — the
    // index-once/query-many shape pqTopK's `codebooks` param exists for.
    if (mode == "pq") {
      val ex = pairs(SimilaritySearch.bruteForceTopKAgg(q, emb, k))
      for ((numSub, ksub) <- Seq((8, 16), (8, 64), (16, 16), (16, 64),
          (32, 16))) {
        val cb = SimilaritySearch.pqCodebooks(emb, numSub, ksub, iters = 5)
          .cache()
        cb.count()
        for (m <- Seq(16, 32, 64, 128)) {
          val t0 = System.nanoTime()
          val got = pairs(SimilaritySearch.pqTopK(q, emb, k, m, numSub,
            ksub, iters = 5, codebooks = Some(cb)))
          val recall = (ex & got).size.toDouble / ex.size
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"pq numSub=$numSub%-3d ksub=$ksub%-3d m=$m%-4d " +
            f"recall=$recall%.3f identical=${got == ex}%-5s " +
            f"bytes/vec=$numSub sec=$sec%.1f")
        }
        cb.unpersist()
      }
    }

    // "pqiters": Lloyd-round sensitivity at the shipped (numSub=16,
    // ksub=64) point — the smallest iteration count whose codebook
    // still yields output-identity (training cost is the PQ bench
    // term; fewer certified rounds = cheaper q115).
    if (mode == "pqiters") {
      val ex = pairs(SimilaritySearch.bruteForceTopKAgg(q, emb, k))
      for (iters <- Seq(1, 2, 3, 5)) {
        val cb = SimilaritySearch.pqCodebooks(emb, 16, 64, iters).cache()
        cb.count()
        for (m <- Seq(32, 64)) {
          val t0 = System.nanoTime()
          val got = pairs(SimilaritySearch.pqTopK(q, emb, k, m, 16, 64,
            iters, codebooks = Some(cb)))
          val recall = (ex & got).size.toDouble / ex.size
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"pqiters iters=$iters%-2d m=$m%-4d recall=$recall%.3f " +
            f"identical=${got == ex}%-5s sec=$sec%.1f")
        }
        cb.unpersist()
      }
    }

    // "pqdim": PQ at the reference's ambient 1536 dims (the sq8 mode's
    // tile-and-jitter construction — ambient 1536, intrinsic ~64, the
    // conservative case) — certifies the numSub=96 layout the docs
    // quote as the 64× point, plus numSub=48 (128×).
    if (mode == "pqdim") {
      val reps = 24
      val sigma = 0.25
      val rms = sqrt(aggregate(col("embedding"), lit(0.0d),
        (a, e) => a + e * e) / size(col("embedding")))
      val big = emb.select(col("vec_id"),
        flatten(transform(sequence(lit(0), lit(reps - 1)), r =>
          transform(col("embedding"), (x, i) =>
            (x + lit(sigma) * rms
              * (hash(col("vec_id"), r, i).cast("double") / Int.MaxValue))
              .cast("float")))).as("embedding")).cache()
      val qd = big.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec")).cache()
      val ex = pairs(SimilaritySearch.bruteForceTopKAgg(qd, big, k))
      for ((numSub, ksub) <- Seq((48, 64), (96, 64), (96, 256))) {
        val cb = SimilaritySearch.pqCodebooks(big, numSub, ksub, 2).cache()
        cb.count()
        for (m <- Seq(32, 64)) {
          val t0 = System.nanoTime()
          val got = pairs(SimilaritySearch.pqTopK(qd, big, k, m, numSub,
            ksub, 2, codebooks = Some(cb)))
          val recall = (ex & got).size.toDouble / ex.size
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"pqdim dim=${64 * reps} numSub=$numSub%-3d " +
            f"ksub=$ksub%-4d m=$m%-3d recall=$recall%.3f " +
            f"identical=${got == ex}%-5s bytes/vec=$numSub sec=$sec%.1f")
        }
        cb.unpersist()
      }
      big.unpersist(); qd.unpersist()
    }

    // "ivfpq": the IVF-PQ composition — PQ codes inside the probed
    // lists at the shipped (16, 64) codebook. Reports, per (nProbe, m),
    // recall vs the exact kNN, identity to the exact kNN, and identity
    // to the float IVF at the same nProbe (isolating the PQ layer's
    // contribution — the q109/ivfsq8 discipline).
    if (mode == "ivfpq") {
      val cents = SimilaritySearch
        .kMeansCentroids(emb.select("vec_id", "embedding"), 64, 5).cache()
      cents.count()
      val cb = SimilaritySearch.pqCodebooks(
        emb.select("vec_id", "embedding"), 16, 64, 2).cache()
      cb.count()
      val exactR = ranked(SimilaritySearch.bruteForceTopK(q, emb, k))
      for (nProbe <- Seq(16, 24, 32, 48)) {
        val ivfR = ranked(SimilaritySearch.ivfTopK(q, emb, cents, k, nProbe))
        for (m <- Seq(32, 64)) {
          val t0 = System.nanoTime()
          val got = ranked(SimilaritySearch.ivfPqTopK(q, emb, cents, k,
            nProbe, m, 16, 64, 2, codebooks = Some(cb)))
          val recall = (exact &
            got.map(t => (t._1, t._3))).size.toDouble / exact.size
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"ivfpq nProbe=$nProbe%-2d m=$m%-3d recall=$recall%.3f " +
            f"exact_ident=${got == exactR}%-5s ivf_ident=${got == ivfR}%-5s " +
            f"sec=$sec%.1f")
        }
      }
      cb.unpersist(); cents.unpersist()
    }

    // "ivfsq8": the composed index — int8 codes inside the probed
    // lists. Reports, per (nProbe, m) at the q37 centroid set
    // (64 lists / 5 Lloyd iters, hash seeding): recall vs the exact
    // kNN, whether the output is IDENTICAL to the exact kNN, and
    // whether it is IDENTICAL to the float IVF at the same nProbe —
    // the second identity isolates the SQ8 layer's contribution (m ≫ k
    // should make it lossless within the probed set, the q103 margin
    // argument applied per-probe).
    if (mode == "ivfsq8") {
      val cents = SimilaritySearch
        .kMeansCentroids(emb.select("vec_id", "embedding"), 64, 5).cache()
      cents.count()
      val exactR = ranked(SimilaritySearch.bruteForceTopK(q, emb, k))
      for (nProbe <- Seq(16, 24, 32, 40, 48, 56, 64)) {
        val ivfR = ranked(SimilaritySearch.ivfTopK(q, emb, cents, k, nProbe))
        val nCand = SimilaritySearch
          .ivfCandidates(q, emb, cents, nProbe).count()
        for (m <- Seq(16, 32)) {
          val t0 = System.nanoTime()
          val got = ranked(
            SimilaritySearch.ivfSq8TopK(q, emb, cents, k, nProbe, m))
          val recall = (exact &
            got.map(t => (t._1, t._3))).size.toDouble / exact.size
          val frac = nCand.toDouble / (nQueries * nIndex)
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"ivfsq8 nProbe=$nProbe%-2d m=$m%-3d recall=$recall%.3f " +
            f"exact_ident=${got == exactR}%-5s ivf_ident=${got == ivfR}%-5s " +
            f"candFrac=$frac%.3f sec=$sec%.1f")
        }
      }
      cents.unpersist()
    }

    // "filtered": the composed-layout FILTERED margins q143/q144 ship —
    // ~50% selectivity (even vec_ids), identity vs the filtered float
    // IVF at the same (nProbe) over the SAME stored centroids, and
    // recall vs the filtered exact kNN. Reproduces the certification
    // that set SQ8 m=32 / PQ m=128 (the restricted candidate set
    // tightens the ADC boundary — a smaller m that is identical
    // unfiltered measurably is not under the filter).
    if (mode == "filtered") {
      import graft.sources.AnnIndex
      val allowed = emb.filter(col("vec_id") % 2 === 0)
      val exactF = ranked(SimilaritySearch.bruteForceTopK(
        q, allowed, k))
      val exactFPairs = exactF.map(t => (t._1, t._3))
      val hs = AnnIndex.ensureIvfSq8(spark, s"$sfDir#tunefilt", emb)
      val hp = AnnIndex.ensureIvfPq(spark, s"$sfDir#tunefilt", emb)
      for (nProbe <- Seq(16, 24, 32)) {
        val ivfF = ranked(SimilaritySearch.ivfTopK(q, allowed,
          hs.centroids, k, nProbe))
        for (m <- Seq(16, 32, 64)) {
          val got = ranked(AnnIndex.queryIvfSq8Filtered(q, hs, allowed,
            k, nProbe, m))
          val recall = (exactFPairs &
            got.map(t => (t._1, t._3))).size.toDouble / exactFPairs.size
          println(f"filtered-sq8 nProbe=$nProbe%-2d m=$m%-3d " +
            f"recall=$recall%.3f exact_ident=${got == exactF}%-5s " +
            f"ivf_ident=${got == ivfF}%-5s")
        }
        val ivfFP = ranked(SimilaritySearch.ivfTopK(q, allowed,
          hp.centroids, k, nProbe))
        for (m <- Seq(32, 64, 128)) {
          val got = ranked(AnnIndex.queryIvfPqFiltered(q, hp, allowed,
            k, nProbe, m))
          val recall = (exactFPairs &
            got.map(t => (t._1, t._3))).size.toDouble / exactFPairs.size
          println(f"filtered-pq  nProbe=$nProbe%-2d m=$m%-3d " +
            f"recall=$recall%.3f exact_ident=${got == exactF}%-5s " +
            f"ivf_ident=${got == ivfFP}%-5s")
        }
      }
    }

    // "mrl": truncated-dimension coarse ranking — smallest (d, m) at
    // which first-d-components scoring + exact re-rank is output-
    // identical to the exact kNN. Generic (non-MRL-trained) fixture
    // embeddings spread energy across components, so this is the
    // worst case for the technique.
    if (mode == "mrl") {
      for (d <- Seq(8, 16, 32); m <- Seq(8, 16, 32, 64)) {
        val t0 = System.nanoTime()
        val got = pairs(SimilaritySearch.truncatedTopK(q, emb, k, d, m))
        val recall = (exact & got).size.toDouble / exact.size
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"mrl d=$d%-3d m=$m%-3d recall=$recall%.3f " +
          f"identical=${got == exact}%-5s sec=$sec%.1f")
      }
    }

    // "mrlfl": truncated-dim ranking on FRONT-LOADED embeddings — the
    // shape MRL training produces (energy decaying by component). The
    // fixture is transformed deterministically (component i scaled by
    // decay^i, float-rounded — replayable in DuckDB verbatim), so this
    // measures the (decay, d, m) identity points the q111/q112 oracles
    // pin, alongside the composition with SQ8 (truncate-then-quantize).
    if (mode == "mrlfl") {
      for (decay <- Seq(0.7, 0.8, 0.9)) {
        val fl = emb.select(col("vec_id"),
          transform(col("embedding"),
            (x, i) => (x * pow(lit(decay), i)).cast("float"))
            .as("embedding")).cache()
        val qf = fl.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec")).cache()
        val ex = ranked(SimilaritySearch.bruteForceTopK(qf, fl, k))
        for (d <- Seq(8, 16, 32); m <- Seq(16, 32)) {
          val t0 = System.nanoTime()
          val trunc = ranked(SimilaritySearch.truncatedTopK(qf, fl, k, d, m))
          val comp = ranked(
            SimilaritySearch.truncatedQuantizedTopK(qf, fl, k, d, m))
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"mrlfl decay=$decay%.1f d=$d%-3d m=$m%-3d " +
            f"trunc_ident=${trunc == ex}%-5s sq8_ident=${comp == ex}%-5s " +
            f"sec=$sec%.1f")
        }
        fl.unpersist(); qf.unpersist()
      }
    }

    if (mode == "lsh" || mode == "all") for ((tables, bits, probes) <- Seq(
        (48, 12, 16), (48, 12, 20), (48, 12, 24), (64, 12, 16), (64, 12, 24),
        (64, 14, 32), (96, 14, 24), (48, 10, 12), (48, 10, 16),
        // recall-1.0 hunt for the ANN plan rewrite
        (64, 12, 32), (64, 12, 48), (64, 12, 64), (96, 12, 32), (96, 12, 48),
        (64, 10, 24), (64, 10, 32), (96, 10, 24), (128, 12, 32))) {
      val cand = SimilaritySearch.lshCandidates(q, emb, tables, bits, probes)
      val topk = SimilaritySearch.lshTopK(q, emb, k, tables, bits, probes)
      report(s"lsh t=$tables b=$bits p=$probes", cand, topk)
    }

    if (mode == "ivf" || mode == "all") for {
      kC <- Seq(32, 48, 64)
      (seed, mk) <- Seq[(String, (Int, Int) => DataFrame)](
        "hash" -> ((kk, it) => SimilaritySearch.kMeansCentroids(emb, kk, it)),
        "ff" -> ((kk, it) => SimilaritySearch.kMeansCentroidsPP(emb, kk, it)))
    } {
      val iters = 5
      val cents = mk(kC, iters).cache()
      cents.count()
      for (nProbe <- Seq(kC / 4, kC * 3 / 8, kC / 2)) {
        val cand = SimilaritySearch.ivfCandidates(q, emb, cents, nProbe)
        val topk = SimilaritySearch.ivfTopK(q, emb, cents, k, nProbe)
        report(s"ivf $seed k=$kC it=$iters nProbe=$nProbe", cand, topk)
      }
      cents.unpersist()
    }
    spark.stop()
  }
}
