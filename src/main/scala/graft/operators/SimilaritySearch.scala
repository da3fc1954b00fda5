package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column —
  * the Spark-native analogue of the reference's Pinecone cosine index
  * (`/root/reference/AI.py:48-55`, queried via the retriever at
  * `AI.py:138`, default k=4).
  *
  * Three paths:
  *  - bruteForceTopK: exact. Broadcast the small query side over the big
  *    index; per-query top-k window. The baseline every ANN variant is
  *    measured against.
  *  - lshTopK: random-hyperplane LSH bucketing (sign bits of projections
  *    onto deterministic pseudo-random hyperplanes). Candidates = same
  *    bucket in any of `tables` hash tables; exact re-rank of candidates.
  *    At 100 TB this turns the crossJoin into an equi-join on (table,
  *    bucket) — the scale path.
  *  - ivfTopK: inverted-file index — partition vectors by nearest of C
  *    centroids; probe the nProbe closest centroids per query. Centroid
  *    assignment is a broadcast join (C is small).
  */
object SimilaritySearch {

  /** Exact cosine top-k: queries(query_id, query_vec) × index(vec_id,
    * embedding). Deterministic ties: (score desc, vec_id asc).
    */
  def bruteForceTopK(queries: DataFrame, index: DataFrame, k: Int = 4): DataFrame = {
    // one norm per vector up front; the n_index × n_query stage does a
    // single fused dot product per pair
    val qn = broadcast(queries.withColumn("qnrm",
      VectorOps.l2Norm(col("query_vec"))))
    val in = index.withColumn("inrm", VectorOps.l2Norm(col("embedding")))
    val scored = in.crossJoin(qn)
      .withColumn("score",
        when(col("inrm") * col("qnrm") === 0.0, lit(0.0))
          .otherwise(VectorOps.dot(col("embedding"), col("query_vec"))
            / (col("inrm") * col("qnrm"))))
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** Exact cosine top-k via the bounded TopKAgg aggregate: map-side
    * partial top-k means each task ships at most k rows per query to the
    * final merge — the shuffle is O(partitions × queries × k) instead of
    * O(index × queries) as in the window formulation. Identical output
    * (and oracle) to `bruteForceTopK`.
    */
  def bruteForceTopKAgg(queries: DataFrame, index: DataFrame, k: Int = 4): DataFrame = {
    import graft.functions.expressions.TopKAgg.top_k
    val qn = broadcast(queries.withColumn("qnrm",
      VectorOps.l2Norm(col("query_vec"))))
    val in = index.withColumn("inrm", VectorOps.l2Norm(col("embedding")))
    in.crossJoin(qn)
      .withColumn("score",
        when(col("inrm") * col("qnrm") === 0.0, lit(0.0))
          .otherwise(VectorOps.dot(col("embedding"), col("query_vec"))
            / (col("inrm") * col("qnrm"))))
      .groupBy("query_id")
      .agg(top_k(col("score"), col("vec_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as("vec_id"), col("hit.score").as("score"))
  }

  /** Symmetric per-vector int8 quantization of a vector table: (id,
    * codes: binary, qscale: double, qnorm: double). `codes[i] =
    * round(x_i · 127 / max|x|)`, `qscale = max|x| / 127` (so `x_i ≈
    * codes[i] · qscale`), `qnorm = ‖x‖₂` of the ORIGINAL float vector.
    * Pure per-row projection — zero shuffle, codegen'd.
    *
    * This is the SQ8 storage layout (faiss's `SQ8` / Lucene's int8
    * HNSW discipline, both public): 4× smaller at rest and — the part
    * that matters at 100 TB — 4× less memory bandwidth per scanned
    * vector, with the scan kernel doing byte loads + integer multiplies
    * instead of float loads.
    */
  def quantizeIndex(index: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import graft.functions.expressions.VectorExpressions.{max_abs, quantize_i8}
    index.select(col(idCol),
      quantize_i8(col(vecCol)).as("codes"),
      (max_abs(col(vecCol)) / 127.0).as("qscale"),
      VectorOps.l2Norm(col(vecCol)).as("qnorm"))
  }

  /** Quantized-scan ANN: int8 approximate cosine over the whole index
    * selects `m` candidates per query; exact float re-rank of those m
    * returns the top-k. MEASURED output-identical to `bruteForceTopK`
    * at the shipped (k, m) operating point — q103/q105 pin it against
    * the exact-kNN DuckDB oracle at every fixture scale. That identity
    * is an empirical property of the candidate margin absorbing the
    * ≤ ~1/254-per-component rounding error, not a guarantee: near-ties
    * beyond rank m can flip on other corpora/dims, so certify a new
    * (k, m) point the same way (AnnTune sweep + exact-kNN comparison)
    * before serving it — the discipline [[truncatedTopK]] documents.
    *
    * Approximate score: `dot_i8(cx, cq) · sx · sq / (‖x‖‖q‖)` — exact
    * cosine of the DEquantized vectors against the true norms. Per-query
    * constants (sq, ‖q‖) don't change ranking but keep the score an
    * absolute cosine estimate, so a future filter-by-threshold composes.
    *
    * Scale shape: identical to `bruteForceTopKAgg` (broadcast query
    * side, map-side bounded TopKAgg — O(partitions · queries · m)
    * shuffle), but the scan stage reads the 4×-smaller codes column and
    * never touches the float vectors; only the m winners per query are
    * re-joined to the float table by id.
    */
  def quantizedTopK(queries: DataFrame, index: DataFrame, k: Int = 4,
      m: Int = 32): DataFrame = {
    import graft.functions.expressions.TopKAgg.top_k
    import graft.functions.expressions.VectorExpressions.dot_i8
    require(m >= k, s"candidate count m ($m) must be >= k ($k)")
    val qi = quantizeIndex(index)
    val qq = broadcast(
      quantizeIndex(queries, idCol = "query_id", vecCol = "query_vec")
        .select(col("query_id"), col("codes").as("qcodes"),
          col("qscale").as("qqscale"), col("qnorm").as("qqnorm")))
    val cand = qi.crossJoin(qq)
      .withColumn("ascore",
        when(col("qnorm") * col("qqnorm") === 0.0, lit(0.0))
          .otherwise(dot_i8(col("codes"), col("qcodes")).cast("double")
            * col("qscale") * col("qqscale")
            / (col("qnorm") * col("qqnorm"))))
      .groupBy("query_id")
      .agg(top_k(col("ascore"), col("vec_id"), m).as("topk"))
      .select(col("query_id"), explode(col("topk.id")).as("vec_id"))
    rerank(cand, queries, index, k)
  }

  /** Binary-quantized ANN (the 1-bit extreme of the [[quantizedTopK]]
    * family): sign-bit codes (⌈dim/8⌉ bytes — 32× less than float32),
    * Hamming shortlist of `m` per query, exact float re-rank to k.
    * Hamming over sign bits approximates angular distance (Charikar's
    * SimHash bound, SIGMOD '02 line of work — the same bound
    * [[graft.operators.Dedup.simHashDups]] rests on), so the coarse
    * ranking agrees with cosine up to the margin `m` absorbs.
    *
    * The 1-bit code is far cruder than SQ8 — Hamming takes at most
    * dim+1 distinct values, so rank TIES are structural, broken
    * (desc on -hamming, then id asc: [[graft.functions.expressions
    * .TopKAgg]]'s fixed semantics) deterministically. Certify the
    * (k, m) point against exact kNN before serving (`AnnTune bq`
    * measures the identity frontier; q162 pins the shipped point) —
    * and expect the certified m to sit HIGHER than SQ8's for the same
    * k, the price of 8× fewer bits.
    *
    * Scale shape: identical to [[bruteForceTopKAgg]] (broadcast query
    * side, map-side bounded TopKAgg), but the scan stage reads 1/32 of
    * the float bytes and the inner loop is XOR+popcount; only the m
    * winners per query touch the float table.
    */
  def binaryTopK(queries: DataFrame, index: DataFrame, k: Int = 4,
      m: Int = 64): DataFrame = {
    require(m >= k, s"candidate count m ($m) must be >= k ($k)")
    rerank(binaryCandidates(queries, binarizeIndex(index), m),
      queries, index, k)
  }

  /** Sign-pack an index frame to its 1-bit serving form: (vec_id,
    * bcodes) at ⌈dim/8⌉ bytes per row — the projection [[binaryTopK]]
    * scans in memory and [[graft.sources.AnnIndex.ensureBq]] persists
    * (one per-row pass, no global statistics — so like SQ8, an upsert
    * is exactly a rebuild restricted to the new rows).
    */
  def binarizeIndex(index: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import graft.functions.expressions.VectorExpressions.sign_pack
    index.select(col(idCol), sign_pack(col(vecCol)).as("bcodes"))
  }

  /** The Hamming candidate stage of [[binaryTopK]] alone: per query
    * the top-m (query_id, vec_id) by ascending Hamming distance over a
    * 1-bit codes frame — no re-rank. Shared verbatim by the in-memory
    * and persisted ([[graft.sources.AnnIndex.queryBq]]) paths, so
    * persisted ≡ in-memory holds by construction, not by test alone.
    */
  private[graft] def binaryCandidates(queries: DataFrame,
      codes: DataFrame, m: Int): DataFrame = {
    import graft.functions.expressions.TopKAgg.top_k
    import graft.functions.expressions.VectorExpressions.{hamming, sign_pack}
    require(m >= 1, s"candidate count m ($m) must be >= 1")
    val bq = broadcast(queries.select(col("query_id"),
      sign_pack(col("query_vec")).as("qbcodes")))
    codes.crossJoin(bq)
      .withColumn("ascore", -hamming(col("bcodes"), col("qbcodes")).cast("double"))
      .groupBy("query_id")
      .agg(top_k(col("ascore"), col("vec_id"), m).as("topk"))
      .select(col("query_id"), explode(col("topk.id")).as("vec_id"))
  }

  /** Truncated-dimension coarse ranking (the Matryoshka-retrieval
    * serving shape, public MRL line of work): score with the FIRST `d`
    * components only, take `m` candidates per query, exact full-dim
    * re-rank. Another bandwidth lever besides [[quantizedTopK]] — the
    * coarse scan reads d/dim of the bytes — and the two compose
    * (truncate THEN quantize) for d/dim · 1/4 total scan bytes.
    *
    * Unlike SQ8 (whose error is a bounded per-component rounding), the
    * truncation error depends on how much energy the leading components
    * carry: MRL-trained embeddings front-load information by
    * construction; generic embeddings spread it. MEASURED both ways
    * (BASELINE.md): on the flat fixture (`AnnTune mrl`) no (d, m) up
    * to (32, 64) reaches output identity — the standing NEGATIVE
    * control — while on the front-loaded fixture (component i scaled
    * by 0.8^i, the MRL spectrum shape; `AnnTune mrlfl`) identity holds
    * at every (d, m) down to (8, 16) at all three scales, and q111
    * pins the certified (d=16, m=32) point against an exact-kNN DuckDB
    * oracle over the same transformed vectors (q112 pins the SQ8
    * composition at the same point). The deploy contract stands: use
    * only with embeddings trained to front-load, and certify the
    * (d, m) point against an exact-kNN sample first — the measurement
    * `AnnTune mrlfl` automates. [[quantizedTopK]] is the bandwidth
    * lever that works unconditionally (q103/q105).
    *
    * Scale shape: identical to [[bruteForceTopKAgg]] — broadcast query
    * side, bounded TopKAgg candidates, the full-dim vectors touched
    * only for the m winners per query.
    */
  def truncatedTopK(queries: DataFrame, index: DataFrame, k: Int = 4,
      d: Int = 32, m: Int = 32): DataFrame = {
    import graft.functions.expressions.TopKAgg.top_k
    require(d >= 1, s"truncation dim d ($d) must be positive")
    require(m >= k, s"candidate count m ($m) must be >= k ($k)")
    val qt = broadcast(queries.select(col("query_id"),
      slice(col("query_vec"), 1, d).as("tq")))
    val cand = index
      .select(col("vec_id"), slice(col("embedding"), 1, d).as("tv"))
      .crossJoin(qt)
      .withColumn("ascore", VectorOps.cosine(col("tv"), col("tq")))
      .groupBy("query_id")
      .agg(top_k(col("ascore"), col("vec_id"), m).as("topk"))
      .select(col("query_id"), explode(col("topk.id")).as("vec_id"))
    rerank(cand, queries, index, k)
  }

  /** [[truncatedTopK]] composed with SQ8 — truncate THEN quantize: the
    * coarse scan reads int8 codes of the FIRST `d` components only
    * (d/dim · 1/4 of the float bytes — both bandwidth levers
    * multiplied), selects `m` candidates by integer-dot approximate
    * truncated cosine, and the exact FULL-dimension float re-rank
    * returns top-k. Inherits truncatedTopK's deploy contract: the
    * truncation term is embedding-family-dependent (front-loaded /
    * MRL-trained embeddings only — q111/q112 certify both layers on
    * the front-loaded fixture; the flat fixture stays the measured
    * negative control), while the added quantization term is the same
    * bounded rounding q103 measures. Certify a (d, m) point with
    * `AnnTune mrlfl` before serving.
    */
  def truncatedQuantizedTopK(queries: DataFrame, index: DataFrame,
      k: Int = 4, d: Int = 32, m: Int = 32): DataFrame = {
    import graft.functions.expressions.TopKAgg.top_k
    import graft.functions.expressions.VectorExpressions.dot_i8
    require(d >= 1, s"truncation dim d ($d) must be positive")
    require(m >= k, s"candidate count m ($m) must be >= k ($k)")
    val qi = quantizeIndex(index.select(col("vec_id"),
      slice(col("embedding"), 1, d).as("embedding")))
    val qq = broadcast(quantizeIndex(
        queries.select(col("query_id"),
          slice(col("query_vec"), 1, d).as("query_vec")),
        idCol = "query_id", vecCol = "query_vec")
      .select(col("query_id"), col("codes").as("qcodes"),
        col("qscale").as("qqscale"), col("qnorm").as("qqnorm")))
    val cand = qi.crossJoin(qq)
      .withColumn("ascore",
        when(col("qnorm") * col("qqnorm") === 0.0, lit(0.0))
          .otherwise(dot_i8(col("codes"), col("qcodes")).cast("double")
            * col("qscale") * col("qqscale")
            / (col("qnorm") * col("qqnorm"))))
      .groupBy("query_id")
      .agg(top_k(col("ascore"), col("vec_id"), m).as("topk"))
      .select(col("query_id"), explode(col("topk.id")).as("vec_id"))
    rerank(cand, queries, index, k)
  }

  /** Per-subspace L2 k-means codebooks for product quantization:
    * (sub_id 0-based, centroid_id 0-based < ksub, centroid_vec of
    * dim/numSub doubles). All `numSub` subspaces train JOINTLY — one
    * exploded (sub_id, vec_id, subvec) relation, assignment is a
    * broadcast join against the numSub·ksub-row centroid set collapsed
    * map-side by min_by (no window), the re-average one (sub, centroid,
    * dim) aggregate — so a Lloyd round is two shuffles total no matter
    * how many subspaces, and lineage is checkpoint-truncated per round
    * like [[kMeansRefine]]. Seeds: the subvectors of the `ksub` index
    * vectors with smallest xxhash64(vec_id) — the same stable draw as
    * [[kMeansCentroids]], shared across subspaces. An emptied centroid
    * keeps its previous position (same guard as kMeansRefine).
    *
    * L2 (not cosine) assignment is the standard PQ training objective:
    * codes minimize per-subspace reconstruction error, and the ADC dot
    * estimate Σ dot(c_m, q_m) inherits that bound regardless of the
    * serving metric.
    */
  def pqCodebooks(index: DataFrame, numSub: Int = 16, ksub: Int = 16,
      iters: Int = 5): DataFrame = {
    import graft.functions.expressions.PqExpressions.pq_encode_codes
    require(ksub >= 1 && ksub <= 256, s"ksub must be in [1, 256], got $ksub")
    val spark = index.sparkSession
    import spark.implicits._
    // Lloyd state is MODEL-SIZED (numSub · ksub · dsub doubles — the
    // same bound collectCodebook relies on), so the whole training loop
    // keeps the codebook on the driver and pays ONE Spark job per
    // round: assignment as a map-side expression over the raw vectors
    // (pq_encode_codes — the same argmin-L2/lowest-id kernel the old
    // broadcast-join + min_by computed, now with no join and no
    // per-round broadcast build) feeding ONE (sub, centroid, dim)
    // partial-aggregated avg whose model-bounded result is collected
    // and folded on the driver. The old loop paid, per round: a
    // broadcast build, the assignment exchange, the refresh exchange,
    // an empty-cluster anti-join and an EAGER checkpoint — JobProfile
    // attributed 11 s of q121 to exactly those stages (guide §1.2 step
    // 1: remove passes; §5: the driver should hold model state, not
    // row state).
    val seedRows = index
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy("h", "vec_id").limit(ksub)
      .select(col("vec_id"),
        VectorOps.toDouble(col("embedding")).as("v"))
      .as[(Long, Seq[Double])].collect() // ksub-bounded model-seed collect
    require(seedRows.nonEmpty, "pqCodebooks: empty index")
    val dim = seedRows.head._2.length
    // dims not divisible by numSub are rejected loudly at encode time
    // (PqEncodeF.checkDim) — training now rejects them identically
    require(dim % numSub == 0,
      s"pqCodebooks: vector dimension $dim is not divisible by " +
        s"numSub=$numSub — encode and codebook must agree on dsub")
    val dsub = dim / numSub
    val effK = seedRows.length
    // centroid id = rank of the seed vec_id within the SORTED draw —
    // the array_position(lit(sorted ids)) convention, verbatim
    var flat = new Array[Double](numSub * effK * dsub)
    for { ((_, v), cid) <- seedRows.sortBy(_._1).zipWithIndex
          s <- 0 until numSub; i <- 0 until dsub }
      flat((s * effK + cid) * dsub + i) = v(s * dsub + i)
    for (_ <- 1 to iters) {
      // one job: encode per row (no shuffle), posexplode to
      // (sub, centroid, dim, x), ONE partial-aggregated avg exchange,
      // model-bounded collect
      // encode in its OWN projection BELOW the explode (see
      // kMeansRefine: a generator sibling would re-evaluate the
      // numSub·ksub·dsub kernel once per exploded dim)
      val rows = index
        .select(pq_encode_codes(col("embedding"), flat, numSub, effK)
            .as("codes"),
          VectorOps.toDouble(col("embedding")).as("v"))
        .select(col("codes"), posexplode(col("v")).as(Seq("i", "x")))
        .select((col("i") / lit(dsub)).cast("int").as("sub_id"),
          pmod(col("i"), lit(dsub)).cast("int").as("d"),
          col("codes"), col("x"))
        .select(col("sub_id"),
          element_at(col("codes"), col("sub_id") + 1).as("centroid_id"),
          col("d"), col("x"))
        .groupBy("sub_id", "centroid_id", "d")
        .agg(avg(col("x")).as("m"))
        .collect()
      // empty-cluster rule, driver-side: a (sub, centroid) slot with no
      // assigned vectors keeps its previous position (absent from the
      // aggregate) so it can re-capture vectors — same as the old
      // anti-join union
      val next = flat.clone()
      rows.foreach { r =>
        val s = r.getInt(0); val cid = r.getInt(1); val d = r.getInt(2)
        next((s * effK + cid) * dsub + d) = r.getDouble(3)
      }
      flat = next
    }
    // ONE partition: this is a model-sized relation the stores write
    // verbatim — parallelized local rows would land one tiny file per
    // slice (guide §6 small files; and maintain()'s path-derived floor
    // counts a plain dir as one file, so a 32-file codebook dir would
    // re-trip compaction every run)
    (for (s <- 0 until numSub; cid <- 0 until effK) yield
      (s, cid, (0 until dsub).map(i => flat((s * effK + cid) * dsub + i))))
      .toDF("sub_id", "centroid_id", "centroid_vec")
      .coalesce(1)
  }

  /** Collect a [[pqCodebooks]] relation into the flat driver-side array
    * [[graft.functions.expressions.PqExpressions]] kernels embed
    * (layout [sub][cid][dim-within-sub]; an untrained (sub, cid) slot —
    * possible when ksub exceeds the distinct subvector count — stays
    * zero-filled). Bounded by numSub · ksub rows: model parameters, the
    * same class of collect as the k-means seed draw.
    */
  def collectCodebook(codebooks: DataFrame, numSub: Int, ksub: Int): Array[Double] = {
    val rows = codebooks
      .select(col("sub_id"), col("centroid_id"), col("centroid_vec"))
      .collect()
    require(rows.nonEmpty, "collectCodebook: empty codebook relation")
    val dsub = rows.head.getSeq[Double](2).length
    val flat = new Array[Double](numSub * ksub * dsub)
    rows.foreach { r =>
      val s = r.getInt(0); val cid = r.getInt(1)
      require(s >= 0 && s < numSub && cid >= 0 && cid < ksub,
        s"collectCodebook: (sub_id=$s, centroid_id=$cid) outside " +
          s"numSub=$numSub × ksub=$ksub")
      val v = r.getSeq[Double](2)
      require(v.length == dsub,
        s"collectCodebook: ragged centroid dim ${v.length} != $dsub")
      var i = 0
      while (i < dsub) { flat((s * ksub + cid) * dsub + i) = v(i); i += 1 }
    }
    flat
  }

  /** Product-quantized ANN: train per-subspace codebooks, encode the
    * index to `numSub` bytes per vector, score every (query, vector)
    * pair by ADC table lookups, take `m` candidates per query, exact
    * float re-rank to top-k. MEASURED output-identical to
    * [[bruteForceTopK]] at the shipped (numSub, ksub, m) operating
    * point — q115 pins it against the exact-kNN DuckDB oracle, the
    * q103/q105 SQ8 discipline; certify any new point with `AnnTune pq`
    * before serving (PQ reconstruction error is data-dependent — this
    * is an empirical identity, not a guarantee).
    *
    * Approximate score: `Σ_m dot(c_{m,code_m}, q_m) / (‖x‖‖q‖)` — the
    * ADC estimate of exact cosine against the TRUE stored norms, so
    * thresholds compose, like [[quantizedTopK]].
    *
    * Scale shape: the scan stage reads `numSub` bytes per vector
    * (16 B at the fixture's 64-dim/numSub=16 — 16× under float32; 96 B
    * at the reference's 1536-dim, numSub=96/ksub=256 — the certified
    * point, `AnnTune pqdim` — 64×) and does table
    * lookups only, no multiplies; the per-query ADC table is built once
    * on the broadcast side; map-side bounded TopKAgg ships
    * O(partitions · queries · m); float vectors are touched only for
    * the m winners per query (id equi-join). Training cost is `iters`
    * two-shuffle rounds over the exploded subvector relation — run once
    * and reuse via the `codebooks` parameter (the index-once/query-many
    * shape).
    */
  def pqTopK(queries: DataFrame, index: DataFrame, k: Int = 4,
      m: Int = 32, numSub: Int = 16, ksub: Int = 16, iters: Int = 5,
      codebooks: Option[DataFrame] = None): DataFrame = {
    import graft.functions.expressions.PqExpressions.{pq_adc_dot, pq_encode, pq_table}
    import graft.functions.expressions.TopKAgg.top_k
    require(m >= k, s"candidate count m ($m) must be >= k ($k)")
    val cb = codebooks.getOrElse(pqCodebooks(index, numSub, ksub, iters))
    val flat = collectCodebook(cb, numSub, ksub)
    val enc = index.select(col("vec_id"),
      pq_encode(col("embedding"), flat, numSub, ksub).as("pqcodes"),
      VectorOps.l2Norm(col("embedding")).as("pnorm"))
    val qt = broadcast(queries.select(col("query_id"),
      pq_table(col("query_vec"), flat, numSub, ksub).as("adc"),
      VectorOps.l2Norm(col("query_vec")).as("qqnorm")))
    val cand = enc.crossJoin(qt)
      .withColumn("ascore",
        when(col("pnorm") * col("qqnorm") === 0.0, lit(0.0))
          .otherwise(pq_adc_dot(col("pqcodes"), col("adc"))
            / (col("pnorm") * col("qqnorm"))))
      .groupBy("query_id")
      .agg(top_k(col("ascore"), col("vec_id"), m).as("topk"))
      .select(col("query_id"), explode(col("topk.id")).as("vec_id"))
    rerank(cand, queries, index, k)
  }

  /** MMR (maximal-marginal-relevance) diversified top-k — the
    * `search_type="mmr"` retriever mode of the reference's LangChain
    * stack (public API): fetch the `fetchK` most relevant vectors per
    * query, then greedily re-select `k` of them trading relevance
    * against redundancy at weight `lambda` (LangChain defaults:
    * fetch_k=20, lambda_mult=0.5). Output (query_id, rank, vec_id,
    * mmr_score), rank = pick order; rank 1 always equals the exact
    * relevance top-1 (for λ > 0 the first pick has no redundancy term).
    *
    * Scale shape: the fetch IS [[bruteForceTopK]] (swap in any ANN/
    * persisted fetch for a 100 TB index — MMR only needs the fetched
    * rows); the greedy stage runs on one bounded array of fetchK
    * (rank, id, score, embedding) structs per query — O(k · fetchK)
    * local work inside a native expression, never index-sized, and the
    * candidate array order (fetch rank) fixes the float accumulation
    * order so the selection is deterministic.
    */
  def mmrTopK(queries: DataFrame, index: DataFrame, k: Int = 4,
      fetchK: Int = 20, lambda: Double = 0.5): DataFrame = {
    require(fetchK >= k, s"fetchK ($fetchK) must be >= k ($k)")
    mmrRerank(bruteForceTopK(queries, index, fetchK), index, k, lambda)
  }

  /** The MMR greedy stage alone, over an ALREADY-FETCHED candidate set
    * (query_id, rank, score, vec_id — any top-k path's output shape:
    * exact, LSH, SQ8, a persisted index query). This is what makes MMR
    * compose with the 100 TB fetch paths: at the recall-1.0 operating
    * points the swapped-in fetch is row-identical to the exact one, so
    * the MMR output is too (OperatorsSpec pins the composition).
    */
  def mmrRerank(fetched: DataFrame, index: DataFrame, k: Int,
      lambda: Double): DataFrame = {
    import graft.functions.expressions.MmrExpression.mmr_select
    val withVec = index.select(col("vec_id"), col("embedding"))
      .join(broadcast(fetched.select("query_id", "rank", "vec_id",
        "score")), Seq("vec_id"))
    withVec.groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("rank"), col("vec_id"),
        col("score"), col("embedding")))).as("c"))
      .select(col("query_id"),
        posexplode(mmr_select(col("c"), k, lambda)).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.rank").as("rank"),
        col("hit.vec_id").as("vec_id"), col("hit.mmr").as("mmr_score"))
  }

  /** Rocchio pseudo-relevance feedback (Rocchio 1971; the PRF query
    * expansion every classic IR stack ships, public): retrieve
    * `fetchK` first, treat those hits as pseudo-relevant, move the
    * query toward their centroid —
    *
    *   q' = alpha · q + beta · mean(top-fetchK vectors)
    *
    * — then retrieve top-k with the expanded query. beta = 0 reduces
    * EXACTLY to plain [[bruteForceTopKAgg]] (the scores differ by the
    * positive factor alpha, which cannot reorder; ranks and ids are
    * identical — q235 pins the zero symmetric difference), so the
    * expansion strength is auditable against the plain path.
    *
    * Scale shape: two exact-kNN passes (both bounded TopKAgg) plus one
    * fetchK-row-per-query centroid aggregate; the feedback join ships
    * only (query_id, vec_id) pairs. Swap any ANN fetch in for either
    * pass at 100 TB — the expansion only needs the fetched ids.
    */
  def rocchioTopK(queries: DataFrame, index: DataFrame, k: Int = 4,
      fetchK: Int = 10, alpha: Double = 1.0,
      beta: Double = 0.5): DataFrame = {
    import graft.functions.VectorMeanAgg
    val fetched = bruteForceTopKAgg(queries, index, fetchK)
      .select("query_id", "vec_id")
    val centroid = fetched
      .join(index.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .groupBy("query_id")
      .agg(VectorMeanAgg.asColumn(col("embedding")).as("c"))
    val expanded = queries.join(centroid, Seq("query_id"))
      .select(col("query_id"),
        zip_with(VectorOps.toDouble(col("query_vec")), col("c"),
          (q, m) => q * alpha + m * beta).as("query_vec"))
    bruteForceTopKAgg(expanded, index, k)
  }

  /** Score-threshold retrieval — the `similarity_score_threshold`
    * retriever mode of the reference's stack (public LangChain API):
    * exact top-k, then only hits at cosine ≥ `minScore` survive (so a
    * query may return fewer than k rows; ranks keep their pre-filter
    * values, matching the reference behavior of filtering a scored
    * result list).
    */
  def thresholdTopK(queries: DataFrame, index: DataFrame, k: Int = 4,
      minScore: Double = 0.0): DataFrame =
    bruteForceTopK(queries, index, k).filter(col("score") >= minScore)

  /** LSH-bucketed ANN top-k with exact re-rank of candidates. Bucket
    * signatures come from one native expression pass (hyperplane
    * components are deterministic hashes — no stored model).
    *
    * Multi-probe: the query side also probes the `probes - 1` buckets
    * reached by flipping its lowest-|margin| hyperplane bits — the
    * standard recall knob that avoids paying for more tables. Only the
    * (broadcast) query side fans out; the index is bucketed once.
    *
    * Scale shape: candidate generation and dedup ship ONLY
    * (table, bucket, id) rows; embeddings are re-attached to the deduped
    * candidate ids afterwards, so no exchange carries vectors.
    */
  def lshTopK(
      queries: DataFrame,
      index: DataFrame,
      k: Int = 4,
      tables: Int = 4,
      bits: Int = 8,
      probes: Int = 1): DataFrame =
    rerank(lshCandidates(queries, index, tables, bits, probes), queries, index, k)

  /** LSH candidate ids: distinct (query_id, vec_id) pairs sharing a bucket
    * in any table (query side multi-probed). Id-only — the widest exchange
    * here carries (table, bucket, id) rows, never vectors.
    */
  def lshCandidates(
      queries: DataFrame,
      index: DataFrame,
      tables: Int,
      bits: Int,
      probes: Int = 1): DataFrame = {
    import graft.functions.expressions.VectorExpressions.{lsh_buckets, lsh_buckets_probe}
    val ib = index.select(col("vec_id"),
      posexplode(lsh_buckets(col("embedding"), tables, bits))
        .as(Seq("table", "bucket")))
    val qb = broadcast(queries
      .select(col("query_id"),
        posexplode(lsh_buckets_probe(col("query_vec"), tables, bits, probes))
          .as(Seq("pos", "bucket")))
      .select(col("query_id"), (col("pos") / probes).cast("int").as("table"),
        col("bucket")))
    ib.join(qb, Seq("table", "bucket"))
      .select("query_id", "vec_id")
      .dropDuplicates("query_id", "vec_id")
  }

  /** Agg-form `lshTopK`: same candidates and exact re-rank, but stops at
    * the bounded TopKAgg aggregate — output (query_id, topk) where topk
    * is array<struct<id, score>> best-first. This is the sub-plan the
    * ANN rewrite splices when the USER'S query is the TopKAgg-aggregate
    * kNN formulation (the node replaced is the Aggregate itself, so the
    * substitute must reproduce the aggregate's output shape).
    */
  def lshTopKAgg(
      queries: DataFrame,
      index: DataFrame,
      k: Int = 4,
      tables: Int = 4,
      bits: Int = 8,
      probes: Int = 1): DataFrame =
    rerankAgg(lshCandidates(queries, index, tables, bits, probes), queries, index, k)

  /** Exact re-rank of id-only candidate pairs: re-attach the two vector
    * columns (one equi-join each — queries broadcast), score, bounded
    * TopKAgg top-k. The aggregate formulation ships at most k candidates
    * per query per task; a per-query window would funnel every candidate
    * of a hot query into one sorted partition — the difference between
    * the two at a 100 TB index is the whole point of the ANN path.
    * Identical output to the window form (ties: score desc, id asc).
    */
  private[graft] def rerank(
      cand: DataFrame, queries: DataFrame, index: DataFrame, k: Int): DataFrame =
    explodeTopK(rerankAgg(cand, queries, index, k))

  /** Re-rank stopping at the aggregate: (query_id, topk). */
  private[graft] def rerankAgg(
      cand: DataFrame, queries: DataFrame, index: DataFrame, k: Int): DataFrame = {
    import graft.functions.expressions.TopKAgg.top_k
    cand
      .join(index, Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("score", VectorOps.cosine(col("embedding"), col("query_vec")))
      .groupBy("query_id")
      .agg(top_k(col("score"), col("vec_id"), k).as("topk"))
  }

  /** Re-rank for candidates that already CARRY their embedding column
    * (e.g. read from a persisted inverted list): no re-join against the
    * index — score, then bounded TopKAgg.
    */
  private[graft] def rerankWithVecs(
      cand: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import graft.functions.expressions.TopKAgg.top_k
    explodeTopK(cand
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("score", VectorOps.cosine(col("embedding"), col("query_vec")))
      .groupBy("query_id")
      .agg(top_k(col("score"), col("vec_id"), k).as("topk")))
  }

  /** (query_id, topk) → (query_id, rank, vec_id, score), rank 1-based in
    * topk order (score desc, id asc — TopKAgg's eval order).
    */
  private[graft] def explodeTopK(df: DataFrame): DataFrame =
    df.select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as("vec_id"), col("hit.score").as("score"))

  /** IVF: centroids = per-label means by default (the fixture ships labeled
    * vectors); assignment + probing are broadcast joins on the tiny
    * centroid set.
    */
  def ivfTopK(
      queries: DataFrame,
      index: DataFrame,
      centroids: DataFrame, // (centroid_id, centroid_vec)
      k: Int = 4,
      nProbe: Int = 2): DataFrame =
    rerank(ivfCandidates(queries, index, centroids, nProbe), queries, index, k)

  /** IVF candidate ids: index vectors in the `nProbe` inverted lists
    * closest to each query. Assignment and probing are broadcast joins on
    * the tiny centroid set; the list join ships id rows only.
    */
  /** Nearest-centroid assignment of every index vector (ties: greatest
    * csim, then least centroid_id). Formulated as max_by partial
    * aggregation, NOT a row_number window: the map side collapses the
    * C candidate rows per vector to one before the exchange, so the
    * shuffle carries one row per vector and nothing is sorted — this is
    * the full-index side, the one that matters at 100 TB.
    */
  private def assignToCentroids(index: DataFrame, centroids: DataFrame): DataFrame =
    index.crossJoin(broadcast(centroids))
      .withColumn("csim", VectorOps.cosine(col("embedding"), col("centroid_vec")))
      .groupBy("vec_id")
      .agg(max_by(col("centroid_id"),
        struct(col("csim"), (-col("centroid_id")).as("neg_cid")))
        .as("centroid_id"))

  /** Nearest-centroid assignment CARRYING each vector — the inverted-list
    * materialization shape (one row per vector with its embedding, ready
    * to persist partitioned by centroid). Same max_by partial-agg
    * formulation as `assignToCentroids`.
    */
  private[graft] def assignWithVecs(
      index: DataFrame, centroids: DataFrame): DataFrame =
    index.crossJoin(broadcast(centroids))
      .withColumn("csim", VectorOps.cosine(col("embedding"), col("centroid_vec")))
      .groupBy("vec_id")
      .agg(max_by(struct(col("centroid_id"), col("embedding")),
        struct(col("csim"), (-col("centroid_id")).as("neg_cid"))).as("w"))
      .select(col("vec_id"), col("w.centroid_id").as("centroid_id"),
        col("w.embedding").as("embedding"))

  def ivfCandidates(
      queries: DataFrame,
      index: DataFrame,
      centroids: DataFrame,
      nProbe: Int): DataFrame = {
    val assigned = assignToCentroids(index, centroids)
    assigned.join(broadcast(ivfProbes(queries, centroids, nProbe)),
        Seq("centroid_id"))
      .select("query_id", "vec_id")
  }

  /** The per-query probe set: the `nProbe` centroid ids closest to each
    * query — (query_id, centroid_id), tiny (bounded by the QUERY batch ×
    * nProbe, never by the index). Shared by [[ivfCandidates]],
    * [[ivfSq8Candidates]] and [[graft.sources.AnnIndex.queryIvf]].
    */
  private[graft] def ivfProbes(queries: DataFrame, centroids: DataFrame,
      nProbe: Int): DataFrame = {
    val qw = Window.partitionBy("query_id").orderBy(desc("qsim"), asc("centroid_id"))
    queries.crossJoin(broadcast(centroids))
      .withColumn("qsim", VectorOps.cosine(col("query_vec"), col("centroid_vec")))
      .withColumn("qrk", row_number().over(qw))
      .filter(col("qrk") <= nProbe)
      .select(col("query_id"), col("centroid_id"))
  }

  /** [[assignWithVecs]] composed with per-row SQ8 quantization: the
    * IVF-SQ8 inverted-list materialization — one row per vector carrying
    * its int8 codes (NOT its float embedding) under its nearest
    * centroid, the layout [[graft.sources.AnnIndex.ensureIvfSq8]]
    * persists partitioned by `centroid_id`.
    */
  private[graft] def assignQuantized(
      index: DataFrame, centroids: DataFrame): DataFrame = {
    import graft.functions.expressions.VectorExpressions.{max_abs, quantize_i8}
    assignWithVecs(index, centroids)
      .select(col("centroid_id"), col("vec_id"),
        quantize_i8(col("embedding")).as("codes"),
        (max_abs(col("embedding")) / 127.0).as("qscale"),
        VectorOps.l2Norm(col("embedding")).as("qnorm"))
  }

  /** IVF-SQ8 candidate ids: probe the `nProbe` closest inverted lists,
    * scan ONLY those lists' int8 codes (integer-dot approximate cosine),
    * keep the top `m` per query. The two measured scan reductions
    * multiply: probed-lists row pruning (IVF) × 4×-smaller bytes per
    * scanned row (SQ8). `qlists` is the quantized-list layout of
    * [[assignQuantized]]; each probe row carries its query's quantized
    * codes so the scan stage needs no second query-side join.
    */
  private[graft] def ivfSq8Candidates(
      queries: DataFrame,
      qlists: DataFrame, // (centroid_id, vec_id, codes, qscale, qnorm)
      centroids: DataFrame,
      nProbe: Int,
      m: Int): DataFrame = {
    import graft.functions.expressions.TopKAgg.top_k
    import graft.functions.expressions.VectorExpressions.dot_i8
    val qq = quantizeIndex(queries, idCol = "query_id", vecCol = "query_vec")
      .select(col("query_id"), col("codes").as("qcodes"),
        col("qscale").as("qqscale"), col("qnorm").as("qqnorm"))
    val probes = ivfProbes(queries, centroids, nProbe).join(qq, Seq("query_id"))
    qlists
      .join(broadcast(probes), Seq("centroid_id"))
      .withColumn("ascore",
        when(col("qnorm") * col("qqnorm") === 0.0, lit(0.0))
          .otherwise(dot_i8(col("codes"), col("qcodes")).cast("double")
            * col("qscale") * col("qqscale")
            / (col("qnorm") * col("qqnorm"))))
      .groupBy("query_id")
      .agg(top_k(col("ascore"), col("vec_id"), m).as("topk"))
      .select(col("query_id"), explode(col("topk.id")).as("vec_id"))
  }

  /** Composed IVF-SQ8 ANN, in-memory form (the direct/demo path —
    * [[graft.sources.AnnIndex.ensureIvfSq8]]/`queryIvfSq8` is the
    * serving shape): probe → quantized-list scan → exact float re-rank
    * of the m winners. Relative to [[ivfTopK]] at the same (centroids,
    * nProbe), the inner SQ8 layer is MEASURED output-identical at the
    * shipped m (`AnnTune ivfsq8`; the q109 invariant pins both that
    * identity and the recall floor vs the exact kNN in CI) — so the
    * composition inherits exactly IVF's probe recall while scanning a
    * quarter of the bytes per probed row. Certify a new (nProbe, m)
    * point the same way before serving it.
    */
  def ivfSq8TopK(
      queries: DataFrame,
      index: DataFrame,
      centroids: DataFrame,
      k: Int = 4,
      nProbe: Int = 2,
      m: Int = 32): DataFrame = {
    require(m >= k, s"candidate count m ($m) must be >= k ($k)")
    rerank(
      ivfSq8Candidates(queries, assignQuantized(index, centroids),
        centroids, nProbe, m),
      queries, index, k)
  }

  /** [[assignWithVecs]] composed with 1-bit sign packing: the IVF-BQ
    * inverted-list materialization — one row per vector carrying its
    * ⌈dim/8⌉-byte binary code under its nearest centroid (the faiss
    * `IVFx,..` + binary-refine shape; Qdrant/Weaviate's "binary
    * quantization inside the index" serving layout, public).
    */
  private[graft] def assignBinary(
      index: DataFrame, centroids: DataFrame): DataFrame = {
    import graft.functions.expressions.VectorExpressions.sign_pack
    assignWithVecs(index, centroids)
      .select(col("centroid_id"), col("vec_id"),
        sign_pack(col("embedding")).as("bcodes"))
  }

  /** IVF-BQ candidate ids: probe the `nProbe` closest inverted lists,
    * Hamming-scan ONLY those lists' 1-bit codes, keep the top `m` per
    * query. The two scan reductions multiply: probed-lists row pruning
    * (IVF) × 32×-smaller bytes per scanned row (BQ) — 8× past even
    * IVF-SQ8's bytes, paid for with the fatter re-rank margin the
    * binary family needs ([[binaryTopK]]'s contract: high ambient dim
    * is a precondition, certify (nProbe, m) against the float path
    * before serving — `AnnTune ivfbq`, q168).
    */
  private[graft] def ivfBqCandidates(
      queries: DataFrame,
      blists: DataFrame, // (centroid_id, vec_id, bcodes)
      centroids: DataFrame,
      nProbe: Int,
      m: Int): DataFrame = {
    import graft.functions.expressions.TopKAgg.top_k
    import graft.functions.expressions.VectorExpressions.{hamming, sign_pack}
    val bq = queries.select(col("query_id"),
      sign_pack(col("query_vec")).as("qbcodes"))
    val probes = ivfProbes(queries, centroids, nProbe).join(bq, Seq("query_id"))
    blists
      .join(broadcast(probes), Seq("centroid_id"))
      .withColumn("ascore",
        -hamming(col("bcodes"), col("qbcodes")).cast("double"))
      .groupBy("query_id")
      .agg(top_k(col("ascore"), col("vec_id"), m).as("topk"))
      .select(col("query_id"), explode(col("topk.id")).as("vec_id"))
  }

  /** Composed IVF-BQ ANN, in-memory form: probe → 1-bit Hamming list
    * scan → exact float re-rank of the m winners. Certify identity to
    * [[ivfTopK]] at the same (centroids, nProbe) before serving — the
    * [[ivfSq8TopK]] discipline with the binary family's fatter m.
    */
  def ivfBqTopK(
      queries: DataFrame,
      index: DataFrame,
      centroids: DataFrame,
      k: Int = 4,
      nProbe: Int = 2,
      m: Int = 256): DataFrame = {
    require(m >= k, s"candidate count m ($m) must be >= k ($k)")
    rerank(
      ivfBqCandidates(queries, assignBinary(index, centroids),
        centroids, nProbe, m),
      queries, index, k)
  }

  /** [[assignWithVecs]] composed with PQ encoding: the IVF-PQ
    * inverted-list materialization — one row per vector carrying its
    * `numSub`-byte PQ codes (not its float embedding, not even SQ8's
    * byte-per-component) under its nearest centroid. The faiss
    * `IVFx,PQy` factory layout (public).
    */
  private[graft] def assignPqEncoded(
      index: DataFrame, centroids: DataFrame, codebook: Array[Double],
      numSub: Int, ksub: Int): DataFrame = {
    import graft.functions.expressions.PqExpressions.pq_encode
    assignWithVecs(index, centroids)
      .select(col("centroid_id"), col("vec_id"),
        pq_encode(col("embedding"), codebook, numSub, ksub).as("pqcodes"),
        VectorOps.l2Norm(col("embedding")).as("pnorm"))
  }

  /** IVF-PQ candidate ids: probe the `nProbe` closest inverted lists,
    * ADC-scan ONLY those lists' PQ codes, keep the top `m` per query.
    * The two scan reductions multiply — probed-lists row pruning (IVF)
    * × numSub bytes per scanned row (PQ: 16× under float at the
    * shipped layout, vs SQ8's 4×). Each probe row carries its query's
    * ADC table, so the scan stage needs no second query-side join
    * (the [[ivfSq8Candidates]] shape).
    */
  private[graft] def ivfPqCandidates(
      queries: DataFrame,
      plists: DataFrame, // (centroid_id, vec_id, pqcodes, pnorm)
      centroids: DataFrame,
      codebook: Array[Double],
      numSub: Int, ksub: Int,
      nProbe: Int,
      m: Int): DataFrame = {
    import graft.functions.expressions.PqExpressions.{pq_adc_dot, pq_table}
    import graft.functions.expressions.TopKAgg.top_k
    val qt = queries.select(col("query_id"),
      pq_table(col("query_vec"), codebook, numSub, ksub).as("adc"),
      VectorOps.l2Norm(col("query_vec")).as("qqnorm"))
    val probes = ivfProbes(queries, centroids, nProbe).join(qt, Seq("query_id"))
    plists
      .join(broadcast(probes), Seq("centroid_id"))
      .withColumn("ascore",
        when(col("pnorm") * col("qqnorm") === 0.0, lit(0.0))
          .otherwise(pq_adc_dot(col("pqcodes"), col("adc"))
            / (col("pnorm") * col("qqnorm"))))
      .groupBy("query_id")
      .agg(top_k(col("ascore"), col("vec_id"), m).as("topk"))
      .select(col("query_id"), explode(col("topk.id")).as("vec_id"))
  }

  /** Composed IVF-PQ ANN, in-memory form: probe → PQ-coded-list ADC
    * scan → exact float re-rank of the m winners. The PQ layer inside
    * the probed lists is MEASURED output-identical to [[ivfTopK]] at
    * the same (centroids, nProbe) for the certified (numSub, ksub, m)
    * (`AnnTune ivfpq`; the q121 invariant pins it in CI alongside the
    * q68-style recall floor) — the composition inherits exactly IVF's
    * probe recall while scanning the probed rows at 1/16 of the float
    * bytes. Train-once reuse via `codebooks`, like [[pqTopK]].
    */
  def ivfPqTopK(
      queries: DataFrame,
      index: DataFrame,
      centroids: DataFrame,
      k: Int = 4,
      nProbe: Int = 2,
      m: Int = 64,
      numSub: Int = 16,
      ksub: Int = 64,
      iters: Int = 2,
      codebooks: Option[DataFrame] = None): DataFrame = {
    require(m >= k, s"candidate count m ($m) must be >= k ($k)")
    val cb = codebooks.getOrElse(pqCodebooks(index, numSub, ksub, iters))
    val flat = collectCodebook(cb, numSub, ksub)
    rerank(
      ivfPqCandidates(queries,
        assignPqEncoded(index, centroids, flat, numSub, ksub),
        centroids, flat, numSub, ksub, nProbe, m),
      queries, index, k)
  }

  /** Deterministic Lloyd refinement: start from the given centroids (e.g.
    * label means), run `iters` rounds of nearest-centroid assignment +
    * per-cluster re-averaging. Pure DataFrame ops — assignment is a
    * broadcast join, the re-average is one (centroid, dim) aggregate; the
    * lineage is checkpoint-truncated per round like `Dedup.clusters`.
    * Sharper centroids raise IVF recall at the same nProbe.
    */
  def kMeansRefine(index: DataFrame, centroids: DataFrame, iters: Int): DataFrame = {
    if (iters <= 0) return centroids
    import graft.functions.expressions.VectorExpressions.nearest_centroid_cos
    val spark = index.sparkSession
    import spark.implicits._
    // Lloyd state is MODEL-SIZED (k × dim doubles — the same bound the
    // seed collects rely on), so the loop keeps the centroids on the
    // driver and pays ONE Spark job per round: assignment as a map-side
    // expression (NearestCentroidCosF — bit-identical cosine and tie
    // rule to the old crossJoin + max_by), then ONE (centroid, dim)
    // partial-aggregated avg whose k·dim-bounded result is collected
    // and folded on the driver (empty clusters keep their previous
    // position, the old anti-join rule). The old loop paid, per round:
    // a broadcast build, the assignment exchange, meanVectors' TWO
    // exchanges ((key, dim) avg then collect_list reassembly), the
    // anti-join and an EAGER checkpoint — JobProfile attributed ~6 s of
    // q197 to those stages (guide §1.2 step 1; §5 — model state lives
    // on the driver, row state on the executors).
    val init = centroids.select(col("centroid_id"), col("centroid_vec"))
      .as[(Int, Seq[Double])].collect().sortBy(_._1) // k-bounded model collect
    require(init.nonEmpty, "kMeansRefine: empty centroid set")
    val dim = init.head._2.length
    val k = init.length
    val ids = init.map(_._1)
    var flat = new Array[Double](k * dim)
    for (((_, v), j) <- init.zipWithIndex; i <- 0 until dim)
      flat(j * dim + i) = v(i)
    for (_ <- 1 to iters) {
      // the assignment is computed in its OWN projection BELOW the
      // explode — a generator expression in the same select would put
      // the k·dim kernel in the Project ABOVE the Generate, evaluating
      // it once per (row, dim) instead of once per row (measured: a
      // dim× blow-up that turned q197's training into minutes)
      val rows = index
        .select(nearest_centroid_cos(col("embedding"), flat, k).as("ord"),
          VectorOps.toDouble(col("embedding")).as("v"))
        .select(col("ord"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("ord", "d")
        .agg(avg(col("x")).as("m"))
        .collect()
      val next = flat.clone()
      rows.foreach { r =>
        next(r.getInt(0) * dim + r.getInt(1)) = r.getDouble(2)
      }
      flat = next
    }
    // ONE partition — model-sized output the IVF stores write verbatim
    // (see pqCodebooks' note on file counts and the maintain floor)
    ids.zipWithIndex.map { case (id, j) =>
      (id, (0 until dim).map(i => flat(j * dim + i)))
    }.toSeq.toDF("centroid_id", "centroid_vec")
      .coalesce(1)
  }

  /** Deterministic k-means: seeds are the k index vectors with the
    * smallest xxhash64(vec_id) — a reproducible pseudo-random draw that is
    * stable under repartitioning — refined with `iters` Lloyd rounds.
    * Finer lists than the label partition → higher IVF recall at the same
    * probed fraction.
    */
  def kMeansCentroids(index: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    // seed ranks are assigned on the driver over the (≤ k)-row seed draw
    // — the collect is bounded by k, never by the index (the
    // kMeansCentroidsPP sample discipline) — instead of a row_number over
    // an unpartitioned Window, which planned a single-partition WindowExec
    // (k-bounded, but logged a spurious scale warning on every build)
    val seedVecs = index
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy("h", "vec_id").limit(k)
      .select(VectorOps.toDouble(col("embedding")).as("v"))
      .as[Seq[Double]].collect()
    val seeds = seedVecs.toSeq.zipWithIndex
      .map { case (v, i) => (i + 1, v) }
      .toDF("centroid_id", "centroid_vec")
    // broadcast applied at the assignment join inside kMeansRefine; a
    // var-level hint would (unsupportedly) also hint the left side of
    // the empty-cluster anti-join
    kMeansRefine(index, seeds, iters)
  }

  /** Deterministic farthest-first (k-center) seeding on a BOUNDED sample
    * + Lloyd refinement — the k-means++-style quality upgrade over the
    * hash draw of `kMeansCentroids`. The sample (at most `sampleSize`
    * rows, chosen by the same stable xxhash64 order) is collected to the
    * driver: that is the standard sample-based seeding at any scale — the
    * collect is bounded by `sampleSize`, never by the index — and seed
    * selection is O(sample × k) local work. Seeds spread across the data
    * (each next seed = the sample vector farthest in cosine from every
    * chosen seed), which is what the pure hash draw lacks: it can land
    * several seeds in one dense cluster and leave whole regions unseeded.
    */
  def kMeansCentroidsPP(
      index: DataFrame, k: Int, iters: Int, sampleSize: Int = 4096): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val sample = index
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy("h", "vec_id").limit(sampleSize)
      .select(VectorOps.toDouble(col("embedding")).as("v"))
      .as[Seq[Double]].collect().map(_.toArray)
    require(sample.nonEmpty, "kMeansCentroidsPP: empty index")
    val unit = sample.map { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nSeeds = math.min(k, unit.length)
    val chosen = scala.collection.mutable.ArrayBuffer(unit.head)
    val maxSim = unit.map(v => dot(v, unit.head))
    while (chosen.size < nSeeds) {
      var bi = 0
      var best = Double.MaxValue
      var i = 0
      while (i < unit.length) {
        if (maxSim(i) < best) { best = maxSim(i); bi = i }
        i += 1
      }
      chosen += unit(bi)
      i = 0
      while (i < unit.length) {
        maxSim(i) = math.max(maxSim(i), dot(unit(i), chosen.last))
        i += 1
      }
    }
    val seeds = chosen.toSeq.zipWithIndex
      .map { case (v, i) => (i + 1, v.toSeq) }
      .toDF("centroid_id", "centroid_vec")
    // broadcast applied at the assignment join inside kMeansRefine; a
    // var-level hint would (unsupportedly) also hint the left side of
    // the empty-cluster anti-join
    kMeansRefine(index, seeds, iters)
  }

  /** Element-wise mean vector per key: posexplode + two-level agg — one
    * shuffle on (key, dim), then array reassembly in dim order. Shared by
    * the A8 label centroid and every Lloyd re-average round.
    */
  private def meanVectors(
      df: DataFrame, keyCol: String, vecCol: String, outCol: String): DataFrame =
    df.select(col(keyCol), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(keyCol, "dim")
      .agg(avg("v").as("mean_v"))
      .groupBy(keyCol)
      .agg(array_sort(collect_list(struct(col("dim"), col("mean_v"))))
        .getField("mean_v").as(outCol))

  /** Per-label centroid (operator A8). */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    meanVectors(embeddings, "label", "embedding", "centroid_vec")
      .withColumnRenamed("label", "centroid_id")

  /** Energy-compacting rotation model: rows of `rot` (row-major d×d)
    * are the eigenvectors of the corpus's UNCENTERED second-moment
    * matrix E[x xᵀ], eigenvalue-descending — the PCA axis alignment
    * that OPQ (Ge et al., "Optimized Product Quantization", CVPR '13 /
    * faiss `OPQMatrix`, public) seeds from. `eigvals` are the
    * per-rotated-component mean energies (the spectrum).
    */
  final case class RotationModel(rot: Array[Double],
      eigvals: Array[Double], dim: Int)

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (flattened
    * row-major) — deterministic, O(d³) per sweep, driver-side on a
    * BOUNDED d² model artifact (the collectCodebook discipline; d=64
    * → 4 096 doubles, d=1536 → 2.4 M — model-sized, never corpus-
    * sized). Returns (eigenvalues, eigenvector-COLUMNS matrix).
    */
  private[graft] def jacobiEig(s: Array[Double], d: Int): (Array[Double], Array[Double]) = {
    require(s.length == d * d, s"jacobiEig: ${s.length} != $d^2")
    val a = s.clone()
    val v = Array.tabulate(d * d)(i => if (i / d == i % d) 1.0 else 0.0)
    def off2(): Double = {
      var t = 0.0; var p = 0
      while (p < d) {
        var q = 0
        while (q < d) {
          if (p != q) t += a(p * d + q) * a(p * d + q); q += 1
        }
        p += 1
      }
      t
    }
    var fro2 = 0.0
    var i = 0
    while (i < a.length) { fro2 += a(i) * a(i); i += 1 }
    var sweep = 0
    while (sweep < 64 && off2() > 1e-24 * math.max(1.0, fro2)) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p * d + q)
          if (apq != 0.0) {
            val theta = (a(q * d + q) - a(p * d + p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1))
              else 1.0 / (theta - math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(t * t + 1)
            val sn = t * c
            var k = 0
            while (k < d) {
              val akp = a(k * d + p); val akq = a(k * d + q)
              a(k * d + p) = c * akp - sn * akq
              a(k * d + q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p * d + k); val aqk = a(q * d + k)
              a(p * d + k) = c * apk - sn * aqk
              a(q * d + k) = sn * apk + c * aqk
              val vkp = v(k * d + p); val vkq = v(k * d + q)
              v(k * d + p) = c * vkp - sn * vkq
              v(k * d + q) = sn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i * d + i)), v)
  }

  /** Fit the rotation from the corpus: ONE map-side-partial
    * [[graft.functions.SecondMomentAgg]] pass (d² doubles per task),
    * Jacobi on the driver. Because the moment is uncentered, the
    * rotation is a pure isometry: dot products, norms and cosines of
    * rotated vectors equal the originals EXACTLY (up to double
    * rounding), so rotated search is output-identical to plain search
    * by algebra (q164 pins it against the plain exact-kNN oracle) —
    * while per-component energy concentrates into the leading rotated
    * axes, which is what a downstream quantizer (SQ8 truncation, PQ
    * subspace split, MRL prefix) feeds on. `AnnTune rot` measures the
    * compaction on the fixtures.
    */
  def rotationModel(index: DataFrame, vecCol: String = "embedding"): RotationModel = {
    import graft.functions.SecondMomentAgg
    val s = index.select(
        SecondMomentAgg.asColumn(col(vecCol).cast("array<float>")).as("s"))
      .head().getSeq[Double](0).toArray
    require(s.nonEmpty, "rotationModel: empty corpus")
    val d = math.round(math.sqrt(s.length.toDouble)).toInt
    val (eig, vcols) = jacobiEig(s, d)
    val order = (0 until d).sortBy(i => -eig(i))
    val rot = new Array[Double](d * d)
    var r = 0
    while (r < d) {
      val src = order(r)
      var c = 0
      while (c < d) { rot(r * d + c) = vcols(c * d + src); c += 1 }
      r += 1
    }
    RotationModel(rot, order.map(eig).toArray, d)
  }

  /** Rotate a vector column by a fitted [[RotationModel]] (per-row
    * native mat-vec kernel, model as literal — zero shuffle, zero
    * joins). Output replaces `vecCol` with the rotated array<double>.
    */
  def rotate(df: DataFrame, model: RotationModel,
      vecCol: String = "embedding"): DataFrame = {
    import graft.functions.expressions.VectorExpressions.mat_vec
    df.withColumn(vecCol, mat_vec(col(vecCol), model.rot, model.dim))
  }

  /** Parametric-OPQ dimension allocation (Ge et al. CVPR '13 §4
    * "eigenvalue allocation" / faiss `OPQMatrix`'s PCA initialization,
    * public): a PCA rotation ALONE makes PQ worse — it piles the
    * corpus's energy into the first subspace (one 64-centroid
    * quantizer eats 85% of the variance while the rest encode noise;
    * AnnTune `opq` measures exactly that). The fix is the published
    * balanced assignment: distribute the eigen-components across the
    * `numSub` subspaces so per-subspace variance PRODUCTS equalize —
    * greedily, largest eigenvalue first, into the non-full subspace
    * with the smallest log-energy load (ties → lowest subspace,
    * deterministic). Returns the component order; permuting the
    * rotation's rows by it keeps it orthogonal.
    */
  def balancedOrder(eigvals: Array[Double], numSub: Int): Array[Int] = {
    val d = eigvals.length
    require(numSub >= 1 && d % numSub == 0,
      s"balancedOrder: numSub=$numSub must divide dim=$d")
    val dsub = d / numSub
    val byEnergy = (0 until d).sortBy(i => (-eigvals(i), i))
    val load = Array.fill(numSub)(0.0)
    val fill = Array.fill(numSub)(0)
    val buckets = Array.fill(numSub)(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    byEnergy.foreach { dim =>
      // level-fill: compare log-loads only among the LEAST-FILLED
      // buckets — comparing across fill levels degenerates (an empty
      // bucket's load 0 never wins against sub-1 eigenvalues' negative
      // logs, and the whole spectrum piles into one subspace)
      val open = (0 until numSub).filter(fill(_) < dsub)
      val minFill = open.map(fill).min
      val b = open.filter(fill(_) == minFill).minBy(j => (load(j), j))
      buckets(b) += dim
      fill(b) += 1
      load(b) += math.log(math.max(eigvals(dim), 1e-12))
    }
    buckets.flatMap(_.toSeq).toArray
  }
}
