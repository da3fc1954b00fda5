package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import graft.functions.expressions.HashExpressions
import graft.operators.{Analyze, CorpusOps, CountMin, Dedup, Evaluation, Frequency, Funnel, KeywordSearch, Layout, QualityClassifier, SimilaritySearch, Sketches, SnapshotDiff, TextAnalysis, ZOrder}
import graft.rag.RagPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RAG-surface, dedup, similarity-search, text-analysis and multimodal
  * queries (SURVEY.md §2.1–2.3, §2.6 T2, A8/A9 + the BASELINE.json
  * north-star operator set). Queries whose semantics are SQL-expressible
  * carry a DuckDB oracle; hash-based ops (minhash/simhash/xxhash
  * fingerprints) and the embedder get rows-only checks plus ScalaTest
  * coverage.
  */
object PipelineQueries {
  private type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** Scale-adaptive fan-out for CPU-heavy per-row passes (md5/KMV
    * hashing, shingling, deflate, n-gram explodes): the small fixture
    * parquet reads as 1–3 row-group-bound splits, serializing the whole
    * pass on a 32-core session (the q226 embed-pass finding, measured
    * again on q173: the 7-column md5+KMV aggregate ran 6.9 s on the
    * 3-split scan vs 1.85 s after a 32-way fan-out, shuffle included).
    * No-op whenever the input already carries >= defaultParallelism
    * partitions — the 100 TB case, where a blanket repartition would be
    * a full payload shuffle for nothing. Only for ORDER-INSENSITIVE
    * consumers (exact counts/min/max/integer sums, hash sketches):
    * round-robin repartition reorders rows, so a float-summation
    * consumer could shift in the last ulp.
    */
  private def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions >= p) df
    else df.repartition(p)
  }

  /** Fixed retrieval query strings (vocabulary-aligned with the fixture
    * corpus so top-4 is non-degenerate).
    */
  val RetrievalQueries: Seq[(Long, String)] = Seq(
    1L -> "spark join shuffle partition",
    2L -> "vector index scan fast",
    3L -> "customer order value table",
    4L -> "window agg batch row",
    5L -> "hash merge filter column")

  def retrievalQueryDf(s: SparkSession): DataFrame = {
    import s.implicits._
    RetrievalQueries.toDF("query_id", "query_text")
  }

  def queries: Map[String, Q] = Map(
    // C1 chunker, oracled via the lossless-reassembly property:
    // chunks joined by the separator reconstruct trim(text) exactly
    // (overlap=0, space-separated corpus).
    "q26_chunk_reassembly" -> ((s, dir) => {
      // pure-builtin ordered concat (the q48 shape): stays in whole-stage
      // codegen — no groupByKey/mapGroups object-serialization stage
      RagPipeline.chunkDocuments(s, t(s, dir, "documents"), chunkSize = 120)
        .toDF()
        .groupBy("doc_id")
        .agg(concat_ws(" ",
          array_sort(collect_list(struct(col("chunk_index"), col("text"))))
            .getField("text")).as("reassembled"))
        .select(col("doc_id"), col("reassembled"),
          length(col("reassembled")).as("reassembled_len"))
    }),

    // C1 raw chunk rows (rows-only: boundaries tested in ScalaTest)
    "q27_chunks" -> ((s, dir) => {
      RagPipeline.chunkDocuments(s, t(s, dir, "documents"), chunkSize = 120)
        .toDF()
        .select(col("doc_id"), col("chunk_index"),
          length(col("text")).as("chunk_len"), col("text"))
    }),

    // E1+E2: full RAG retrieval — chunk, embed, cosine top-4 per query
    // (rows-only: embedder is not SQL-expressible; invariants in tests)
    "q28_rag_retrieval" -> ((s, dir) => {
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200)
      RagPipeline.retrieve(retrievalQueryDf(s), index, k = 4)
        .select(col("query_id"), col("rank"), col("chunk_id"), col("doc_id"),
          round(col("score"), 6).as("score"))
    }),

    // E2 context assembly (stuff-chain concat)
    "q29_rag_context" -> ((s, dir) => {
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200)
      val retrieved = RagPipeline.retrieve(retrievalQueryDf(s), index, k = 4)
      RagPipeline.assembleContext(retrieved)
        .select(col("query_id"), length(col("context")).as("context_len"),
          col("n_chunks"))
    }),

    // A9 exact dedup
    "q30_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"))
        .select("keep_doc_id", "n_copies")
    }),

    // A9 exact n-gram Jaccard pairs (full SQL oracle)
    "q31_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccard(t(s, dir, "documents"), k = 3, threshold = 0.12)
        .select(col("doc_id_a"), col("doc_id_b"),
          round(col("jaccard"), 6).as("jaccard"))
    }),

    // A9 MinHash+LSH near-dup, run in the banding's reliable regime:
    // with r=2 rows x b=16 bands the S-curve midpoint is (1/16)^(1/2) =
    // 0.25. The ~1e-7 miss bound holds for pairs at jaccard >= 0.8 (the
    // fixtures' near-dup level); a pair at exactly the emitted threshold
    // 0.5 would be missed with probability (1-0.25)^16 ~ 1%. The
    // hash-match against the exact-Jaccard oracle is therefore
    // FIXTURE-MEASURED: it certifies equality because every fixture pair
    // above 0.5 is also above 0.8 (verified at all three scales) — pairs
    // landing in [0.5, 0.8) are found with prob >= 0.99, not guaranteed.
    // Low thresholds belong to the exact path (q31): no minhash banding
    // is reliable at jaccard ~0.12.
    "q32_minhash_lsh" -> ((s, dir) => {
      Dedup.minHashLsh(t(s, dir, "documents"), k = 3, numHashes = 32,
        bands = 16, threshold = 0.5)
        .select(col("doc_id_a"), col("doc_id_b"),
          round(col("jaccard"), 6).as("jaccard"))
    }),

    // A9 SimHash near-dup (rows-only). maxHamming < pieces keeps the
    // pigeonhole guarantee: every pair within the distance shares a piece
    "q33_simhash" -> ((s, dir) => {
      Dedup.simHashDedup(t(s, dir, "documents"), maxHamming = 3, pieces = 4)
    }),

    // A9 embedding-cosine near-dup pairs (SQL oracle, double math).
    // Threshold 0.35 < LshCosineFloor routes through the exact all-pairs
    // form — no LSH family serves the 0.35–0.75 cosine band
    // sub-quadratically (measured; COVERAGE.md A9).
    "q34_embedding_pairs" -> ((s, dir) => {
      Dedup.embeddingCosine(t(s, dir, "embeddings"), threshold = 0.35)
        .select(col("vec_id_a"), col("vec_id_b"),
          round(col("cos"), 6).as("cos"))
    }),

    // A9 invariant closure for the BELOW-floor sub-quadratic mode
    // (embeddingCosineClustered): k-means top-4 list assignment,
    // list-local pairing, exact verification. Soundness must be exact
    // (n_unsound = 0: every emitted pair re-verified ⊆ the exact set);
    // completeness is approximate by design and MEASURED — the floor is
    // 0.8 at the shipped point (lists = max(8, n/64), assignTop = 4;
    // DedupTune cosine: recall 1.000 / 0.996 / 0.837 at n = 500 / 500 /
    // 2000 across the three fixtures, soundness exact everywhere).
    // This is the measured contract for the 0.35–0.75 band where no
    // family is sub-quadratic: recall tracks the absolute `lists` count
    // (at 10× the n/64 rule measures 0.44 — BASELINE.md round-5 table),
    // so the mode is a constant-factor a²/lists win at a measured
    // recall, chosen per corpus; above the floor the LSH mode is
    // complete (q69).
    "q77_cosine_clustered" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val n = emb.count()
      val lists = math.max(8L, n / 64).toInt
      val approx = Dedup.embeddingCosineClustered(emb, threshold = 0.35,
        lists = lists, assignTop = 4)
        .select("vec_id_a", "vec_id_b")
      val exact = Dedup.embeddingCosineExact(emb, threshold = 0.35)
        .select("vec_id_a", "vec_id_b")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(approx.join(exact, Seq("vec_id_a", "vec_id_b"),
          "left_anti").agg(count(lit(1)).as("n_unsound")))
        .crossJoin(exact.join(approx, Seq("vec_id_a", "vec_id_b"),
          "left_semi").agg(count(lit(1)).as("n_found")))
        .select(col("n_exact"),
          (col("n_unsound") === 0).as("sound_ok"),
          (col("n_found") >= col("n_exact") * 0.8).as("recall_ok"))
    }),

    // A9 invariant closure for the sub-quadratic embeddingCosine mode:
    // at threshold 0.9 (>= LshCosineFloor) the LSH-routed pair set must
    // equal the exact all-pairs set — soundness (n_extra=0: every
    // candidate is re-verified with the exact cosine) AND completeness
    // (n_missed=0: at cos 0.9 the 64×8-bit banding misses a pair with
    // prob ~3e-10). Mirrors the q61 simhash-banding pattern; the exact
    // side is the quadratic baseline the LSH mode replaces.
    "q69_cosine_lsh_invariants" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val viaLsh = Dedup.embeddingCosine(emb, threshold = 0.9)
        .select("vec_id_a", "vec_id_b")
      val exact = Dedup.embeddingCosineExact(emb, threshold = 0.9)
        .select("vec_id_a", "vec_id_b")
      emb.agg(count(lit(1)).as("n_vecs"))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact_pairs")))
        .crossJoin(exact.join(viaLsh, Seq("vec_id_a", "vec_id_b"), "left_anti")
          .agg(count(lit(1)).as("n_missed")))
        .crossJoin(viaLsh.join(exact, Seq("vec_id_a", "vec_id_b"), "left_anti")
          .agg(count(lit(1)).as("n_extra")))
    }),

    // J1+T2 exact kNN: first 8 vectors as queries, cosine top-4
    "q35_knn_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      SimilaritySearch.bruteForceTopK(q, emb, k = 4)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // O3 LSH ANN path (rows-only; recall floor pinned by q60). Operating
    // point from graft.tools.AnnTune: recall@4 = 0.875 / 0.969 / 0.938 on
    // sf0.001 / 0.01 / 0.1 at a 26-28% candidate fraction.
    "q36_lsh_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      SimilaritySearch.lshTopK(q, emb, k = 4, tables = 64, bits = 12,
          probes = 16)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // O3 IVF ANN path (rows-only; recall floor pinned by q60/q68), now
    // against the PERSISTED inverted-file index: the k-means build runs
    // once per fixture (AnnIndex.ensureIvf) and the query is probe →
    // partition-pruned list scan → re-rank — the reference's
    // index-once/query-many lifecycle (AI.py:47-55 vs :138).
    // Operating point (AnnTune sweep, all 3 scales, hash seeding):
    // 64 lists / 24 probes → recall@4 = 0.875 / 0.938 / 0.906 at
    // sf0.001 / 0.01 / 0.1 at a 0.37 candidate fraction — the first point
    // clearing the 0.85 floor at EVERY scale. Farthest-first seeding
    // (kMeansCentroidsPP) wins at the two small scales but degrades at
    // sf0.1 (outlier-chasing, the classic k-center failure), so the
    // shipped index keeps the hash draw.
    "q37_ivf_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val h = graft.sources.AnnIndex.ensureIvf(s, dir,
        emb.select("vec_id", "embedding"), lists = 64, iters = 5)
      graft.sources.AnnIndex.queryIvf(q, h, k = 4, nProbe = 24)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // O3 persisted-LSH index at the recall-1.0 operating point (the q59
    // rewrite's 64×12×48): the bucket table is built once per fixture and
    // the query pushes its probed buckets into the bucketed scan — no
    // signature recomputation. Hash-matching the EXACT kNN oracle proves
    // the persisted path is output-identical at this operating point.
    "q67_lsh_persisted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val h = graft.sources.AnnIndex.ensureLsh(s, dir,
        emb.select("vec_id", "embedding"), tables = 64, bits = 12)
      graft.sources.AnnIndex.queryLsh(q, h, k = 4, probes = 48)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // Invariant closure for the persisted paths (mirrors q60): recall@4
    // of the persisted LSH (q36's 64×12×16 point) and the persisted IVF
    // (q37's 64-list/24-probe point) against the exact top-k, floored
    // at 0.85 (LSH) / 0.84 (IVF — one flipped-neighbor headroom below
    // the 0.875 sf0.001 measurement, see q60's note on Lloyd summation
    // order) — the floors must hold at EVERY fixture scale.
    "q68_ivf_persisted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val exact = SimilaritySearch.bruteForceTopK(q, emb, k = 4)
        .select("query_id", "vec_id")
      val lshH = graft.sources.AnnIndex.ensureLsh(s, dir,
        emb.select("vec_id", "embedding"), tables = 64, bits = 12)
      val lsh = graft.sources.AnnIndex.queryLsh(q, lshH, k = 4, probes = 16)
        .select("query_id", "vec_id")
      val ivfH = graft.sources.AnnIndex.ensureIvf(s, dir,
        emb.select("vec_id", "embedding"), lists = 64, iters = 5)
      val ivf = graft.sources.AnnIndex.queryIvf(q, ivfH, k = 4, nProbe = 24)
        .select("query_id", "vec_id")
      exact.agg(countDistinct("query_id").as("n_queries"),
          count(lit(1)).as("n_exact"))
        .crossJoin(exact.join(lsh, Seq("query_id", "vec_id"), "left_semi")
          .agg(count(lit(1)).as("lsh_hits")))
        .crossJoin(exact.join(ivf, Seq("query_id", "vec_id"), "left_semi")
          .agg(count(lit(1)).as("ivf_hits")))
        .select(col("n_queries"), col("n_exact"),
          (col("lsh_hits") >= col("n_exact") * 0.85).as("lsh_persisted_ok"),
          (col("ivf_hits") >= col("n_exact") * 0.84).as("ivf_persisted_ok"))
    }),

    // S4 incremental upsert, LSH: build the index on 90% of the vectors
    // (vec_id % 10 != 7), upsert the remaining 10% WITHOUT a rebuild
    // (AnnIndex.upsertLsh appends signatures + vectors; the meta
    // checksum xor-composes), then query at the recall-1.0 operating
    // point (q59's 64×12×48). Hash-matching the exact-kNN oracle over
    // the FULL vector set proves upsert ≡ rebuild: a vector arriving by
    // append is exactly as findable as one present at build time —
    // the reference's index-once/upsert-many lifecycle
    // (`AI.py:53-55` upsert vs `AI.py:138` query).
    "q71_lsh_upsert" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val baseRows = emb.filter(col("vec_id") % 10 =!= 7)
        .select("vec_id", "embedding")
      val tailRows = emb.filter(col("vec_id") % 10 === 7)
        .select("vec_id", "embedding")
      val h = graft.sources.AnnIndex.ensureLshUpserted(s, dir + "!upsert",
        baseRows, tailRows, tables = 64, bits = 12)
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      graft.sources.AnnIndex.queryLsh(q, h, k = 4, probes = 48)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // S4 incremental upsert, IVF: centroids train on the 90% base only
    // (a serving index retrains at rebuild, not on ingest); the 10%
    // tail is assigned to the STORED centroids and appended into the
    // partitioned lists. Invariant: the stored lists equal a fresh
    // assignment of the FULL set against the same centroids — complete
    // (nothing missing: n_missed = 0) and sound (nothing extra or
    // misassigned: n_extra = 0). Assignment ties break deterministically
    // (max_by on (csim, -centroid_id)), so the comparison is exact.
    "q72_ivf_upsert" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val baseRows = emb.filter(col("vec_id") % 10 =!= 7)
        .select("vec_id", "embedding")
      val tailRows = emb.filter(col("vec_id") % 10 === 7)
        .select("vec_id", "embedding")
      val h = graft.sources.AnnIndex.ensureIvfUpserted(s, dir + "!upsert",
        baseRows, tailRows, lists = 64, iters = 5)
      val expected = SimilaritySearch
        .assignWithVecs(emb.select("vec_id", "embedding"), h.centroids)
        .select("centroid_id", "vec_id")
      val stored = h.lists.select("centroid_id", "vec_id")
      emb.agg(count(lit(1)).as("n_vecs"))
        .crossJoin(stored.agg(count(lit(1)).as("n_indexed")))
        .crossJoin(expected.join(stored, Seq("centroid_id", "vec_id"),
          "left_anti").agg(count(lit(1)).as("n_missed")))
        .crossJoin(stored.join(expected, Seq("centroid_id", "vec_id"),
          "left_anti").agg(count(lit(1)).as("n_extra")))
        .select(col("n_vecs"), col("n_indexed"),
          (col("n_missed") === 0).as("upsert_assign_complete"),
          (col("n_extra") === 0).as("upsert_assign_sound"))
    }),

    // A8 per-label centroid, element-wise (SQL oracle via list indexing)
    "q38_centroids" -> ((s, dir) => {
      SimilaritySearch.labelCentroids(t(s, dir, "embeddings"))
        .select(col("centroid_id"), posexplode(col("centroid_vec"))
          .as(Seq("dim", "mean_v")))
        .select(col("centroid_id"), col("dim"),
          round(col("mean_v"), 6).as("mean_v"))
    }),

    // text analysis: token counting per language group
    "q39_token_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("bigint"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("sum_tokens"),
          round(avg("n_chars"), 6).as("avg_chars"),
          sum(when(col("n_chars") =!= length(col("text")), 1).otherwise(0))
            .as("n_len_mismatch"))
    }),

    // text analysis: quality scoring per source
    "q40_quality" -> ((s, dir) => {
      TextAnalysis.qualityFeatures(t(s, dir, "documents"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("quality_score"), 6).as("avg_quality"),
          round(avg("stopword_ratio"), 6).as("avg_stopword_ratio"),
          round(avg("mean_tok_len"), 6).as("avg_tok_len"))
    }),

    // text analysis: language-ID by marker voting (SQL oracle via CASE)
    "q41_langid" -> ((s, dir) => {
      TextAnalysis.languageId(t(s, dir, "documents"))
        .groupBy(col("lang"), col("predicted_lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("marker_hits").cast("bigint")).as("sum_hits"))
    }),

    // text analysis: char-trigram language-ID (the n-gram heuristic;
    // rows-only — profile sets live in Scala)
    "q57_langid_ngram" -> ((s, dir) => {
      TextAnalysis.languageIdNgram(t(s, dir, "documents"))
        .groupBy(col("lang"), col("predicted_lang_ngram"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("trigram_hits").cast("bigint")).as("sum_hits"))
    }),

    // multimodal: byte-stride "resize" keeps payloads bounded (rows-only)
    "q58_multimodal_resize" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, t(s, dir, "documents"))
      Multimodal.resize(media, targetBytes = 64).toDF()
        .select(col("media_id"), col("kind"),
          length(col("payload")).as("resized_len"))
    }),

    // text analysis: rolling-hash fingerprint (rows-only: xxhash64)
    "q42_fingerprint" -> ((s, dir) => {
      TextAnalysis.fingerprint(t(s, dir, "documents"))
        .select("doc_id", "fingerprint_min", "fingerprint_full", "n_windows")
    }),

    // text analysis: BPE-ish token estimate (word-based SQL oracle)
    "q43_bpe_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("bpe_tokens", TextAnalysis.bpeTokenEstimate(col("text")))
        .groupBy("lang")
        .agg(sum("bpe_tokens").as("sum_bpe_tokens"),
          round(avg("bpe_tokens"), 6).as("avg_bpe_tokens"))
    }),

    // multimodal: binary metadata slice (SQL oracle)
    "q44_multimodal_meta" -> ((s, dir) => {
      Multimodal.metadata(t(s, dir, "documents"))
    }),

    // multimodal: stubbed decode over binary payloads — deterministic fake
    // features; byte_len/width/height/n_frames ARE oracle-checkable
    "q45_multimodal_decode" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, t(s, dir, "documents"))
      Multimodal.decodeFeatures(media).toDF()
        .select(col("media_id"), col("kind"), col("byte_len"),
          col("width"), col("height"), col("n_frames"))
    }),

    // REAL 24bpp BMP decode (round-4 verdict item 7: one genuinely
    // decodable offline format). Payloads are spec-compliant BMPs
    // generated per document (dims from the char length, a gray ramp
    // offset by media_id); decodeBmp then parses the header and padded
    // pixel rows for real. The oracle recomputes width/height and the
    // ramp checksum in closed form (the ramp never wraps 256 at fixture
    // dims), so a decoder that misread row padding, row order, or
    // channel layout would hash-mismatch.
    "q76_bmp_decode" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).cast("int").as("len"))
        .as[(Long, Int)]
        .map { case (id, len) =>
          val w = 4 + len % 13
          val h = 3 + len % 7
          val start = (id % 200).toInt
          Multimodal.MediaRow(id, "image", Multimodal.encodeBmp(w, h,
            (x, y) => { val v = (start + x + y) % 256; (v, v, v) }))
        }
      Multimodal.decodeBmpImages(media).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("pixel_sum"), round(col("px_mean"), 6).as("px_mean"))
    }),

    // REAL PNG decode (verdict r5 #3: the formats a real multimodal
    // corpus actually contains, via the JRE's bundled ImageIO — no new
    // dependency, offline). Same generated-ramp scheme as q76: encodePng
    // writes the ramp losslessly, decodePng reads it back, and the
    // oracle recomputes width/height and the closed-form checksum — a
    // decoder that misread channels, row order, or color space would
    // hash-mismatch.
    "q88_png_decode" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).cast("int").as("len"))
        .as[(Long, Int)]
        .map { case (id, len) =>
          val w = 4 + len % 13
          val h = 3 + len % 7
          val start = (id % 200).toInt
          Multimodal.MediaRow(id, "image", Multimodal.encodePng(w, h,
            (x, y) => { val v = (start + x + y) % 256; (v, v, v) }))
        }
      Multimodal.decodePngImages(media).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("pixel_sum"), round(col("px_mean"), 6).as("px_mean"))
    }),

    // REAL WAV/PCM audio decode — the audio twin of q76/q88: encodeWav
    // writes a mono/stereo 16-bit ramp waveform per document, the
    // from-scratch RIFF parser (decodeWav) walks the chunk list and
    // folds the PCM samples, and the oracle recomputes sample count,
    // sum, peak, and duration in closed form (the ramp start+f+c never
    // clips at fixture dims: start ≤ 49, frames ≤ 69, channels ≤ 2).
    "q90_wav_decode" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).cast("int").as("len"))
        .as[(Long, Int)]
        .map { case (id, len) =>
          val ch = 1 + (id % 2).toInt
          val n = 20 + len % 50
          val start = (id % 50).toInt
          Multimodal.MediaRow(id, "audio", Multimodal.encodeWav(ch, 8000, n,
            (f, c) => start + f + c))
        }
      Multimodal.decodeWavAudio(media).toDF()
        .select(col("media_id"), col("channels"), col("sample_rate"),
          col("n_samples"), col("sample_sum"), col("peak"),
          round(col("duration_sec"), 6).as("duration_sec"))
    }),

    // REAL MP4/ISO-BMFF container parse — the video twin of q90:
    // encodeMp4 writes a minimal ftyp+moov container per document (video
    // track unless doc_id%3==0, audio track when odd), the from-scratch
    // box walker recovers brand/timescale/tracks/dims, and the oracle
    // recomputes every field in closed form from (doc_id, len).
    "q98_mp4_decode" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).cast("int").as("len"))
        .as[(Long, Int)]
        .map { case (id, len) =>
          val units = (20L + len % 50) * 60
          val tracks =
            (if (id % 3 != 0)
              Seq(("vide", 160 + (id % 8).toInt * 16,
                120 + (id % 6).toInt * 16))
            else Seq.empty) ++
            (if (id % 2 == 1) Seq(("soun", 0, 0)) else Seq.empty)
          Multimodal.MediaRow(id, "video",
            Multimodal.encodeMp4("isom", 600, units, tracks))
        }
      Multimodal.decodeMp4Meta(media).toDF()
    }),

    // Gopher-style repetition quality signals, computed per row with a
    // sorted-array fold (no shuffle — contrast the oracle, which has to
    // explode+aggregate): top-word fraction + duplicate-bigram fraction.
    "q91_repetition_signals" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(t(s, dir, "documents"))
        .select("doc_id", "n_tok", "top_word_frac", "dup_bigram_frac")),

    // Benchmark decontamination: corpus docs sharing any 8-token shingle
    // with the benchmark suite. The "benchmark" is derived the way real
    // ones are (web text that also circulates in training corpora): the
    // first 12 tokens of every doc_id % 97 == 0 document — so the source
    // docs (and any shingle-sharing others) MUST be flagged at every
    // scale. Benchmark shingles broadcast; the corpus side streams.
    "q92_decontamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 97 === 0)
        .select(concat_ws(" ", slice(split(col("text"), " "), 1, 12))
          .as("text"))
      CorpusOps.contamination(docs, bench, n = 8)
    }),

    // PII redaction over synthesized PII (the fixture corpus carries
    // none, so both sides append a deterministic email+phone per doc
    // first): placeholder substitution + removal counts, with the exact
    // redacted string pinned by md5.
    "q93_pii_redaction" -> ((s, dir) => {
      val withPii = t(s, dir, "documents").withColumn("raw",
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" now")))
      CorpusOps.redactPii(withPii, "raw")
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          length(col("redacted")).as("red_len"),
          md5(col("redacted")).as("red_md5"))
    }),

    // Deterministic stratified sampling: per-language fractions via the
    // md5-prefix threshold (reproducible, shuffle-free, auditable in any
    // SQL engine — the oracle replays the identical decision function).
    "q94_stratified_sample" -> ((s, dir) =>
      CorpusOps.sampleStratified(t(s, dir, "documents"), "lang",
          concat(col("doc_id").cast("string"), lit(":"), col("text")),
          Map("en" -> 0.125, "es" -> 0.25, "de" -> 0.5, "fr" -> 0.75,
            "zh" -> 1.0))
        .select("doc_id", "lang")),

    // GPT-style sequence packing: per-source token streams split every
    // 512 tokens, documents may straddle boundaries; the window cumsum
    // is per-shard so shards pack in parallel.
    "q95_sequence_packing" -> ((s, dir) =>
      CorpusOps.packSequences(t(s, dir, "documents"), "source", "doc_id",
          budget = 512)
        .select("doc_id", "source", "n_tok", "start_off", "first_seq",
          "last_seq")),

    // Exact-substring duplication signal: per doc, the fraction of its
    // distinct 8-token shingles appearing in other documents too — the
    // cross-doc boilerplate measure behind substring-level dedup. All
    // corpus exchanges carry (doc_id, 8-byte hash) only.
    "q99_dup_shingles" -> ((s, dir) =>
      CorpusOps.dupShingleStats(t(s, dir, "documents"), n = 8)),

    // Exact-substring duplicate-span REMOVAL: cut every token span
    // covered by a >=16-token run of cross-doc-duplicated 8-shingles
    // (q99 measures the duplication; this operator removes it). Corpus
    // exchanges carry (doc_id, pos, 8-byte hash) only; the one window
    // runs per doc over the duplicated starts.
    "q100_dup_span_removal" -> ((s, dir) =>
      CorpusOps.removeDuplicateSpans(t(s, dir, "documents"), n = 8,
        minSpanTokens = 16)),

    // Pixel-space preprocessing: decode → bilinear resize (half-pixel
    // centers, edge clamp) → center-crop, the standard image-training
    // input stage. The 16x12 ramp stays linear per channel (no byte
    // wrap), so bilinear at dyadic half-scale is EXACT and the oracle
    // states the resized-then-cropped pixel values in closed form —
    // a resampler with wrong source mapping, row order, or rounding
    // hash-mismatches.
    "q102_image_preprocess" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .map { id =>
          val off = (id % 100).toInt
          Multimodal.MediaRow(id, "image", Multimodal.encodeBmp(16, 12,
            (x, y) => (x + off, y + off, x + y + off)))
        }
      Multimodal.preprocessImages(media, dstW = 8, dstH = 6,
          cropW = 4, cropH = 4).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("pixel_sum"), round(col("px_mean"), 6).as("px_mean"))
    }),

    // BPE merge induction: 12 pair-merge training rounds over the
    // corpus vocabulary (corpus touched once; one aggregate + 1-row
    // argmax per round, deterministic tie-break). The oracle replays
    // the identical 12-round run as unrolled chained CTEs.
    "q101_bpe_merges" -> ((s, dir) =>
      CorpusOps.bpeMerges(t(s, dir, "documents"), numMerges = 12)),

    // SQ8 quantized-scan ANN: int8 codes (4× smaller, integer scan
    // kernel) pick 32 candidates per query, exact float re-rank returns
    // top-4. Hash-matching the EXACT kNN oracle proves the quantization
    // layer is output-lossless at this operating point — the candidate
    // margin (m = 8k) absorbs the ≤1/254-per-component quantization
    // error at every fixture scale.
    "q103_sq8_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      SimilaritySearch.quantizedTopK(q, emb, k = 4, m = 32)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // Product-quantized ANN: per-subspace codebooks (16 subspaces × 64
    // centroids over the 64-dim fixture → 16 bytes/vector, 16× under
    // float32), ADC table-lookup scan picks 64 candidates per query,
    // exact float re-rank returns top-4. Hash-matching the EXACT kNN
    // oracle proves the PQ layer output-lossless at this operating
    // point (certified by `AnnTune pq` at every fixture scale: identical
    // from m=32 at sf0.001/sf0.01/sf0.1 — m=64 is the 2× margin; and by
    // `AnnTune pqiters`: at m=64 identity holds from iters=1, so the
    // shipped iters=2 carries its own margin) — the compression tier
    // past q103's SQ8 (byte per subspace vs byte per component).
    "q115_pq_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      SimilaritySearch.pqTopK(q, emb, k = 4, m = 64, numSub = 16,
          ksub = 64, iters = 2)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // Compression-ratio quality signal (the zlib-ratio corpus filter) —
    // invariant closure, since DuckDB cannot replay deflate byte
    // counts: every ratio in (0, 1.5] (deflate never inflates text
    // beyond framing at these lengths), and doubling a document is
    // SUBADDITIVE (deflate(t·t) < 2·deflate(t) for docs ≥ 40 bytes —
    // the second copy is back-references) — the property that makes the
    // ratio a repetition detector at all. Exact per-string behavior is
    // pinned in ScalaTest.
    "q122_compression_ratio" -> ((s, dir) => {
      import graft.functions.expressions.TextExpressions.deflate_stats
      val sig = TextAnalysis.compressionSignals(t(s, dir, "documents"))
      val withDoubled = sig.withColumn("d2",
        deflate_stats(concat(col("text"), col("text"))))
      withDoubled.agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("compress_ratio") <= 0.0 ||
          col("compress_ratio") > 1.5, 1L).otherwise(0L))
          .as("n_ratio_out_of_bounds"),
        sum(when(col("raw_len") >= 40 &&
          col("d2.deflate_len") >= col("deflate_len") * 2, 1L)
          .otherwise(0L)).as("n_superadditive"))
    }),

    // The Gopher repetitious-text rule set (top-{2,3,4}-gram char
    // coverage, duplicated-{5..10}-gram token coverage) over a corpus
    // deterministically degraded with repeated spans (every third doc
    // gets its first 8 tokens appended twice — the q93 synthetic-input
    // discipline; the raw fixture has no within-doc repeated 5-grams,
    // which would leave the dup columns verifying nothing). Full
    // DuckDB oracle: the relational 9-way n-gram explode recomputes
    // what the engine's single native per-row pass emits.
    "q124_gopher_signals" -> ((s, dir) => {
      val toks0 = split(col("text"), " ")
      val s8 = concat_ws(" ", slice(toks0, 1, 8))
      val aug = t(s, dir, "documents")
        .withColumn("text",
          when(col("doc_id") % 3 === 0,
            concat_ws(" ", col("text"), s8, s8))
          .otherwise(col("text")))
      TextAnalysis.gopherSignals(aug)
        .select(Seq(col("doc_id"), col("n_tok")) ++
          (2 to 4).map(n => col(s"top${n}_frac")) ++
          (5 to 10).map(n => col(s"dup${n}_frac")): _*)
    }),

    // Exact top-20 bigram heavy hitters via the sketch-prune-verify
    // plan: Misra-Gries bounded sketch pass (<= 2*capacity rows per
    // map task) -> broadcast-pruned exact count pass -> in-query
    // certification (k-th count > sketch delta, else the operator
    // throws). The DuckDB oracle is the PLAIN exact top-k — whenever
    // the operator returns, its answer is exact by construction.
    // Fixture honesty: the synthetic corpus is near-UNIFORM (its
    // ~930 distinct bigrams all fit the sketch, so delta = 0 and
    // certification is trivially true here — MG certification has
    // real teeth only on Zipfian data, which real corpora are); the
    // purge pressure and the uncertifiable-refusal paths are pinned
    // adversarially in OperatorsSpec instead.
    "q125_heavy_hitters" -> ((s, dir) =>
      Frequency.topNgramsExact(t(s, dir, "documents"), n = 2, k = 20,
        capacity = 4096)),

    // Curation funnel v2 — the round-8 operators composed the way a
    // production pipeline chains them: normalize (NFC + whitespace +
    // control) -> Gopher repetition gate (top2_frac <= 0.12 on the
    // normalized text) -> percentile length trim ([p5, p95] of the
    // SURVIVING population) -> exact dedup (min id per text). One row
    // of per-stage counts + the kept token mass; every stage is
    // SQL-expressible, so the whole funnel replays relationally.
    "q140_curation_funnel" -> ((s, dir) => {
      val d0 = TextAnalysis.normalizeText(t(s, dir, "documents"))
        .withColumn("text", col("norm_text")).drop("norm_text")
      val g = TextAnalysis.gopherSignals(d0)
      // each stage is consumed by its own count AND the next stage
      // (and the trim by its percentile agg + filter): pin the staged
      // frames once — exactly the staged materialization a production
      // funnel writes between passes — instead of re-running the
      // normalize+gopher chain per downstream branch (measured 7.9 s
      // -> ~2 s at sf0.1)
      val s1 = g.filter(col("top2_frac") <= 0.12)
        .withColumn("n_tok_d", col("n_tok").cast("double"))
        .localCheckpoint(false)
      val s2 = CorpusOps.trimOutliers(s1, "n_tok_d", 0.05, 0.95)
        .localCheckpoint(false)
      val s3 = s2.join(
        Dedup.exact(s2).select(col("keep_doc_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      t(s, dir, "documents").agg(count(lit(1)).as("n_in"))
        .crossJoin(s1.agg(count(lit(1)).as("n_after_gopher")))
        .crossJoin(s2.agg(count(lit(1)).as("n_after_trim")))
        .crossJoin(s3.agg(count(lit(1)).as("n_after_dedup"),
          sum("n_tok").as("kept_tokens")))
    }),

    // Distribution-drift gate (PSI over doc-length buckets): reference
    // = even-id docs, current = odd-id docs with a deterministic +20%
    // length shift (the q93 synthetic-input discipline — unshifted
    // halves of one corpus would verify only the ~0 case). Fully
    // SQL-expressible: bucket counts, Laplace smoothing, the PSI sum.
    "q138_psi_drift" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val ref = d.filter(col("doc_id") % 2 === 0)
      val cur = d.filter(col("doc_id") % 2 =!= 0)
        .withColumn("n_chars", floor(col("n_chars") * 1.2).cast("long"))
      graft.operators.Drift.psi(ref, cur, col("n_chars"),
        buckets = 16, lo = 0.0, hi = 640.0)
    }),

    // Per-group certified-exact heavy hitters: top-5 bigrams PER
    // LANGUAGE via one grouped Misra-Gries sketch + a candidate-pruned
    // exact pass + per-group certification. Oracle = plain per-group
    // exact top-k.
    "q139_group_heavy_hitters" -> ((s, dir) =>
      Frequency.topNgramsExactByGroup(t(s, dir, "documents"), "lang",
        n = 2, k = 5, capacity = 2048)),

    // Percentile length trimming (winsorize-drop): keep documents
    // inside the corpus's [p5, p95] token-count percentiles — exact
    // interpolated percentiles, fully SQL-replayable (the
    // q107-certified percentile_approx is the documented 100 TB
    // drop-in).
    "q136_length_trim" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("n_tok",
          size(split(col("text"), " ")).cast("double"))
      CorpusOps.trimOutliers(d, "n_tok", 0.05, 0.95)
        .select(col("doc_id"), col("n_tok").cast("long").as("n_tok"),
          round(col("p_lo"), 6).as("p_lo"),
          round(col("p_hi"), 6).as("p_hi"))
    }),

    // Text normalization (NFC + whitespace collapse + control strip)
    // over a corpus deterministically degraded with decomposed
    // accents, a BEL control char, and double spaces (the q93
    // synthetic-input discipline — the raw fixture is pure ASCII and
    // would verify nothing). The oracle replays NFC via DuckDB's
    // nfc_normalize (Unicode normalization is fully specified) and
    // the regex steps verbatim; md5 pins the exact bytes.
    "q137_normalize_text" -> ((s, dir) => {
      val aug = t(s, dir, "documents")
        .withColumn("text", concat(col("text"),
          lit("  cafe\u0301  \u212B\u0007 end")))
      TextAnalysis.normalizeText(aug)
        .select(col("doc_id"),
          length(col("text")).as("n_raw"),
          length(col("norm_text")).as("n_norm"),
          md5(col("norm_text")).as("norm_md5"))
    }),

    // Benchmark decontamination by span REMOVAL (the step after q92's
    // flagging): spans of benchmark-matching 8-shingles are cut from
    // every corpus document, the documents survive. Same benchmark
    // construction as q92 (every 97th doc's first 12 tokens); full
    // DuckDB oracle replays the span cut on raw shingle strings.
    "q135_decontaminate_spans" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 97 === 0)
        .select(concat_ws(" ", slice(split(col("text"), " "), 1, 12))
          .as("text"))
      CorpusOps.removeContaminatedSpans(docs, bench, n = 8,
        minSpanTokens = 8)
    }),

    // Incremental NEAR-dup dedup against the persisted MinHash store
    // (the fuzzy twin of q132): two-batch ingest; invariant closure
    // since minhash is not SQL-expressible — (a) the kept sets of the
    // two batches are cross-batch CLEAN under an independent in-query
    // recomputation (no banded signature collision at est-jaccard >=
    // 0.5 between kept b2 and kept b1 docs: zero violations BY the
    // drop rule's construction, re-derived here from scratch), and
    // (b) a replayed batch reconstructs its kept set exactly. Exact
    // per-doc behavior pinned in OperatorsSpec.
    "q134_incremental_neardup" -> ((s, dir) => {
      import graft.operators.Dedup
      val docs = t(s, dir, "documents")
      val key = dir + "#near_v1"
      val k1 = graft.sources.DedupStore.nearDedupBatch(s, key,
        docs.filter(col("doc_id") % 2 === 0), batchId = 1L)
      val k2 = graft.sources.DedupStore.nearDedupBatch(s, key,
        docs.filter(col("doc_id") % 2 =!= 0), batchId = 2L)
      val k2r = graft.sources.DedupStore.nearDedupBatch(s, key,
        docs.filter(col("doc_id") % 2 =!= 0), batchId = 2L)
      def bandRows(d: org.apache.spark.sql.DataFrame) =
        Dedup.minHashBandRows(
          Dedup.minHashSigned(d.select("doc_id", "text"), 3, 32), 32, 8)
      val cand = bandRows(k1)
        .select(col("band"), col("bucket"), col("doc_id").as("id1"))
        .join(bandRows(k2)
          .select(col("band"), col("bucket"), col("doc_id").as("id2")),
          Seq("band", "bucket"))
        .select("id1", "id2").distinct()
      def sigs(d: org.apache.spark.sql.DataFrame, idOut: String,
          sigOut: String) =
        Dedup.minHashSigned(d.select("doc_id", "text"), 3, 32)
          .select(col("doc_id").as(idOut), col("sig").as(sigOut))
      val violations = cand
        .join(sigs(k1, "id1", "sig_a"), Seq("id1"))
        .join(sigs(k2, "id2", "sig_b"), Seq("id2"))
        .withColumn("n_eq", aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v))
        .filter(col("n_eq").cast("double") / 32 >= 0.5)
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(k1.agg(count(lit(1)).as("nk1"))
          .crossJoin(k2.agg(count(lit(1)).as("nk2")))
          .crossJoin(docs.agg(count(lit(1)).as("nd")))
          .select((col("nk1") + col("nk2") <= col("nd")).as("kept_le_in")))
        .crossJoin(violations.agg((count(lit(1)) === 0)
          .as("cross_clean")))
        .crossJoin(k2.select("doc_id").exceptAll(k2r.select("doc_id"))
          .unionByName(k2r.select("doc_id").exceptAll(k2.select("doc_id")))
          .agg((count(lit(1)) === 0).as("replay_ok")))
    }),

    // Deterministic weighted sampling without replacement (A-Res):
    // top-50 documents by md5-derived priority ln(u)/n_chars — a
    // size-proportional corpus draw that is a pure function of
    // (doc_id, seed). The oracle replays the hex-digit parse, the
    // log-priority, and the ranking verbatim.
    "q133_weighted_sample" -> ((s, dir) =>
      CorpusOps.sampleWeighted(t(s, dir, "documents"), k = 50,
        col("n_chars").cast("double"), col("doc_id"), seed = 42L)
        .select(col("rank"), col("doc_id"),
          round(col("logpri"), 6).as("logpri"))),

    // Incremental dedup against the persisted fingerprint store: the
    // corpus arrives as two batches (evens then odds); each is deduped
    // against everything already ingested WITHOUT re-reading it
    // (hash-bucket-pruned store probe). First-arrival-wins semantics:
    // the oracle keeps, per text, the min id of the EARLIEST batch
    // containing it. Idempotent across reruns by the replay contract
    // (the bench's min-of-3 exercises the replay path by design).
    "q132_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val key = dir + "#docs_v1"
      val k1 = graft.sources.DedupStore.dedupBatch(s, key,
        docs.filter(col("doc_id") % 2 === 0), batchId = 1L)
      val k2 = graft.sources.DedupStore.dedupBatch(s, key,
        docs.filter(col("doc_id") % 2 =!= 0), batchId = 2L)
      k1.select(col("doc_id"), lit(1).as("batch"))
        .unionByName(k2.select(col("doc_id"), lit(2).as("batch")))
    }),

    // Source-level PageRank over the cross-source boilerplate graph
    // (edge weight = distinct 8-shingles two sources share — the
    // domain-centrality curation signal; Common Crawl publishes the
    // domain-level analogue). 10 damped iterations with dangling
    // redistribution; the oracle replays graph construction AND every
    // iteration relationally (materialized CTE chain).
    "q131_source_pagerank" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val shDf = docs.select(col("source"),
        explode(graft.functions.expressions.HashExpressions
          .shingles_k_strict(split(col("text"), " "), 8)).as("g"))
        .distinct()
      val e = shDf.as("a")
        .join(shDf.as("b"), Seq("g"))
        .filter(col("a.source") =!= col("b.source"))
        .groupBy(col("a.source").as("src"), col("b.source").as("dst"))
        .agg(count(lit(1)).cast("double").as("w"))
      val nodes = docs.select(col("source").as("node")).distinct()
      graft.operators.GraphRank.pageRank(e, nodes, iters = 10)
        .select(col("node").as("source"), round(col("r"), 6).as("rank"))
    }),

    // IR evaluation harness over a real run: BM25 top-5 scored against
    // graded token-overlap qrels (rel = distinct query terms matched,
    // >= 2 to be relevant) — recall@5, MRR, nDCG@5 per query, every
    // number replayed relationally by the DuckDB oracle (the run is
    // q78's SQL-expressible BM25, so run AND metrics are both oracled).
    "q128_ranking_metrics" -> ((s, dir) => {
      val q = retrievalQueryDf(s)
      val docs = t(s, dir, "documents")
      val run = KeywordSearch.bm25TopK(q, docs, k = 5)
        .select("query_id", "rank", "doc_id")
      val qt = q.select(col("query_id"),
        explode(array_distinct(KeywordSearch.tokens(col("query_text"))))
          .as("tok"))
      val dt = docs.select(col("doc_id"),
        explode(array_distinct(KeywordSearch.tokens(col("text"))))
          .as("tok"))
      val qrels = qt.join(dt, Seq("tok"))
        .groupBy("query_id", "doc_id").agg(count(lit(1)).as("rel"))
        .filter(col("rel") >= 2)
      Evaluation.rankingMetrics(run, qrels, k = 5)
    }),

    // Trained quality classifier (the fastText/CCNet linear-filter
    // pattern): distributed full-batch GD logistic regression over
    // hashed BOW presence features, labels from a PLANTED text rule
    // (doc contains the token "table") so learnability is a known
    // quantity. Invariant closure (float-sum order makes exact
    // weights run-varying at the ulp level): replayable n_docs/n_pos
    // + accuracy >= 0.9 + final loss < 0.5 * initial, with the exact
    // per-step trajectory pinned on a hand corpus in ScalaTest.
    "q127_quality_classifier" -> ((s, dir) => {
      val lab = t(s, dir, "documents").withColumn("y",
        array_contains(split(col("text"), " "), "table").cast("double"))
      val model = QualityClassifier.train(lab, "y", iters = 20, lr = 20.0)
      val scored = QualityClassifier.score(lab, model)
      scored.agg(
        count(lit(1)).as("n_docs"),
        sum(col("y")).cast("long").as("n_pos"),
        (avg(when(col("quality_pred") === col("y").cast("int"), 1.0)
          .otherwise(0.0)) >= 0.9).as("acc_ok"),
        lit(model.finalLoss < 0.5 * model.initLoss).as("loss_ok"))
    }),

    // Z-order (Morton) layout key — the multi-column data-skipping
    // clustering lakehouses run at OPTIMIZE time. The key itself is
    // fully deterministic (min/max quantization in IEEE double + a
    // static bit-interleave), so the oracle replays it bit-exactly;
    // the LAYOUT benefit (per-file min/max envelopes tight in both
    // columns -> pruning on either) is measured in OperatorsSpec.
    "q126_zorder_key" -> ((s, dir) =>
      Layout.withZValue(
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        Seq("l_partkey", "l_suppkey"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "zval")),

    // IVF-PQ composition (faiss `IVFx,PQy`): PQ codes inside the probed
    // inverted lists — probed-row pruning × 16-bytes-per-scanned-row
    // multiplied. Invariant closure (the q109 discipline): the composed
    // path is IDENTICAL to the float IVF at the same (centroids,
    // nProbe) — zero symmetric difference, so the PQ layer adds NOTHING
    // to IVF's probe recall loss — plus the q68-style 0.84 exact-recall
    // floor. Measured at every fixture scale (`AnnTune ivfpq`).
    "q121_ivfpq_invariants" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      // the q37-operating-point centroid set, from the PERSISTED layout
      // (built once per fixture — the identity claim is per centroid
      // set, so sharing q68/q109's stored one both strengthens the
      // cross-check and keeps this verification query from re-running
      // five Lloyd rounds per call)
      val cents = graft.sources.AnnIndex.ensureIvf(s, dir,
        emb.select("vec_id", "embedding"), lists = 64, iters = 5).centroids
      val ivf = SimilaritySearch.ivfTopK(q, emb, cents, k = 4, nProbe = 24)
        .select("query_id", "rank", "vec_id")
      val composed = SimilaritySearch.ivfPqTopK(q, emb, cents, k = 4,
          nProbe = 24, m = 64, numSub = 32, ksub = 64, iters = 2)
        .select("query_id", "rank", "vec_id")
      val exact = SimilaritySearch.bruteForceTopK(q, emb, k = 4)
        .select("query_id", "vec_id")
      composed.agg(count(lit(1)).as("n_composed"))
        .crossJoin(composed.exceptAll(ivf)
          .unionByName(ivf.exceptAll(composed))
          .agg(count(lit(1)).as("n_diff_ivf")))
        .crossJoin(exact.agg(count(lit(1)).as("ne"))
          .crossJoin(exact
            .join(composed.select("query_id", "vec_id"),
              Seq("query_id", "vec_id"), "left_semi")
            .agg(count(lit(1)).as("hits")))
          .select((col("hits") >= col("ne") * 0.84).as("recall_floor_ok")))
    }),

    // PERSISTED IVF-PQ serving (q121's serving shape; the faiss
    // `IVFx,PQy` stored layout): PQ codes inside the centroid-
    // partitioned stored lists + stored codebook + co-bucketed float
    // vecs. Same invariant closure as q109/q121: persisted composed ≡
    // persisted float IVF at the same (lists, nProbe), zero symmetric
    // difference, + the 0.84 exact-recall floor.
    "q123_ivfpq_persisted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val ivfH = graft.sources.AnnIndex.ensureIvf(s, dir,
        emb.select("vec_id", "embedding"), lists = 64, iters = 5)
      val ivf = graft.sources.AnnIndex.queryIvf(q, ivfH, k = 4, nProbe = 24)
        .select("query_id", "rank", "vec_id")
      val h = graft.sources.AnnIndex.ensureIvfPq(s, dir,
        emb.select("vec_id", "embedding"), lists = 64, iters = 5)
      val composed = graft.sources.AnnIndex
        .queryIvfPq(q, h, k = 4, nProbe = 24, m = 64)
        .select("query_id", "rank", "vec_id")
      val exact = SimilaritySearch.bruteForceTopK(q, emb, k = 4)
        .select("query_id", "vec_id")
      composed.agg(count(lit(1)).as("n_composed"))
        .crossJoin(composed.exceptAll(ivf)
          .unionByName(ivf.exceptAll(composed))
          .agg(count(lit(1)).as("n_diff_ivf")))
        .crossJoin(exact.agg(count(lit(1)).as("ne"))
          .crossJoin(exact
            .join(composed.select("query_id", "vec_id"),
              Seq("query_id", "vec_id"), "left_semi")
            .agg(count(lit(1)).as("hits")))
          .select((col("hits") >= col("ne") * 0.84).as("recall_floor_ok")))
    }),

    // PERSISTED PQ serving — the train-once/query-many shape q115's
    // in-memory path demonstrates: codebook + 16-byte codes + float
    // vecs live on disk (built once per fixture, attach-by-DDL after),
    // the query is ADC lookup-sums over the stored codes + exact
    // re-rank. Same exact-kNN oracle as q115/q105.
    "q120_pq_persisted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val h = graft.sources.AnnIndex.ensurePq(s, dir,
        emb.select("vec_id", "embedding"))
      graft.sources.AnnIndex.queryPq(q, h, k = 4, m = 64)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // PERSISTED PQ at the reference's 1536-dim operating point — the
    // dim-hardcoding canary for the PQ family (what DIM1536 pins for
    // SQ8). Fixture: GROUP-structured tiled vectors — every vec_id
    // shares the base embedding of its representative (vec_id % G,
    // G = n/8 so ~8 members per group at every scale), tiled 24× with
    // per-tile decay 0.9^j, plus a per-member perturbation
    // (p·0.03, p = vec_id / G) on dim 0 that makes within-group scores
    // distinct. Within-group cosines ≈ 1 vs cross-group ≈ 0.4, so the
    // true top-4 is always inside the ADC candidate set at m = 64 and
    // the exact float re-rank makes queryPq ≡ exact kNN ROBUSTLY —
    // unlike a random-direction fixture, where numSub=96/ksub=256
    // reconstruction noise on 2 000 unclustered points reorders ranks
    // at any margin (measured: a true rank-2 neighbor at ADC rank 815).
    // The construction is float-rounded and replayed verbatim by the
    // DuckDB oracle.
    "q146_pq1536_persisted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val g = emb.count() / 8
      val based = emb.select(col("vec_id"),
          (col("vec_id") % g).as("rid"),
          floor(col("vec_id") / lit(g)).cast("long").as("p"))
        .join(broadcast(emb.select(col("vec_id").as("rid"),
          col("embedding").as("bemb"))), Seq("rid"))
      val tiled = based.select(col("vec_id"),
        concat(
          array((element_at(col("bemb"), 1) + col("p") * 0.03)
            .cast("float")),
          transform(slice(col("bemb"), 2, 63), x => x.cast("float")),
          flatten(transform(sequence(lit(1), lit(23)),
            j => transform(col("bemb"),
              x => (x * pow(lit(0.9), j)).cast("float"))))).as("embedding"))
      val q = tiled.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val h = graft.sources.AnnIndex.ensurePq(s, s"$dir#pq1536", tiled,
        numSub = 96, ksub = 256, iters = 2)
      graft.sources.AnnIndex.queryPq(q, h, k = 4, m = 64)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // Certified heavy hitters WITH TEETH: q125's near-uniform corpus
    // fits every bigram in the sketch (delta = 0 — certification is
    // trivially true and proves nothing about the refusal rule). Here
    // the corpus is a deterministic ZIPF stream — 16 tokens per doc,
    // token = z⌊M/(t+1)⌋ for t = (doc_id·16 + i) mod M (harmonic
    // bucketing: rank-r count ∝ 1/(r(r+1)), ~2√M ≈ 141 distinct) — so
    // capacity 64 < distinct forces MG purges in every map task,
    // delta > 0, and the k-th-count > delta certification is earned,
    // not vacuous. delta itself is a merge-order artifact (never in
    // deterministic output); the hash-compared `delta_has_teeth`
    // column records that it was NONZERO at every scale.
    "q147_heavy_hitters_zipf" -> ((s, dir) => {
      val ztext = t(s, dir, "documents").select(
        concat_ws(" ", transform(sequence(lit(0), lit(15)),
          i => concat(lit("z"),
            floor(lit(4999) / ((col("doc_id") * 16 + i) % 4999 + 1))
              .cast("long").cast("string")))).as("text"))
      val (top, delta) = Frequency.topNgramsExactWithDelta(
        ztext, n = 1, k = 10, capacity = 64)
      top.withColumn("delta_has_teeth", lit(delta > 0L))
    }),

    // LEAKAGE-SAFE SPLIT: the unit of assignment is the exact-dup
    // cluster (min doc_id per identical text), so a train document's
    // duplicate can never land in test — the contamination a row-level
    // split commits silently. Assignment is the engine-portable
    // md5-prefix ladder (pure projection, zero extra shuffle beyond
    // the cluster join). Output: per-split group/row counts + the
    // hash-compared n_straddle = 0 leakage invariant.
    "q148_group_split" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val withGrp = d.withColumn("text_hash", xxhash64(col("text")))
        .join(Dedup.exact(d).select(col("text_hash"),
          col("keep_doc_id").as("grp")), Seq("text_hash"))
      val split = CorpusOps.groupSplit(withGrp, "grp",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), seed = 7L)
        .localCheckpoint(false)
      split.groupBy("split")
        .agg(countDistinct("grp").as("n_groups"),
          count(lit(1)).as("n_rows"))
        .crossJoin(split.groupBy("grp")
          .agg(countDistinct("split").as("ns"))
          .filter(col("ns") > 1)
          .agg(count(lit(1)).as("n_straddle")))
    }),

    // DSIR importance resampling (Xie et al. 2023): weight every doc
    // by the per-token log-likelihood ratio of the TARGET-domain
    // (lang = 'en') unigram LM over the raw-corpus LM, then draw the
    // A-Res weighted sample over exp(log_w) — the document-level
    // importance-resampled subcorpus. Fully replayed by the oracle
    // (both LMs, the ratio, the md5 priority, the top-k).
    "q149_dsir_sample" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val w = TextAnalysis.importanceWeights(d, col("lang") === "en")
      CorpusOps.sampleWeighted(
        w.withColumn("w", exp(col("log_w"))), k = 25,
        weight = col("w"), key = col("doc_id"), seed = 11L)
        .select(col("rank"), col("doc_id"), col("log_w"))
    }),

    // CCNet perplexity buckets (Wenzek et al. 2020): head/middle/tail
    // by per-LANGUAGE ppl terciles of the corpus-trained bigram LM —
    // the quality stratification curation mixes on. Boundaries are
    // exact interpolated percentiles broadcast per language (the
    // trimOutliers discipline; percentile_approx is the certified
    // 100 TB drop-in). Per-doc output so every document's bucket is
    // hash-verified.
    "q150_ppl_buckets" -> ((s, dir) =>
      TextAnalysis.perplexityBuckets(t(s, dir, "documents"))
        .orderBy("doc_id")),

    // Robust per-language outlier flags (median/MAD, k = 3.5 — the
    // robust z whose threshold outliers cannot poison, unlike
    // mean/stddev): per-lang counts + the boundaries themselves.
    "q159_robust_outliers" -> ((s, dir) =>
      CorpusOps.robustOutliers(
          t(s, dir, "documents")
            .withColumn("n_chars_d", col("n_chars").cast("double")),
          "n_chars_d", "lang")
        .groupBy("lang").agg(
          count(lit(1)).as("n"),
          sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
          round(first("med"), 6).as("med"),
          round(first("mad"), 6).as("mad"))),

    // Deterministic exact-k per-group sample: the 10 smallest
    // md5-uniform draws per language — reproducible on any engine or
    // cluster size, one bounded aggregate (never a per-group sort).
    "q160_sample_per_group" -> ((s, dir) =>
      CorpusOps.samplePerGroup(t(s, dir, "documents"), "lang", k = 10,
        key = col("doc_id"), seed = 5L)),

    // LINE-level dedup (Dolma dedupe-by-paragraph / CCNet paragraph
    // hash): the fixture text is single-line, so the corpus is given
    // line structure in-query (the q124 degradation discipline) — a
    // per-source banner line every doc of that source shares (the
    // boilerplate exact-doc dedup never sees) + the body split into
    // 8-token lines (which collide across docs by chance, exercising
    // the df threshold on real content too). Lines in more documents
    // than maxDf=4 are cut; full rewritten text replayed in DuckDB.
    "q161_line_dedup" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      val body = transform(
        sequence(lit(0), floor((size(toks) - 1) / 8.0).cast("int")),
        i => concat_ws(" ", slice(toks, i * 8 + 1, lit(8))))
      val aug = t(s, dir, "documents").withColumn("text",
        concat_ws("\n", concat(
          array(concat(lit("== site banner :: "), col("source"),
            lit(" =="))),
          body)))
      Dedup.dedupLines(aug, maxDf = 4)
        .select("doc_id", "text", "n_lines", "n_cut")
        .orderBy("doc_id")
    }),

    // Binary (1-bit) quantized ANN at the reference's 1536 ambient
    // dim: sign-packed codes (192 B vs 6 KB float32 — 32×), Hamming
    // shortlist m=256, exact re-rank to top-4, hash-matching the
    // EXACT kNN oracle over the same vectors. The fixture blends each
    // 64-dim base component (tiled 24×) with an md5-derived uniform
    // jitter at 2× the vector's rms — deterministic, replayed
    // digit-for-digit in DuckDB (the q133 uniform). The jitter scale
    // was MEASURED, not guessed (BqProbe-style worst-true-neighbor
    // Hamming ranks): at 0.25× rms the tiles' sign bits are copies of
    // the base signs (few informative bits — worst rank 500+/2000);
    // 2× rms flips ~40% of tile bits independently and the worst rank
    // drops to 139 across all scales — m=256 is the ≥1.8× margin. The
    // 64-dim NEGATIVE control is measured, not shipped: `AnnTune bq`
    // shows dim64 plateauing below identity at every m (64 bits can't
    // order 500 neighbors) — the public "BQ needs ≥~1k dims"
    // consensus, named as a precondition in the operator's contract.
    "q162_binary_ann_1536" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // the construction runs as ONE native per-row kernel (value-
      // identical to the composed transform/md5/conv formulation the
      // oracle replays — TileJitterF's contract; the HOF form cost
      // ~6× the search it feeds), pinned so each consumer (query
      // side, code scan, float re-rank join) reads it once
      import graft.functions.expressions.VectorExpressions.tile_jitter
      val tiled = emb.select(col("vec_id"),
        tile_jitter(col("vec_id"), col("embedding"), reps = 24,
          sigma = 2.0).as("embedding"))
        .localCheckpoint(false)
      val q = tiled.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      SimilaritySearch.binaryTopK(q, tiled, k = 4, m = 256)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // PCA / OPQ-style rotation (Ge et al., faiss OPQMatrix): fit the
    // uncentered-second-moment eigenbasis (one map-side-partial d²
    // aggregate + driver Jacobi — a bounded model artifact), rotate
    // corpus AND queries with the native mat-vec kernel, search the
    // ROTATED space. The oracle is the PLAIN exact kNN over the
    // original vectors: hash-matching proves the rotation is an exact
    // isometry (ids, ranks AND 6-decimal cosines identical) — the
    // property that lets a quantizer run in the energy-compacted basis
    // for free. The compaction itself is measured (`AnnTune rot`).
    "q164_rotated_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = SimilaritySearch.rotationModel(emb)
      val rot = SimilaritySearch.rotate(emb, model)
      val q = rot.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      SimilaritySearch.bruteForceTopKAgg(q, rot, k = 4)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // Source-interleaved training order: round-robin by source with a
    // per-round rotating tiebreak — both md5 uniforms, the
    // within-source ranking and the rotation key replayed digit for
    // digit. ORDER BY (rank_in_source, interleave_u, doc_id) is the
    // curriculum; at scale it's a range sort on two numeric keys.
    "q170_interleave_order" -> ((s, dir) =>
      CorpusOps.interleaveBySource(t(s, dir, "documents"), "source",
          col("doc_id"), seed = 9L)
        .select(col("doc_id"), col("source"), col("rank_in_source"),
          round(col("interleave_u"), 6).as("interleave_u"))
        .orderBy("doc_id")),

    // KMV distinct sketch: per-source distinct-3-gram estimates from a
    // k=128 bounded sketch (the count(DISTINCT) replacement whose
    // exchanges carry ≤ k longs per group), exact distinct joined as
    // the honesty panel. The sketch — k smallest md5-52bit hashes — is
    // a pure function of the gram SET, so DuckDB replays it verbatim.
    "q171_kmv_distinct" -> ((s, dir) => {
      val toks = t(s, dir, "documents").select(col("source"),
        explode(HashExpressions.shingles_k_positional(
          filter(split(col("text"), " "), x => x =!= lit("")), 3))
          .as("gram"))
      val est = Sketches.kmvDistinct(toks, "source", col("gram"), 128, 11L)
      val exact = toks.groupBy("source")
        .agg(countDistinct(col("gram")).as("exact_distinct"))
      est.join(exact, Seq("source"))
        .select(col("source"), col("sk_size"), col("h_max"),
          round(col("est_distinct"), 6).as("est_distinct"),
          col("exact_distinct"),
          round(abs(col("est_distinct") - col("exact_distinct"))
            / col("exact_distinct"), 6).as("rel_err"))
        .orderBy("source")
    }),

    // KMV set algebra: pairwise source overlap (union estimate, KMV
    // Jaccard, implied intersection) computed entirely on the k-row
    // sketches — ONE corpus scan for all 190 pairs; the per-pair exact
    // distinct join the naive form needs never happens.
    "q172_kmv_overlap" -> ((s, dir) => {
      val toks = t(s, dir, "documents").select(col("source"),
        explode(HashExpressions.shingles_k_positional(
          filter(split(col("text"), " "), x => x =!= lit("")), 3))
          .as("gram"))
      Sketches.kmvOverlap(toks, "source", col("gram"), 128, 11L)
        .select(col("grp_a"), col("grp_b"), col("union_k"),
          round(col("est_a"), 6).as("est_a"),
          round(col("est_b"), 6).as("est_b"),
          round(col("est_union"), 6).as("est_union"),
          round(col("jaccard_est"), 6).as("jaccard_est"),
          round(col("est_inter"), 6).as("est_inter"))
        .orderBy("grp_a", "grp_b")
    }),

    // Sliding-window distinct (distinct users per trailing 7 days)
    // assembled by MERGING per-day KMV panes — each event day is
    // sketched once (bounded state), every window is then 7 tiny
    // array merges; the exact panel carries the 7x-amplified range
    // join the panes replace. Pane-merge == window-KMV is the
    // mergeability theorem the oracle certifies (it computes the
    // window sketch directly from raw rows).
    "q174_sliding_distinct" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(to_date(col("ts")).as("d"), col("user_id"))
      val panes = Sketches.kmvSketch(
        ev, "d", col("user_id").cast("string"), 128, 17L)
      val spine = panes.select(col("d").as("win_end"))
      val merged = panes.join(broadcast(spine),
          datediff(col("win_end"), col("d")).between(0, 6))
        .groupBy("win_end")
        .agg(count(lit(1)).as("days_in_win"),
          Sketches.kmvMergeAgg(col("kmv"), 128).as("kmv"))
      val exact = ev.join(broadcast(spine),
          datediff(col("win_end"), col("d")).between(0, 6))
        .groupBy("win_end")
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      merged.join(exact, Seq("win_end"))
        .select(date_format(col("win_end"), "yyyy-MM-dd").as("win_end"),
          col("days_in_win"),
          size(col("kmv")).as("sk_size"),
          element_at(col("kmv"), size(col("kmv"))).as("h_max"),
          round(Sketches.estimate(col("kmv"), 128), 6).as("est_distinct"),
          col("exact_distinct"),
          round(abs(Sketches.estimate(col("kmv"), 128)
            - col("exact_distinct")) / col("exact_distinct"), 6)
            .as("rel_err"))
        .orderBy("win_end")
    }),

    // ANALYZE-style per-column stats in one scan: count / nulls /
    // KMV-sketched NDV / canonical min-max / avg canonical length for
    // seven lineitem columns of four types, shipped WITH the
    // count(DISTINCT) honesty panel (the Expand the sketch replaces —
    // the exact=false production call is spec-pinned Expand-free).
    "q173_column_stats" -> ((s, dir) =>
      // fanOut: every statistic here is order-insensitive (KMV sketch,
      // exact count/min/max, integer length sums) — see the helper doc
      Analyze.columnStats(fanOut(t(s, dir, "lineitem")),
        Seq("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag", "l_linestatus",
          "l_shipdate"), k = 128, seed = 13L, exact = true)),

    // PMI collocations (Church & Hanks 1990): pointwise mutual
    // information over adjacent-token bigrams — ln(p(ab)/(p(a)p(b))),
    // one log per DISTINCT bigram (never a float summation), support
    // >= 5, top-20 by (rounded pmi, bigram). Counts are three exact
    // aggregates; the unigram join is vocabulary-scale.
    "q187_pmi_collocations" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = docs.select(explode(
        filter(split(col("text"), " "), x => x =!= lit(""))).as("tok"))
      val uni = toks.groupBy("tok").agg(count(lit(1)).as("cu"))
      val nUni = toks.agg(count(lit(1)).as("n_uni"))
      val bigrams = docs.select(explode(
        HashExpressions.shingles_k_positional(
          filter(split(col("text"), " "), x => x =!= lit("")), 2))
        .as("bg"))
      val bgc = bigrams.groupBy("bg").agg(count(lit(1)).as("c_ab"))
      val nBig = bigrams.agg(count(lit(1)).as("n_big"))
      bgc.filter(col("c_ab") >= 5)
        .withColumn("a", split(col("bg"), " ").getItem(0))
        .withColumn("b", split(col("bg"), " ").getItem(1))
        .join(uni.select(col("tok").as("a"), col("cu").as("c_a")), Seq("a"))
        .join(uni.select(col("tok").as("b"), col("cu").as("c_b")), Seq("b"))
        .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBig))
        .select(col("bg"), col("c_ab"), col("c_a"), col("c_b"),
          round(log((col("c_ab") / col("n_big"))
            / ((col("c_a") / col("n_uni"))
              * (col("c_b") / col("n_uni")))), 6).as("pmi"))
        .orderBy(desc("pmi"), asc("bg")).limit(20)
    }),

    // Trailing-window anomaly flags: per (event_type, day), the count
    // z-scored against the previous 7 days' exact integer sums (mean /
    // std are single-op arithmetic on exact sums — deterministic, no
    // accumulation order anywhere); |z| > 2 flags. The range join runs
    // on the tiny cells frame, never on raw events.
    "q188_anomaly_zscore" -> ((s, dir) => {
      val cells = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("c"))
      val hist = cells.select(col("event_type"), col("d").as("hd"),
        col("c").as("hc"))
      cells.join(hist, Seq("event_type"))
        .filter(datediff(col("d"), col("hd")).between(1, 7))
        .groupBy(col("event_type"), col("d"), col("c"))
        .agg(count(lit(1)).as("nh"), sum(col("hc")).as("sh"),
          sum(col("hc") * col("hc")).as("sq"))
        .filter(col("nh") === 7)
        .withColumn("mean", col("sh") / 7.0)
        .withColumn("sd", sqrt((col("sq") - col("sh") * col("sh") / 7.0)
          / 6.0))
        .withColumn("z", when(col("sd") > 0,
          (col("c") - col("mean")) / col("sd")).otherwise(lit(0.0)))
        .select(col("event_type"),
          date_format(col("d"), "yyyy-MM-dd").as("d"), col("c"),
          round(col("mean"), 6).as("mean"), round(col("sd"), 6).as("sd"),
          round(col("z"), 6).as("z"),
          (col("sd") > 0 && abs(col("z")) > 2).as("flagged"))
        .orderBy("event_type", "d")
    }),

    // k-anonymity audit over the (source, lang, length-bucket)
    // quasi-identifier: per
    // equivalence class its size, below-k flag, and corpus share; ONE
    // aggregate over the corpus, the class frame is metadata-scale.
    // The governance question a training corpus answers before release.
    "q189_k_anonymity" -> ((s, dir) => {
      val cls = t(s, dir, "documents")
        .withColumn("len_bucket", floor(col("n_chars") / 200).cast("long"))
        .groupBy("source", "lang", "len_bucket")
        .agg(count(lit(1)).as("n"))
      val tot = cls.agg(sum(col("n")).as("total"),
        sum(when(col("n") < 10, col("n")).otherwise(lit(0L)))
          .as("risk_rows"))
      cls.crossJoin(broadcast(tot))
        .select(col("source"), col("lang"), col("len_bucket"), col("n"),
          (col("n") < 10).as("below_k"),
          round(col("n").cast("double") / col("total"), 6).as("share"),
          round(col("risk_rows").cast("double") / col("total"), 6)
            .as("corpus_risk_share"))
        .orderBy("source", "lang", "len_bucket")
    }),

    // PERSISTED binary-quantized serving (round-10: the q105 discipline
    // for the 1-bit family): build the q162 fixture's BQ layout ONCE on
    // disk — 192-byte codes co-bucketed with the float vecs — and serve
    // through AnnIndex.queryBq, whose candidate stage is the SAME
    // SimilaritySearch.binaryCandidates the in-memory q162 path runs
    // (persisted ≡ in-memory by construction). Hash-matches the exact
    // kNN oracle over the tiled vectors at the certified m = 256.
    "q190_bq_persisted" -> ((s, dir) => {
      import graft.functions.expressions.VectorExpressions.tile_jitter
      val emb = t(s, dir, "embeddings")
      val tiled = emb.select(col("vec_id"),
        tile_jitter(col("vec_id"), col("embedding"), reps = 24,
          sigma = 2.0).as("embedding"))
        .localCheckpoint(false)
      val q = tiled.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val h = graft.sources.AnnIndex.ensureBq(s, s"$dir#bq1536", tiled)
      graft.sources.AnnIndex.queryBq(q, h, k = 4, m = 256)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // Metadata-FILTERED search on the persisted BQ layout (the
    // q113/q114 pre-filter discipline for the 1-bit family): `allowed`
    // restricts the 192-byte codes scan BEFORE top-m, so top-m and
    // top-k are taken WITHIN the filtered set. Oracle: exact kNN over
    // the even-id tiled survivors.
    "q203_bq_filtered" -> ((s, dir) => {
      import graft.functions.expressions.VectorExpressions.tile_jitter
      val emb = t(s, dir, "embeddings")
      val tiled = emb.select(col("vec_id"),
        tile_jitter(col("vec_id"), col("embedding"), reps = 24,
          sigma = 2.0).as("embedding"))
        .localCheckpoint(false)
      val q = tiled.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val h = graft.sources.AnnIndex.ensureBq(s, s"$dir#bq1536", tiled)
      graft.sources.AnnIndex.queryBqFiltered(q, h,
          tiled.filter(col("vec_id") % 2 === 0).select("vec_id"),
          k = 4, m = 256)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // DELETE on the persisted BQ layout (q116's 1-bit twin): tombstone
    // the 8 query vectors themselves — every rank-1 self-hit must
    // disappear — and serve through the tombstone-filtered handle.
    // Oracle: exact kNN over the tiled SURVIVORS (vec_id >= 8).
    // Re-runs are deterministic: ensureBq treats a tombstoned layout
    // as stale and rebuilds before re-deleting.
    "q191_bq_delete" -> ((s, dir) => {
      import graft.functions.expressions.VectorExpressions.tile_jitter
      val emb = t(s, dir, "embeddings")
      val tiled = emb.select(col("vec_id"),
        tile_jitter(col("vec_id"), col("embedding"), reps = 24,
          sigma = 2.0).as("embedding"))
        .localCheckpoint(false)
      val q = tiled.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val key = s"$dir#bqdel"
      graft.sources.AnnIndex.ensureBq(s, key, tiled)
      val h = graft.sources.AnnIndex.deleteBq(s, key,
        tiled.filter(col("vec_id") < 8).select("vec_id"))
      graft.sources.AnnIndex.queryBq(q, h, k = 4, m = 256)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // PERSISTED composed IVF-BQ (q123's discipline for the binary
    // family): centroid-partitioned 1-bit lists + co-bucketed float
    // vecs live on disk at q168's certified operating point (8 lists,
    // probe 4, m = 256); the panel pins output IDENTITY to the float
    // IVF at the SAME stored centroids and the exact-recall floor.
    // Build-once / serve-many: the snapshot-style exists-check keeps
    // re-runs from retraining k-means.
    "q192_ivfbq_persisted" -> ((s, dir) => {
      import graft.functions.expressions.VectorExpressions.tile_jitter
      val emb = t(s, dir, "embeddings")
      val tiled = emb.select(col("vec_id"),
        tile_jitter(col("vec_id"), col("embedding"), reps = 24,
          sigma = 2.0).as("embedding"))
        .localCheckpoint(false)
      val q = tiled.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val h = graft.sources.AnnIndex.ensureIvfBq(s, s"$dir#ivfbq1536",
        tiled, lists = 8, iters = 2)
      val served = graft.sources.AnnIndex
        .queryIvfBq(q, h, k = 4, nProbe = 4, m = 256)
        .select("query_id", "rank", "vec_id")
      val fl = SimilaritySearch.ivfTopK(q, tiled, h.centroids, k = 4,
          nProbe = 4)
        .select("query_id", "rank", "vec_id")
      val exact = SimilaritySearch.bruteForceTopKAgg(q, tiled, k = 4)
        .select("query_id", "vec_id")
      served.agg(count(lit(1)).as("n_bq"))
        .crossJoin(served.exceptAll(fl).unionByName(fl.exceptAll(served))
          .agg(count(lit(1)).as("n_diff_float")))
        .crossJoin(served.join(exact, Seq("query_id", "vec_id"),
            "left_semi")
          .agg((count(lit(1)).cast("double") / lit(32.0) >= 0.4)
            .as("recall_ok")))
    }),

    // 1536-dim IVF-BQ END-TO-END canary (the DIM1536/PQ1536 discipline
    // applied to the binary family, over the REAL pipeline): chunk the
    // documents, embed each chunk at the reference's 1536-dim operating
    // point (AI.py:51 — deterministic hashing-trick embedder), persist
    // the composed IVF-BQ layout, serve. The panel pins (a) identity of
    // the PERSISTED serving to the in-memory composed path at the same
    // stored centroids — the disk round trip (sign codes written, list
    // partitions pruned, handle reattached) changes nothing — (b) the
    // exact-kNN recall floor (measured ≥0.71 at every scale; floored at
    // 0.4), (c) the 192-byte code width: no dim hardcoding anywhere in
    // the lifecycle. Float-IVF IDENTITY is deliberately NOT claimed
    // here: sparse hashing-trick sign bits (~40 set of 1536) only reach
    // it at m ≈ corpus (E2eBqProbe: m=1024 clean at ~1k chunks, 22/32
    // diffs at 10k; m=4096 = 41% of the corpus is no margin) — the
    // measured negative control for this embedding family, exactly the
    // contract binaryTopK documents. The informative-bits identity is
    // q190-q192's jitter fixture.
    "q193_ivfbq_1536_e2e" -> ((s, dir) => {
      val index = graft.rag.RagPipeline.buildIndex(s,
          t(s, dir, "documents"), chunkSize = 200, dim = 1536)
        .select(col("chunk_id").as("vec_id"), col("embedding"))
        .localCheckpoint(false)
      // chunk 0 of docs 0-7: deterministic ids (doc_id·10⁴ + index)
      val q = index
        .filter(col("vec_id") < 80000 && col("vec_id") % 10000 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val h = graft.sources.AnnIndex.ensureIvfBq(s, s"$dir#ivfbq1536e2e",
        index, lists = 8, iters = 2)
      val served = graft.sources.AnnIndex
        .queryIvfBq(q, h, k = 4, nProbe = 4, m = 256)
        .select("query_id", "rank", "vec_id")
      val mem = SimilaritySearch.ivfBqTopK(q, index, h.centroids, k = 4,
          nProbe = 4, m = 256)
        .select("query_id", "rank", "vec_id")
      val exact = SimilaritySearch.bruteForceTopKAgg(q, index, k = 4)
        .select("query_id", "vec_id")
      served.agg(count(lit(1)).as("n_bq"))
        .crossJoin(served.exceptAll(mem).unionByName(mem.exceptAll(served))
          .agg(count(lit(1)).as("n_diff_mem")))
        .crossJoin(served.join(exact, Seq("query_id", "vec_id"),
            "left_semi")
          .agg((count(lit(1)).cast("double") / lit(32.0) >= 0.4)
            .as("recall_ok")))
        .crossJoin(h.lists
          .agg(max(length(col("bcodes"))).cast("long").as("code_bytes")))
    }),

    // HYBRID DELETE end-to-end (round-10: the round-9 gap where a
    // deleted document vanished from vector results but kept surfacing
    // through BM25 fusion): build the quantized hybrid pair, tombstone
    // every query's direct rank-1 chunk — the strongest visibility,
    // every top hit must change — and serve through the OPENED
    // tombstone-filtered pair. The panel pins zero symmetric
    // difference vs the direct in-memory hybrid over the SURVIVING
    // chunks (lexical: delete ≡ rebuild exactly; dense: the q116
    // tombstoned-SQ8 identity at m=64 ≥ fetchK=10) and zero tombstoned
    // chunks in the served output. Re-runs are deterministic: ensure*
    // treats the tombstoned layouts as stale and rebuilds them before
    // re-deleting.
    "q194_hybrid_delete" -> ((s, dir) => {
      // pinned ONCE: the chunk+embed frame feeds the builds, the
      // victim pick, two direct hybrids and the open-served path —
      // unpinned it re-chunks and re-embeds per consumer
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200).toDF().localCheckpoint(false)
      val q = retrievalQueryDf(s)
      val key = dir + "!hybdel"
      def hitsOf(df: DataFrame) = df.select("query_id", "rank", "chunk_id")
      // build-once / delete-once (the q141 discipline): both halves
      // are built only when absent, and the delete rides batchId
      // replay-skip — re-runs serve the SAME built-once, tombstoned-
      // once pair instead of paying an ensure rebuild per run. Bump
      // the key suffix if the fixture or operating point changes.
      val idx = index.select(col("chunk_id").as("vec_id"),
        col("embedding"))
      if (!graft.sources.AnnIndex.sq8Exists(s, key))
        graft.sources.AnnIndex.ensureSq8(s, key, idx)
      if (!graft.sources.KeywordIndex.postingsExist(s, key))
        graft.sources.KeywordIndex.ensurePostings(s, key, index,
          idCol = "chunk_id", textCol = "text")
      val victims = RagPipeline.hybridRetrieve(q, index, k = 4)
        .filter(col("rank") === 1).select("chunk_id").distinct()
        .localCheckpoint(false)
      RagPipeline.hybridDeleteQuantized(s, key, victims,
        batchId = Some(1L))
      val served = hitsOf(RagPipeline.hybridRetrieveQuantizedOpen(
        s, key, q, index, k = 4)).localCheckpoint(false)
      val expected = hitsOf(RagPipeline.hybridRetrieve(q,
        index.join(victims, Seq("chunk_id"), "left_anti"), k = 4))
      served.agg(count(lit(1)).as("n_served"))
        .crossJoin(served.exceptAll(expected)
          .unionByName(expected.exceptAll(served))
          .agg(count(lit(1)).as("n_diff_survivor_direct")))
        .crossJoin(served.join(victims, Seq("chunk_id"), "left_semi")
          .agg(count(lit(1)).as("n_tombstoned_served")))
    }),

    // MMR retriever mode over the QUANTIZED flagship fetch (round-10:
    // the reference's search_type="mmr" served from compressed codes):
    // retrieveMmrQuantized fetches fetchK=20 candidates from the
    // persisted SQ8 layout (m=64 ≥ fetchK — the q145 margin) and runs
    // the greedy MMR stage on them; the panel pins zero symmetric
    // difference on (query_id, rank, chunk_id) vs the float-path
    // retrieveMmr at every fixture scale.
    "q195_mmr_quantized" -> ((s, dir) => {
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200)
      val q = retrievalQueryDf(s)
      def hitsOf(df: DataFrame) = df.select("query_id", "rank", "chunk_id")
      val fl = hitsOf(RagPipeline.retrieveMmr(q, index, k = 4,
        fetchK = 20, lambda = 0.5))
      val quant = hitsOf(RagPipeline.retrieveMmrQuantized(s,
        dir + "!mmrq", q, index, k = 4, fetchK = 20, lambda = 0.5,
        m = 64))
      fl.agg(count(lit(1)).as("n_float"))
        .crossJoin(quant.exceptAll(fl).unionByName(fl.exceptAll(quant))
          .agg(count(lit(1)).as("n_diff")))
    }),

    // Score-threshold retrieval served from the PERSISTED SQ8 codes
    // (round-10: q118's retriever mode composed onto the quantized
    // serving layout): top-10 from the compressed scan + exact re-rank
    // at m=64, pre-filter ranks, cosine ≥ 0.32 filter — hash-matching
    // the SAME float-path DuckDB oracle as q118.
    "q196_threshold_sq8" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val h = graft.sources.AnnIndex.ensureSq8(s, dir,
        emb.select("vec_id", "embedding"))
      graft.sources.AnnIndex.querySq8(q, h, k = 10, m = 64)
        .filter(col("score") >= 0.32)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // SEMANTIC DEDUP end-to-end (round-10; SemDeDup, Abbas et al. '23,
    // public): cluster the corpus in embedding space, pair WITHIN
    // clusters at cosine ≥ 0.9 (embeddingCosineClustered — the
    // sub-quadratic q77 candidate stage), collapse the match graph
    // with alternating-CC, keep the min-id representative per semantic
    // component. Runs on the q146 group-structured 1536-dim fixture
    // (~8 near-identical members per group, cross-group cosine ≈ 0.4),
    // where the EXACT expected outcome is derivable: every vector's
    // representative is its group's min id, vec_id % g — a full hash
    // oracle for the whole composition, not an invariant panel.
    "q197_semantic_dedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val g = emb.count() / 8
      val based = emb.select(col("vec_id"),
          (col("vec_id") % g).as("rid"),
          floor(col("vec_id") / lit(g)).cast("long").as("p"))
        .join(broadcast(emb.select(col("vec_id").as("rid"),
          col("embedding").as("bemb"))), Seq("rid"))
      val tiled = based.select(col("vec_id"),
        concat(
          array((element_at(col("bemb"), 1) + col("p") * 0.03)
            .cast("float")),
          transform(slice(col("bemb"), 2, 63), x => x.cast("float")),
          flatten(transform(sequence(lit(1), lit(23)),
            j => transform(col("bemb"),
              x => (x * pow(lit(0.9), j)).cast("float"))))).as("embedding"))
        .localCheckpoint(false)
      // lists=32/assignTop=2 quarters the within-list pair work vs the
      // q77 default (expected pairs ~ n²·a²/lists): near-identical
      // group members share their TOP list by construction, so the
      // group-recovery guarantee needs no multi-probe margin here —
      // the oracle still hash-pins exact group recovery at every scale
      val pairs = Dedup.embeddingCosineClustered(tiled, threshold = 0.9,
        lists = 32, assignTop = 2, iters = 2)
      // cost profile (BenchProbe, sf0.1): ~9 s, dominated by the
      // in-query 1536-dim k-means training — the q115 in-memory-demo
      // trade; a deployment passes persisted IVF centroids via the
      // `centroids` option and pays none of it
      val cl = Dedup.clustersAlternating(pairs.select(
        col("vec_id_a").as("doc_id_a"), col("vec_id_b").as("doc_id_b")))
      tiled.select("vec_id")
        .join(cl, col("vec_id") === col("doc_id"), "left")
        .select(col("vec_id"),
          coalesce(col("cluster_id"), col("vec_id")).as("rep_id"))
        .orderBy("vec_id")
    }),

    // FILTERED search on the float LSH layout (round-11, closing the
    // filter lattice — every quantized layout had the verb, the float
    // layouts did not): pre-filter semantics, top-4 WITHIN the
    // even-label set, the filter semi-joined onto the id-only
    // candidate stream before the rerank fetch. At the q67
    // recall-1.0 operating point the output hash-matches exact kNN
    // over the filtered set (the q204 survivors measurement
    // generalized to an arbitrary predicate).
    "q213_lsh_filtered" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val allowed = emb.filter(col("label") % 2 === 0).select("vec_id")
      val h = graft.sources.AnnIndex.ensureLsh(s, dir,
        emb.select("vec_id", "embedding"), tables = 64, bits = 12)
      graft.sources.AnnIndex.queryLshFiltered(q, h, allowed, k = 4,
          probes = 48)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // FILTERED search on the float IVF layout — the q143 panel without
    // the quantization: served ≡ IVF over pre-filtered lists (zero
    // diff), nothing outside the filter, exact-recall floor.
    "q214_ivf_filtered" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val allowed = emb.filter(col("label") % 2 === 0).select("vec_id")
      val h = graft.sources.AnnIndex.ensureIvf(s, dir,
        emb.select("vec_id", "embedding"), lists = 64, iters = 5)
      val served = graft.sources.AnnIndex
        .queryIvfFiltered(q, h, allowed, k = 4, nProbe = 24)
        .select("query_id", "rank", "vec_id")
      val direct = graft.sources.AnnIndex.queryIvf(q,
          graft.sources.AnnIndex.IvfHandle(h.centroids,
            h.lists.join(allowed, Seq("vec_id"), "left_semi")),
          k = 4, nProbe = 24)
        .select("query_id", "rank", "vec_id")
      val exact = SimilaritySearch.bruteForceTopK(q,
          emb.filter(col("label") % 2 === 0)
            .select("vec_id", "embedding"), k = 4)
        .select("query_id", "vec_id")
      served.agg(count(lit(1)).as("n_served"))
        .crossJoin(served.exceptAll(direct)
          .unionByName(direct.exceptAll(served))
          .agg(count(lit(1)).as("n_diff_direct")))
        .crossJoin(served.join(allowed, Seq("vec_id"), "left_anti")
          .agg(count(lit(1)).as("n_outside_filter")))
        .crossJoin(exact.agg(count(lit(1)).as("ne"))
          .crossJoin(exact
            .join(served.select("query_id", "vec_id"),
              Seq("query_id", "vec_id"), "left_semi")
            .agg(count(lit(1)).as("hits")))
          .select((col("hits") >= col("ne") * 0.84).as("recall_floor_ok")))
    }),

    // SEMANTIC DEDUP — DEPLOYMENT PATH (round-11, closing the round-10
    // verdict's "unverified claim"): the SAME composition as q197, but
    // the 1536-dim centroids are trained ONCE and PERSISTED (ensureIvf
    // — first run trains, every later run fingerprint-matches and
    // attaches), then fed to embeddingCosineClustered via the
    // `centroids` option — the dedup call pays ZERO in-query k-means.
    // Same exact group-recovery oracle as q197 (hash-identical
    // survivor set); the bench line records what a deployment
    // actually pays.
    "q209_semantic_dedup_served" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val g = emb.count() / 8
      val based = emb.select(col("vec_id"),
          (col("vec_id") % g).as("rid"),
          floor(col("vec_id") / lit(g)).cast("long").as("p"))
        .join(broadcast(emb.select(col("vec_id").as("rid"),
          col("embedding").as("bemb"))), Seq("rid"))
      val tiled = based.select(col("vec_id"),
        concat(
          array((element_at(col("bemb"), 1) + col("p") * 0.03)
            .cast("float")),
          transform(slice(col("bemb"), 2, 63), x => x.cast("float")),
          flatten(transform(sequence(lit(1), lit(23)),
            j => transform(col("bemb"),
              x => (x * pow(lit(0.9), j)).cast("float"))))).as("embedding"))
        .localCheckpoint(false)
      val h = graft.sources.AnnIndex.ensureIvf(s, s"$dir#semdd", tiled,
        lists = 32, iters = 2)
      val pairs = Dedup.embeddingCosineClustered(tiled, threshold = 0.9,
        assignTop = 2, centroids = Some(h.centroids))
      val cl = Dedup.clustersAlternating(pairs.select(
        col("vec_id_a").as("doc_id_a"), col("vec_id_b").as("doc_id_b")))
      tiled.select("vec_id")
        .join(cl, col("vec_id") === col("doc_id"), "left")
        .select(col("vec_id"),
          coalesce(col("cluster_id"), col("vec_id")).as("rep_id"))
        .orderBy("vec_id")
    }),

    // DELETE on the persisted float LSH layout (q116's discipline on
    // the last layout that was missing the verb): tombstone the 8
    // query vectors, serve through the anti-joined handle at the
    // q67-certified recall-1.0 point — every surviving hit equals the
    // exact kNN over the survivors. ensureLsh treats a tombstoned
    // layout as stale and rebuilds before re-deleting, so re-runs are
    // deterministic.
    "q204_lsh_delete" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val key = s"$dir#lshdel"
      graft.sources.AnnIndex.ensureLsh(s, key,
        emb.select("vec_id", "embedding"), tables = 64, bits = 12)
      val h = graft.sources.AnnIndex.deleteLsh(s, key,
        emb.filter(col("vec_id") < 8).select("vec_id"))
      graft.sources.AnnIndex.queryLsh(q, h, k = 4, probes = 48)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // DELETE + PLAN REWRITE (round-11, closing the round-10 verdict's
    // top item): after deleteLsh, a user's NAIVE raw-source crossJoin
    // kNN — no index API in sight — is still served THROUGH the
    // tombstoned index by the LshAnnPlan rewrite (source_paths survive
    // the delete; the handle's tombstone anti-join makes the answer
    // survivors-exact). The vector-store contract the reference's
    // users live by: Pinecone delete(ids=) + as_retriever() keeps
    // querying the same index (AI.py:138). Without this, every delete
    // silently degraded raw-source kNN to O(n) exact scans until a
    // compact + re-ensure. PlanInvariantsSpec proves the executed plan
    // scans the stored bucket table; the oracle is exact kNN over the
    // SURVIVORS.
    "q207_rewrite_tombstoned" -> ((outer, dir) => {
      val s = outer.newSession()
      val key = s"$dir#rwdel"
      // build-once/delete-once (the q141/q205 discipline): a
      // tombstoned layout must be SERVED, not re-ensured — ensure's
      // exactly-source contract would rebuild tombFree; batchId
      // replay-skip makes the delete a no-op on later runs
      if (!graft.sources.AnnIndex.lshExists(s, key, tables = 64,
          bits = 12))
        graft.sources.AnnIndex.ensureLsh(s, key,
          Tables.load(s, dir, "embeddings")
            .select("vec_id", "embedding"),
          tables = 64, bits = 12)
      graft.sources.AnnIndex.deleteLsh(s, key,
        Tables.load(s, dir, "embeddings")
          .filter(col("vec_id") % 10 === 9).select("vec_id"),
        batchId = Some(1L))
      graft.plans.LshAnnPlan.enable(s,
        graft.plans.LshAnnPlan.Config(persistedSource = Some(key)))
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(desc("score"), asc("vec_id"))
      emb.crossJoin(broadcast(q))
        .withColumn("score",
          graft.functions.VectorOps.cosine(col("embedding"),
            col("query_vec")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 4)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // DELETE on the persisted float IVF layout: build-once (the q141
    // exists-branch — a tombstoned layout must be SERVED, not
    // re-ensured), tombstone once under batchId replay-skip, and pin
    // zero symmetric difference vs the in-memory float IVF over the
    // SURVIVORS at the same stored centroids.
    "q205_ivf_delete" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val key = s"$dir#ivfdel"
      if (!graft.sources.AnnIndex.ivfExists(s, key, lists = 64,
          iters = 5))
        graft.sources.AnnIndex.ensureIvf(s, key,
          emb.select("vec_id", "embedding"), lists = 64, iters = 5)
      val h = graft.sources.AnnIndex.deleteIvf(s, key,
        emb.filter(col("vec_id") < 8).select("vec_id"),
        batchId = Some(1L))
      val served = graft.sources.AnnIndex
        .queryIvf(q, h, k = 4, nProbe = 24)
        .select("query_id", "rank", "vec_id")
      val fl = SimilaritySearch.ivfTopK(q,
          emb.filter(col("vec_id") >= 8), h.centroids, k = 4,
          nProbe = 24)
        .select("query_id", "rank", "vec_id")
      served.agg(count(lit(1)).as("n_served"))
        .crossJoin(served.exceptAll(fl).unionByName(fl.exceptAll(served))
          .agg(count(lit(1)).as("n_diff_float")))
        .crossJoin(served.filter(col("vec_id") < 8)
          .agg(count(lit(1)).as("n_tombstoned_served")))
    }),

    // ENTITY RESOLUTION / record linkage (round-10): resolve part
    // records to entities — block on (first name token, brand), pair
    // within blocks at levenshtein ≤ 2, collapse the match graph with
    // the alternating-CC machinery, canonical entity = min partkey.
    // The within-block pairing is the only quadratic and the largest
    // block is guard-probed loudly (128 rows at sf0.1); the oracle
    // replays pairs + recursive-CTE closure.
    "q198_entity_resolution" -> ((s, dir) => {
      val part = t(s, dir, "part")
      graft.operators.RecordLinkage.resolveEntities(
          part, "p_partkey", "p_name",
          concat_ws("|", split(col("p_name"), " ").getItem(0),
            col("p_brand")),
          maxDist = 2)
        .orderBy("p_partkey")
    }),

    // MULTI-ATTRIBUTE ENTITY-RESOLUTION SCORING (round-11): the
    // Fellegi-Sunter log-odds matcher over the q198 blocked pairs —
    // each field contributes log2(m/u) on agreement,
    // log2((1-m)/(1-u)) on disagreement (name: levenshtein ≤ 2,
    // m=.9/u=.1 → ±3.17; type: equality, .8/.3 → +1.42/−1.81; size:
    // equality, .7/.2 → +1.81/−1.42); minScore=3.0 keeps exactly the
    // pairs with name agreement plus at least one corroborating field.
    // Same blocked (never all-pairs) shape as q198; the oracle replays
    // the agreement flags AND the weighted-sum arithmetic verbatim.
    "q210_er_scored" -> ((s, dir) => {
      import graft.operators.RecordLinkage.FieldAgreement
      graft.operators.RecordLinkage.scoredPairs(
          t(s, dir, "part"), "p_partkey",
          Seq(
            FieldAgreement("p_name",
              (a, b) => levenshtein(a, b) <= 2, 0.9, 0.1),
            FieldAgreement("p_type", (a, b) => a === b, 0.8, 0.3),
            FieldAgreement("p_size", (a, b) => a === b, 0.7, 0.2)),
          concat_ws("|", split(col("p_name"), " ").getItem(0),
            col("p_brand")),
          minScore = 3.0)
        .select(col("id_a"), col("id_b"), col("agree_p_name"),
          col("agree_p_type"), col("agree_p_size"),
          round(col("score"), 6).as("score"))
        .orderBy("id_a", "id_b")
    }),

    // SCD2 interval build (round-10): the events feed collapsed to
    // slowly-changing-dimension rows per user — consecutive runs of
    // the same event_type fold into one [valid_from, valid_to)
    // interval, is_current on each user's open row. One key-partitioned
    // window pass (lag change detection + lead close), ties ordered by
    // (ts, value) on BOTH windows; the oracle replays the identical
    // window arithmetic. Interval bounds ship as epoch MICROS (the
    // house timestamp-output rule — raw timestamps compare ns-vs-us
    // across engines).
    "q199_scd2_intervals" -> ((s, dir) =>
      graft.operators.Scd2.fromChanges(
          t(s, dir, "events").filter(col("user_id") % 5 === 0)
            .select("user_id", "ts", "event_type"),
          "user_id", "ts", Seq("event_type"))
        .select(col("user_id"), col("event_type"),
          unix_micros(col("valid_from")).as("valid_from_us"),
          unix_micros(col("valid_to")).as("valid_to_us"),
          col("is_current"))
        .orderBy("user_id", "valid_from_us", "event_type")),

    // SCD2 POINT-IN-TIME LOOKUP (round-10, completing q199's family
    // under the oracle gate): every purchase probes the buyer's SCD2
    // event-type dimension AS OF the purchase instant — features as
    // they WERE, the temporal-leakage-free training join. Probes
    // before a user's first interval honestly read null. Epoch-micros
    // outputs (the house timestamp rule).
    "q206_scd2_lookup" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("user_id") % 5 === 0)
      val dim = graft.operators.Scd2.fromChanges(
        ev.select("user_id", "ts", "event_type"),
        "user_id", "ts", Seq("event_type"))
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.operators.Scd2.asOfLookup(probes, dim, "user_id", "ts")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("event_type").as("tier"),
          unix_micros(col("valid_from")).as("valid_from_us"))
        .orderBy("user_id", "event_id")
    }),

    // INCREMENTAL SPLIT STORE (round-11): stable train/val/test
    // assignments for a GROWING corpus — the evens arrive first and
    // are assigned; the odds arrive as an increment whose match edges
    // collapse onto the STORED cluster identities, so new members
    // ADOPT their cluster's committed split and nothing ever flips
    // (a one-shot re-split could change a cluster's min-id rep and
    // move v1 training docs into v2's test set). The panel pins: all
    // docs assigned, batch-1 rows byte-stable through batch 2, and
    // zero match pairs straddling a split boundary.
    "q217_split_store" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val key = s"$dir#splitstore"
      // fanOut: the q53 rationale — the shingle explode + self-join is
      // CPU-bound and the fixture scan yields one split; the pair SET
      // is deterministic regardless of input partitioning
      val allPairs = Dedup.ngramJaccard(fanOut(docs), k = 3,
          threshold = 0.12)
        .select("doc_id_a", "doc_id_b").localCheckpoint(true)
      val evens = docs.filter(col("doc_id") % 2 === 0).select("doc_id")
      val odds = docs.filter(col("doc_id") % 2 === 1).select("doc_id")
      val p1 = allPairs.filter(col("doc_id_a") % 2 === 0 &&
        col("doc_id_b") % 2 === 0)
      // build-once (batchId replay-skip — the q141 discipline): later
      // runs serve the committed layout and only re-verify
      graft.sources.SplitStore.assign(s, key, evens, p1, batchId = 1L)
      val fin = graft.sources.SplitStore.assign(s, key, odds,
        allPairs.filter(col("doc_id_a") % 2 === 1 ||
          col("doc_id_b") % 2 === 1), batchId = 2L)
      // WRITE-ONCE STABILITY as a per-row arithmetic check (no second
      // CC run): every batch-1 (even) row must still read exactly its
      // committed form — an even rep (batch-1 components contain only
      // evens) whose split is the rep's own md5 bucket. A batch-2
      // flip of either field breaks the zero. Fresh-store parity with
      // the one-shot operator is pinned separately in SplitStoreSpec.
      val finA = fin.select("doc_id", "rep_id", "split")
      val finEv = finA.join(evens, Seq("doc_id"), "left_semi")
      val changed = finEv.filter(col("rep_id") % 2 =!= 0 ||
        col("split") =!= CorpusOps.splitExpr(col("rep_id"), 77L, 10, 8, 1))
      fin.agg(count(lit(1)).as("n_total"))
        .crossJoin(finEv.agg(count(lit(1)).as("n_batch1")))
        .crossJoin(changed.agg(count(lit(1)).as("n_changed")))
        .crossJoin(allPairs
          .join(finA.select(col("doc_id").as("doc_id_a"),
            col("split").as("sa")), Seq("doc_id_a"))
          .join(finA.select(col("doc_id").as("doc_id_b"),
            col("split").as("sb")), Seq("doc_id_b"))
          .filter(col("sa") =!= col("sb"))
          .agg(count(lit(1)).as("n_straddle")))
    }),

    // CROSS-STORE PURGE with a served-nowhere proof (round-12): the
    // right-to-be-forgotten verb promoted to the whole-engine
    // guarantee. One Governance.purge(ids) walks eight persisted
    // layouts — float LSH, composed IVF-SQ8, binary BQ, BM25 postings
    // (tombstoned), exact + near dedup stores, the split store, the
    // SCD2 dimension (rewritten) — then Governance.audit re-reads
    // EVERY serving surface (the open* frames every query verb scans)
    // and the panel drives the query verbs themselves end-to-end with
    // the victims' own pre-purge vectors/terms — the probes MOST
    // likely to retrieve them (pre-purge each victim self-matches at
    // rank 1). Build-once + batchId replay-skip throughout (the
    // q141/q205 exists-branch: a tombstoned layout must be SERVED,
    // never re-ensured); the store counts the oracle replays are the
    // REWRITE proofs (fps keyed by content groups whose min-id keeper
    // survived; assignments and intervals minus the victims').
    "q218_purge" -> ((s, dir) => {
      import graft.sources.{AnnIndex, KeywordIndex, DedupStore,
        SplitStore, Scd2Store}
      import graft.operators.Governance
      val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
      val docs = t(s, dir, "documents")
      val ev = t(s, dir, "events").filter(col("user_id") % 5 === 0)
        .select("user_id", "ts", "event_type")
      val victims = emb.filter(col("vec_id") < 6).select("vec_id")
      val (kLsh, kIsq, kBq, kKw) = (s"$dir#purgelsh",
        s"$dir#purgeivfsq8", s"$dir#purgebq", s"$dir#purgekw")
      val (kDd, kSp, kS2) = (s"$dir#purgededup", s"$dir#purgesplit",
        s"$dir#purgescd2")
      if (!AnnIndex.lshExists(s, kLsh))
        AnnIndex.ensureLsh(s, kLsh, emb)
      if (!AnnIndex.ivfSq8Exists(s, kIsq, lists = 64, iters = 5))
        AnnIndex.ensureIvfSq8(s, kIsq, emb, lists = 64, iters = 5)
      if (!AnnIndex.bqExists(s, kBq))
        AnnIndex.ensureBq(s, kBq, emb)
      if (!KeywordIndex.postingsExist(s, kKw))
        KeywordIndex.ensurePostings(s, kKw, docs)
      DedupStore.dedupBatch(s, kDd, docs, batchId = 1L)
      DedupStore.nearDedupBatch(s, kDd,
        docs.filter(col("doc_id") % 4 === 0), batchId = 1L)
      SplitStore.assign(s, kSp, docs.select("doc_id"),
        docs.select(col("doc_id").as("doc_id_a"),
          col("doc_id").as("doc_id_b")).limit(0), batchId = 1L)
      Scd2Store.merge(s, kS2, ev, "user_id", "ts", Seq("event_type"),
        batchId = 1L)
      val scope = Governance.PurgeScope(lsh = Seq(kLsh),
        ivfSq8 = Seq(kIsq), bq = Seq(kBq), postings = Seq(kKw),
        dedupSeen = Seq(kDd), dedupNear = Seq(kDd), splits = Seq(kSp),
        scd2 = Seq((kS2, "user_id")))
      Governance.purge(s, victims, scope, batchId = Some(1L))
      val audit = Governance.audit(s, victims, scope)
        .localCheckpoint(true)
      // end-to-end serving probes: the victims' own vectors and text
      val q = emb.filter(col("vec_id") < 6)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      def hits(df: DataFrame, on: String): DataFrame =
        df.filter(col(on) < 6).agg(count(lit(1)))
      val lshHits = AnnIndex.queryLsh(q, AnnIndex.openLsh(s, kLsh),
        k = 4)
      val isqHits = AnnIndex.queryIvfSq8(q, AnnIndex.openIvfSq8(s, kIsq),
        k = 4, nProbe = 24)
      val bqHits = AnnIndex.queryBq(q, AnnIndex.openBq(s, kBq), k = 4)
      val bmHits = KeywordSearch.bm25TopKFromPostings(
        docs.filter(col("doc_id") < 6)
          .select(col("doc_id").as("query_id"),
            substring(col("text"), 1, 60).as("query_text")),
        KeywordIndex.openPostings(s, kKw), k = 5)
      audit.agg(count(lit(1)).as("n_surfaces"),
          sum(col("n_served_purged")).as("n_served_purged"))
        .crossJoin(victims.agg(count(lit(1)).as("n_victims")))
        .crossJoin(hits(lshHits, "vec_id").toDF("n_lsh_hits"))
        .crossJoin(hits(isqHits, "vec_id").toDF("n_ivfsq8_hits"))
        .crossJoin(hits(bqHits, "vec_id").toDF("n_bq_hits"))
        .crossJoin(hits(bmHits, "doc_id").toDF("n_bm25_hits"))
        .crossJoin(DedupStore.readSeen(s, kDd)
          .agg(count(lit(1)).as("n_seen_after")))
        .crossJoin(SplitStore.read(s, kSp)
          .agg(count(lit(1)).as("n_split_after")))
        .crossJoin(Scd2Store.readDim(s, kS2)
          .agg(count(lit(1)).as("n_scd2_after")))
    }),

    // OPQ∘IVF-PQ — the full faiss production factory string
    // (round-12, composing q221's stored rotation with the q123
    // IVF-PQ serving layout): rotation in front, DPP-pruned probed
    // lists + 16-byte ADC scan + exact rerank behind, deletes and
    // compaction inherited from the inner layout. The panel pins (a)
    // output IDENTITY to the float IVF path at the same stored
    // centroids and probes (the PQ layer is output-lossless at this
    // m) and (b) a recall floor vs exact kNN (inherited from the
    // probe recall). Build-once via opqIvfPqExists.
    "q224_opq_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val fl = emb.select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x * pow(lit(0.8), i)).cast("float")).as("embedding"))
      val d = 64
      val m0 = Array.tabulate(d * d) { kk =>
        val i = kk / d; val j = kk % d
        math.sin(i * 7919.0 + j * 104729.0) +
          math.sin(j * 7919.0 + i * 104729.0)
      }
      val (_, qcols) = SimilaritySearch.jacobiEig(m0, d)
      val mix = SimilaritySearch.RotationModel(
        Array.tabulate(d * d)(kk => qcols((kk % d) * d + kk / d)),
        Array.fill(d)(0.0), d)
      val scrambled = SimilaritySearch.rotate(fl, mix)
        .withColumn("embedding", col("embedding").cast("array<float>"))
        .localCheckpoint(true)
      val key = s"$dir#opqivfpq"
      import graft.sources.AnnIndex
      val h = if (AnnIndex.opqIvfPqExists(s, key, lists = 16))
        AnnIndex.openOpqIvfPq(s, key)
      else AnnIndex.ensureOpqIvfPq(s, key, scrambled, lists = 16,
        iters = 3, numSub = 16, ksub = 64, pqIters = 2)
      val q = scrambled.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val served = AnnIndex.queryOpqIvfPq(q, h, k = 4, nProbe = 8,
          m = 128)
        .select("query_id", "rank", "vec_id").localCheckpoint(true)
      // float reference at the SAME stored centroids and probes, in
      // the same rotated space
      val model = AnnIndex.loadRotation(h.rotation)
      val rotIdx = SimilaritySearch.rotate(scrambled, model)
        .withColumn("embedding", col("embedding").cast("array<float>"))
        .localCheckpoint(true)
      val rotQ = rotIdx.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val flRef = SimilaritySearch.ivfTopK(rotQ, rotIdx,
          h.inner.centroids, k = 4, nProbe = 8)
        .select("query_id", "rank", "vec_id")
      val exact = SimilaritySearch.bruteForceTopKAgg(q, scrambled, 4)
        .select("query_id", "vec_id")
      served.agg(count(lit(1)).as("n_served"))
        .crossJoin(served.exceptAll(flRef)
          .unionByName(flRef.exceptAll(served))
          .agg(count(lit(1)).as("n_diff_float")))
        .crossJoin(served.join(exact, Seq("query_id", "vec_id"),
            "left_semi")
          .agg((count(lit(1)).cast("double") / lit(32.0) >= 0.5)
            .as("recall_ok")))
    }),

    // LINE-STORE ERASURE (round-12, the last dedup-purge leg): the
    // line-df store's rows are cross-document AGGREGATES, so erasure
    // is a replay-guarded contribution DECREMENT (earliest-batch
    // first), not a row delete. Two ingest batches, then
    // Governance.purge with the victims' pre-deletion text; the panel
    // pins (a) the surviving unit total = exactly the survivors'
    // distinct (doc, line) pairs — replayed in SQL — and (b) zero
    // per-line difference against a FRESH store built from the
    // survivors alone (the parity invariant). Replay-stable: ingest
    // replays reconstruct, the purge id skips.
    "q225_line_purge" -> ((s, dir) => {
      import graft.sources.DedupStore
      import graft.operators.Governance
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val (kA, kB) = (s"$dir#linepurge", s"$dir#linepurgeref")
      DedupStore.lineDedupBatch(s, kA,
        docs.filter(col("doc_id") % 2 === 0), batchId = 1L,
        maxDf = 1000000)
      DedupStore.lineDedupBatch(s, kA,
        docs.filter(col("doc_id") % 2 === 1), batchId = 2L,
        maxDf = 1000000)
      val victims = docs.filter(col("doc_id") < 6)
      Governance.purge(s, victims.select("doc_id"),
        Governance.PurgeScope(dedupLines = Seq(kA)),
        batchId = Some(1L), texts = Some(victims))
      // reference: a fresh store over the survivors alone
      val surv = docs.filter(col("doc_id") >= 6)
      DedupStore.lineDedupBatch(s, kB,
        surv.filter(col("doc_id") % 2 === 0), batchId = 1L,
        maxDf = 1000000)
      DedupStore.lineDedupBatch(s, kB,
        surv.filter(col("doc_id") % 2 === 1), batchId = 2L,
        maxDf = 1000000)
      def tot(key: String) = DedupStore.readLineDf(s, key)
        .groupBy("lh").agg(sum("df").as("t"))
      val diff = tot(kA).alias("a")
        .join(tot(kB).alias("r"), Seq("lh"), "full")
        .filter(!(col("a.t") <=> col("r.t")))
      tot(kA).agg(coalesce(sum("t"), lit(0L)).as("n_units_after"))
        .crossJoin(diff.agg(count(lit(1)).as("n_parity_diff")))
    }),

    // LOGGED PURGE — the compliance trail (round-12, completing the
    // q218 family): two erasure batches run through purgeLogged, which
    // persists the id roster, the per-store receipt, and the
    // served-nowhere audit AS OF each purge (append-only, meta-after-
    // data, batchId replay-skip — a replayed batch returns its STORED
    // proof and re-runs nothing). The panel counts the accumulated
    // trail and replays the one rewrite proof; all constants survive
    // build AND replay runs.
    "q223_purge_logged" -> ((s, dir) => {
      import graft.sources.{AnnIndex, DedupStore}
      import graft.operators.Governance
      val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
      val docs = t(s, dir, "documents")
      val (kL, kD) = (s"$dir#ploglsh", s"$dir#plogdd")
      if (!AnnIndex.lshExists(s, kL)) AnnIndex.ensureLsh(s, kL, emb)
      DedupStore.dedupBatch(s, kD, docs, batchId = 1L)
      val scope = Governance.PurgeScope(lsh = Seq(kL),
        dedupSeen = Seq(kD))
      val logDir = s"${s.conf.get("spark.graft.ann.basePath", "/tmp")}" +
        s"/graft_purgelog_${graft.sources.IndexStore.pathTag(dir)}"
      Governance.purgeLogged(s,
        emb.filter(col("vec_id") < 4).select("vec_id"), scope, logDir,
        batchId = 1L)
      Governance.purgeLogged(s,
        emb.filter(col("vec_id") >= 4 && col("vec_id") < 6)
          .select("vec_id"), scope, logDir, batchId = 2L)
      Governance.readPurgeLog(s, logDir, "roster")
        .agg(count(lit(1)).as("n_roster"))
        .crossJoin(Governance.readPurgeLog(s, logDir, "receipt")
          .agg(count(lit(1)).as("n_receipt")))
        .crossJoin(Governance.readPurgeLog(s, logDir, "audit")
          .agg(count(lit(1)).as("n_audit"),
            sum("n_served_purged").as("served_total")))
        .crossJoin(DedupStore.readSeen(s, kD)
          .agg(count(lit(1)).as("n_seen_after")))
        .crossJoin(AnnIndex.openLsh(s, kL).vecs
          .filter(col("vec_id") < 6)
          .agg(count(lit(1)).as("n_lsh_purged_served")))
    }),

    // GRAPH-SERVED RAG (round-12; operating point closed round-13):
    // the reference's retrieval surface (external query text →
    // chunk-level top-4) served through the persisted GRAPH lane
    // end-to-end — chunk embeddings into ensureGraph (built once per
    // fixture, snapshot-trusted after), external queries beam-searched
    // through the stored undirected graph. Round-12 shipped
    // (beam=32, rounds=3) and recorded an honest 19/20 at sf0.1 — the
    // one winner chunk sits in a weak NN-Descent neighborhood that
    // beam WIDTH alone never reaches (GraphRagProbe: beam 64 at
    // rounds 3 still misses it; one extra expansion ROUND reaches it
    // at beam 32). Shipped rounds=4: measured 20/20 at ALL three
    // scales, floor raised 0.90 → 0.95 per the round-12 verdict.
    "q239_graph_rag" -> ((s, dir) => {
      import graft.sources.GraphIndex
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200)
        .select(col("chunk_id").as("vec_id"), col("embedding"))
        .localCheckpoint(true)
      val key = s"$dir#chunkgraph"
      GraphIndex.ensureGraph(s, key, index, k = 8, rounds = 4,
        blockSize = 50, maxDegree = 24, snapshotId = Some(dir))
      val q = retrievalQueryDf(s).select(col("query_id"),
        graft.rag.Embedder.embedCol(col("query_text")).as("query_vec"))
      val served = GraphIndex.queryGraph(s, key, q, k = 4, beam = 32,
        rounds = 4).select("query_id", "vec_id")
      val exact = SimilaritySearch.bruteForceTopK(q, index, k = 4)
        .select("query_id", "vec_id").localCheckpoint(true)
      exact.agg(countDistinct("query_id").as("n_queries"),
          count(lit(1)).as("n_exact"))
        .crossJoin(exact.join(served, Seq("query_id", "vec_id"),
          "left_semi").agg(count(lit(1)).as("hits")))
        .crossJoin(index.agg(countDistinct("vec_id").as("n_chunks")))
        .select(col("n_queries"), col("n_exact"), col("n_chunks"),
          (col("hits") >= col("n_exact") * 0.95).as("recall_ok"))
    }),

    // EMBEDDING-SPACE DRIFT (round-12): the vector analogue of the
    // scalar PSI gate (q-family: PSI over n_chars) — centroid
    // direction shift, norm means, and PSI over the cosine-to-
    // reference-centroid distribution between two snapshots (here the
    // label=0 slice vs the rest — a deterministic two-snapshot split
    // of the fixture). EVERYTHING replays relationally: per-dimension
    // centroids, the double cosine projections, bucket counts,
    // Laplace smoothing, the PSI sum.
    "q238_embedding_drift" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Drift.embeddingDrift(
        emb.filter(col("label") =!= 0), emb.filter(col("label") === 0),
        buckets = 10)
    }),

    // QUANTIZED MaxSim (round-12): the int8 first stage for the
    // byte-heaviest retrieval layout there is (a vector per CHUNK) —
    // approximate MaxSim over SQ8 codes (4× fewer scan bytes)
    // shortlists mDocs=16 docs, exact float MaxSim reranks. Output-
    // identical to the full-scan q228 ranking at the shipped point:
    // MaxSimTune sq8 measured the required shortlist at 4 / 4 / 4
    // across the three scales (the int8 rounding never reorders the
    // doc shortlist here), so 16 is a 4× margin (q103 discipline).
    "q237_maxsim_quantized" -> ((s, dir) => {
      import graft.operators.LateInteraction
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200).localCheckpoint(true)
      val qt = LateInteraction.queryTokens(retrievalQueryDf(s))
        .localCheckpoint(true)
      def key(df: DataFrame) = df.select("query_id", "rank", "doc_id")
      val full = key(LateInteraction.maxSimTopK(qt, index, k = 4))
      val served = key(LateInteraction.maxSimQuantizedTopK(qt, index,
        k = 4, mDocs = 16))
      full.agg(count(lit(1)).as("n_full"),
          countDistinct("query_id").as("n_queries"))
        .crossJoin(served.exceptAll(full).unionByName(full.exceptAll(served))
          .agg(count(lit(1)).as("n_diff")))
    }),

    // GRAPH LAYOUT UNDER THE ERASURE FLAGSHIP (round-12): the newest
    // persisted layout joins the q218/q223 whole-engine purge
    // guarantee under the oracle gate — purgeLogged walks the graph
    // index (tombstoning results AND both edge endpoints: routing
    // through a purged node is also a serve), the compliance trail
    // accumulates, a REPLAYED batch returns its stored served-nowhere
    // proof without re-running legs, and the victims' own pre-purge
    // vectors (the probes most likely to retrieve them) are driven
    // through the stored graph end-to-end: zero served.
    "q236_graph_purge" -> ((s, dir) => {
      import graft.sources.GraphIndex
      import graft.operators.Governance
      val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
      val key = s"$dir#pgraph"
      if (!GraphIndex.graphExists(s, key))
        GraphIndex.ensureGraph(s, key, emb, k = 8, rounds = 3,
          blockSize = 50, maxDegree = 24)
      val scope = Governance.PurgeScope(graphs = Seq(key))
      val victims = emb.filter(col("vec_id") % 50 === 7)
        .localCheckpoint(true)
      val logDir = s"${s.conf.get("spark.graft.ann.basePath", "/tmp")}" +
        s"/graft_gpurgelog_${graft.sources.IndexStore.pathTag(dir)}"
      val audit = Governance.purgeLogged(s, victims.select("vec_id"),
        scope, logDir, batchId = 1L)
      val replay = Governance.purgeLogged(s, victims.select("vec_id"),
        scope, logDir, batchId = 1L)
      val probes = victims.select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"))
      val servedVictims = GraphIndex.queryGraph(s, key, probes, k = 4,
          beam = 16, rounds = 3)
        .join(victims.select("vec_id"), Seq("vec_id"), "left_semi")
      audit.agg(count(lit(1)).as("n_audit_rows"),
          sum("n_served_purged").as("served_total"))
        .crossJoin(replay.agg(
          sum("n_served_purged").as("served_replay")))
        .crossJoin(victims.agg(count(lit(1)).as("n_victims")))
        .crossJoin(servedVictims.agg(count(lit(1))
          .as("n_victims_served")))
        .crossJoin(GraphIndex.openGraph(s, key).vecs
          .agg(count(lit(1)).as("n_vecs_served")))
    }),

    // CROSS-STORE MAINTENANCE DRIVER (round-13, verdict #8): the
    // scheduled "vacuum" — Governance.maintain walks the scoped
    // layouts, measures served data-file counts, compacts past the
    // threshold through each store's own journaled verb. The oracle
    // pins the REPLAY-STABLE facts: answers on both surfaces are
    // byte-identical across maintenance (zero symmetric difference),
    // file counts end at/below the bound, and an immediate second run
    // compacts nothing (idempotence). Raw before-counts are not
    // output: a verify re-run starts from the already-compacted store
    // (the replay-skip upserts fold away), so they are run-dependent.
    "q243_maintenance" -> ((s, dir) => {
      import graft.operators.Governance
      import graft.sources.{AnnIndex, KeywordIndex}
      val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
        .localCheckpoint(true)
      val docs = t(s, dir, "documents").select("doc_id", "text")
        .localCheckpoint(true)
      val kL = s"$dir#maint-lsh"
      val kK = s"$dir#maint-kw"
      // multi-file-set layouts: base build + two replay-guarded upsert
      // batches (each append lands its own file set)
      if (!AnnIndex.lshExists(s, kL))
        AnnIndex.ensureLsh(s, kL, emb.filter(col("vec_id") % 5 =!= 0))
      AnnIndex.upsertLsh(s, kL,
        emb.filter(col("vec_id") % 5 === 0 && col("vec_id") % 10 =!= 5),
        batchId = Some(1L))
      AnnIndex.upsertLsh(s, kL, emb.filter(col("vec_id") % 10 === 5),
        batchId = Some(2L))
      if (!KeywordIndex.postingsExist(s, kK))
        KeywordIndex.ensurePostings(s, kK,
          docs.filter(col("doc_id") % 5 =!= 0))
      KeywordIndex.upsertPostings(s, kK,
        docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % 10 =!= 5),
        batchId = Some(1L))
      KeywordIndex.upsertPostings(s, kK,
        docs.filter(col("doc_id") % 10 === 5), batchId = Some(2L))
      val scope = Governance.PurgeScope(lsh = Seq(kL), postings = Seq(kK))
      val probes = emb.filter(col("vec_id") % 40 === 1)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec")).localCheckpoint(true)
      def lshAnswers() = AnnIndex.queryLsh(probes,
          AnnIndex.openLsh(s, kL), k = 4)
        .select("query_id", "rank", "vec_id")
      def bmAnswers() = KeywordSearch.bm25TopKFromPostings(
          retrievalQueryDf(s), KeywordIndex.openPostings(s, kK), k = 5,
          stats = KeywordIndex.statsFor(s, kK))
        .select("query_id", "rank", "doc_id", "score")
      val lshBefore = lshAnswers().localCheckpoint(true)
      val bmBefore = bmAnswers().localCheckpoint(true)
      // threshold above the post-compaction floor (LSH rewrites land
      // one file per storage bucket per table) so the oracle's
      // files-at-or-below-bound and second-run-no-op claims are
      // replay-stable
      val run1 = Governance.maintain(s, scope, maxFiles = 24)
        .localCheckpoint(true)
      val lshAfter = lshAnswers()
      val bmAfter = bmAnswers()
      val run2 = Governance.maintain(s, scope, maxFiles = 24)
        .localCheckpoint(true)
      run1.agg(count(lit(1)).as("n_layouts"),
          sum(when(col("files_after") > 24, 1L).otherwise(0L))
            .as("n_over_bound_after"))
        .crossJoin(run2.agg(sum(when(col("compacted"), 1L).otherwise(0L))
          .as("n_second_run_compactions")))
        .crossJoin(lshAfter.exceptAll(lshBefore)
          .unionByName(lshBefore.exceptAll(lshAfter))
          .agg(count(lit(1)).as("n_diff_lsh")))
        .crossJoin(bmAfter.exceptAll(bmBefore)
          .unionByName(bmBefore.exceptAll(bmAfter))
          .agg(count(lit(1)).as("n_diff_bm25")))
        .crossJoin(bmBefore.agg(count(lit(1)).as("n_bm25_rows")))
    }),

    // ROUND-13 LAYOUTS UNDER THE ERASURE FLAGSHIP: the PLAID and
    // impact layouts join the q218/q236 whole-engine purge guarantee.
    // Plaid tombstones anti-join BOTH serving tables (survivor serving
    // stays exact); the impact layout POISONS — it refuses to serve
    // under stale baked statistics rather than silently rescoring (the
    // refuse-don't-guess discipline; the postings path is the exact
    // deletable BM25 surface). Audit zero, replayed purge a no-op
    // (exists-gated builds + per-verb replay-skip counters, the q236
    // replay shape), and the victims' own probes retrieve survivors
    // only.
    "q244_r13_purge" -> ((s, dir) => {
      import graft.operators.Governance
      import graft.sources.{ImpactIndex, PlaidIndex}
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val chunks = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200)
        .select(col("doc_id"), col("chunk_id").as("vec_id"),
          col("embedding")).localCheckpoint(true)
      val kP = s"$dir#ppurge"
      val kI = s"$dir#ipurge"
      if (!PlaidIndex.plaidExists(s, kP))
        PlaidIndex.ensurePlaid(s, kP, chunks)
      if (!ImpactIndex.impactsExist(s, kI))
        ImpactIndex.ensureImpacts(s, kI, docs)
      val victims = docs.filter(col("doc_id") % 25 === 3)
        .select("doc_id").localCheckpoint(true)
      val scope = Governance.PurgeScope(plaid = Seq(kP),
        impacts = Seq(kI))
      val receipt = Governance.purge(s, victims, scope,
        batchId = Some(1L)).localCheckpoint(true)
      // replayed purge: per-verb replay-skip counters make it a no-op
      Governance.purge(s, victims, scope, batchId = Some(1L))
      val audit = Governance.audit(s, victims, scope)
        .localCheckpoint(true)
      val qt = graft.operators.LateInteraction.queryTokens(
        retrievalQueryDf(s))
      val plaidServed = PlaidIndex.plaidTopK(s, kP, qt, k = 4,
        nProbe = 16, mDocs = 16).localCheckpoint(true)
      val wandRefuses =
        try { ImpactIndex.wandTopK(s, kI, retrievalQueryDf(s), k = 5)
          .queryExecution.toRdd.count(); false }
        catch { case e: IllegalArgumentException =>
          e.getMessage.contains("poisoned") }
      victims.agg(count(lit(1)).as("n_victims"))
        .crossJoin(receipt.agg(
          sum(when(col("action") === "tombstoned", 1L).otherwise(0L))
            .as("n_tombstoned_legs"),
          sum(when(col("action") === "poisoned", 1L).otherwise(0L))
            .as("n_poisoned_legs")))
        .crossJoin(audit.agg(count(lit(1)).as("n_audit_rows"),
          sum("n_served_purged").as("served_total")))
        .crossJoin(plaidServed
          .join(victims, Seq("doc_id"), "left_semi")
          .agg(count(lit(1)).as("n_victims_served_plaid")))
        .crossJoin(plaidServed.agg((count(lit(1)) > 0)
          .as("plaid_serves_survivors")))
        .select(col("n_victims"), col("n_tombstoned_legs"),
          col("n_poisoned_legs"), col("n_audit_rows"),
          col("served_total"), col("n_victims_served_plaid"),
          col("plaid_serves_survivors"),
          lit(wandRefuses).as("wand_refuses"))
    }),

    // END-TO-END PRETRAINING EXPORT (round-12): the certified pieces
    // chained ONCE, token-level — normalize → Gopher gate → persisted
    // dedup store → leakage-free split (prefix-blocked pairs; their
    // equality classes make the CC closure SQL-trivial) → BPE encode
    // with the corpus-trained merges (q169's tokenizer, fixed) →
    // packSequences over ACTUAL BPE token counts (not whitespace
    // proxies) → interleaveBySource. Every stage count, the exact
    // token total, the packed-sequence count, the boundary straddlers
    // and the interleave rank algebra replay in ONE DuckDB statement —
    // the q84/q140 funnel discipline promoted to the token level,
    // proving the operators compose without a seam.
    "q222_pretraining_export" -> ((s, dir) => {
      // fanOut: the normalize + gopher-signals pass is per-row CPU on a
      // single-split scan; every consumer (counts, fingerprinted store
      // builds, id-keyed joins, shard-windowed packing) is
      // order-insensitive or id-deterministic
      val raw = fanOut(t(s, dir, "documents"))
      val d0 = TextAnalysis.normalizeText(raw)
        .withColumn("text", col("norm_text")).drop("norm_text")
      val gated = TextAnalysis.gopherSignals(d0)
        .filter(col("top2_frac") <= 0.12)
        .select("doc_id", "text", "source")
        .localCheckpoint(true)
      val kept = graft.sources.DedupStore.dedupBatch(s,
        s"$dir#export", gated, batchId = 1L).localCheckpoint(true)
      val pfx = kept.select(col("doc_id"),
        substring(col("text"), 1, 40).as("p"))
      val pairs = pfx.select(col("doc_id").as("doc_id_a"), col("p"))
        .join(pfx.select(col("doc_id").as("doc_id_b"), col("p")),
          Seq("p"))
        .filter(col("doc_id_a") < col("doc_id_b"))
        .select("doc_id_a", "doc_id_b")
      val sp = CorpusOps.leakageFreeSplit(kept.select("doc_id"),
        "doc_id", pairs)
      val train = kept.join(sp.filter(col("split") === "train")
        .select("doc_id"), Seq("doc_id"), "left_semi")
        .localCheckpoint(true)
      // the fixed tokenizer is a train-once ARTIFACT (the store
      // fingerprints the corpus; row-identical to bpeMergesLocal)
      val merges = graft.sources.TokenizerStore.ensureBpeMergeList(s,
        s"$dir#bpe12", raw, numMerges = 12, snapshotId = Some(dir))
      val enc = CorpusOps.bpeEncodeTokens(train, merges, sep = " ")
      val packed = CorpusOps.packSequences(
          enc.select(col("doc_id"), col("tokens_str").as("text"))
            .join(train.select("doc_id", "source"), Seq("doc_id")),
          "source", "doc_id", budget = 512)
        .localCheckpoint(true)
      val inter = CorpusOps.interleaveBySource(
        train.select("doc_id", "source"), "source", col("doc_id"),
        seed = 9L)
      raw.agg(count(lit(1)).as("n_in"))
        .crossJoin(gated.agg(count(lit(1)).as("n_after_gate")))
        .crossJoin(kept.agg(count(lit(1)).as("n_after_dedup")))
        .crossJoin(train.agg(count(lit(1)).as("n_train")))
        .crossJoin(packed.agg(sum("n_tok").as("train_tokens"),
          sum((col("first_seq") =!= col("last_seq")).cast("long"))
            .as("n_straddlers")))
        .crossJoin(packed.groupBy("source")
          .agg((max("last_seq") + 1).as("ns"))
          .agg(sum("ns").as("n_sequences")))
        .crossJoin(inter.agg(count(lit(1)).as("n_interleaved"),
          sum(col("rank_in_source").cast("long")).as("rank_sum")))
    }),

    // PERSISTED OPQ — rotate-then-PQ, the faiss `OPQx,PQy` layout
    // (round-12, composing q164/q165's rotation with q115/q146's PQ
    // into ONE served artifact): the q165 fixture — front-loaded
    // spectrum scrambled by a fixed orthogonal mix, i.e. energy
    // deliberately NOT axis-aligned, the case plain PQ is worst at —
    // is indexed once (rotation stored beside the codebooks), queries
    // rotate through the STORED model at serve time, and the served
    // top-4 must equal exact kNN. The oracle scores in the
    // UNSCRAMBLED space (rotations preserve cosine — the q165
    // isometry trick), so the whole rotate→train→encode→serve chain
    // is certified against plain SQL. Build-once via opqExists.
    "q221_opq_persisted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val fl = emb.select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x * pow(lit(0.8), i)).cast("float")).as("embedding"))
      val d = 64
      val m0 = Array.tabulate(d * d) { kk =>
        val i = kk / d; val j = kk % d
        math.sin(i * 7919.0 + j * 104729.0) +
          math.sin(j * 7919.0 + i * 104729.0)
      }
      val (_, qcols) = SimilaritySearch.jacobiEig(m0, d)
      val qrows = Array.tabulate(d * d)(kk =>
        qcols((kk % d) * d + kk / d))
      val mix = SimilaritySearch.RotationModel(qrows, Array.fill(d)(0.0), d)
      val scrambled = SimilaritySearch.rotate(fl, mix)
        .withColumn("embedding", col("embedding").cast("array<float>"))
        .localCheckpoint(true)
      val key = s"$dir#opq"
      val h = if (graft.sources.AnnIndex.opqExists(s, key))
        graft.sources.AnnIndex.openOpq(s, key)
      else graft.sources.AnnIndex.ensureOpq(s, key, scrambled,
        numSub = 16, ksub = 64, iters = 2)
      val q = scrambled.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      graft.sources.AnnIndex.queryOpq(q, h, k = 4, m = 64)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // UNIGRAM-LM TOKENIZER SEED ARITHMETIC (round-12): the other
    // production tokenizer family (Kudo 2018 / SentencePiece; the
    // reference's OpenAI stack is BPE). Round-0 of the trainer —
    // every substring of length 1..3 of every corpus word, counted
    // per occurrence position and weighted by word frequency, top-40
    // by (count desc, piece asc) — replayed VERBATIM by the DuckDB
    // oracle (one wordcount, two position explodes, one aggregate).
    "q219_unigram_seed" -> ((s, dir) =>
      CorpusOps.unigramSeedCounts(t(s, dir, "documents"),
          maxPieceLen = 3)
        .orderBy(col("cnt").desc, col("piece"))
        .limit(40)
        .select(col("piece"), col("cnt"))),

    // UNIGRAM-LM TRAIN + VITERBI ENCODE invariants (round-12): train
    // a 200-piece vocab (2 hard-EM rounds over the distinct-word
    // frame; corpus touched once — the bpeMergesLocal scale shape),
    // Viterbi-encode the corpus, and pin what SQL can replay exactly:
    // doc and word totals, ZERO roundtrip failures (each word's
    // pieces concatenate back to it), every word at >= 1 token and
    // every token from the shipped vocab (zero coverage violations —
    // chars are never pruned), probs normalized. The EM arithmetic
    // itself is hand-computed in UnigramSpec (the q60-q65 invariant-
    // oracle pattern for non-SQL-expressible internals).
    "q220_unigram_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // train-once/serve-many: the artifact store fingerprints the
      // corpus and reuses the stored vocab (row-identical to the
      // trainer by construction; TokenizerStoreSpec pins it)
      // the fixture dir is immutable content, so it IS a snapshot id:
      // reuse is O(1) — no fingerprint scan (the production pattern)
      val vocab = graft.sources.TokenizerStore.ensureUnigramVocab(s,
        s"$dir#uni200", docs, vocabSize = 200, maxPieceLen = 3,
        emRounds = 2, seedSize = 800, snapshotId = Some(dir))
        .localCheckpoint(true)
      val enc = CorpusOps.unigramEncodeTokens(docs, vocab,
        maxPieceLen = 3).localCheckpoint(true)
      // coverage: every corpus char must be a shipped piece
      val missingChars = CorpusOps.unigramSeedCounts(docs,
          maxPieceLen = 1)
        .join(vocab.select("piece"), Seq("piece"), "left_anti")
      enc.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(when(!col("rt_ok"), 1L).otherwise(0L)), lit(0L))
            .as("n_rt_fail"),
          sum("n_words").as("n_words_total"),
          coalesce(sum(when(col("n_tokens") < col("n_words"), 1L)
            .otherwise(0L)), lit(0L)).as("n_tokens_lt_words"))
        .crossJoin(missingChars.agg(count(lit(1)).as("n_missing_chars")))
        .crossJoin(vocab.agg(
          (count(lit(1)) <= 200).as("vocab_bounded"),
          (abs(sum("prob") - 1.0) < 1e-6).as("prob_sum_ok")))
    }),

    // ALL-PAIRS kNN GRAPH via NN-Descent (round-12, Dong et al. WWW'11):
    // every document's k=8 nearest peers by embedding cosine, built in
    // 4 bounded neighbor-of-my-neighbor rounds — never an n² self-join.
    // Recall is certified on a SAMPLED source slice (every 5th doc):
    // the exact side is a queries-side brute force (n_sample × n, the
    // sampled side broadcast) because that is the only exact baseline
    // that exists at 100 TB — the ANN literature's standard protocol,
    // and the q103-class discipline here. Floor 0.90; measured 0.995 /
    // 0.995 / 0.945 at the three scales (KnnTune, rounds=4;
    // deterministic — no RNG anywhere, so the number is exact per
    // fixture, not a distribution). Runs on EMBEDDED DOCUMENT TEXT: the random-noise
    // embeddings fixture is the measured pathological case (within-
    // label cosine ≡ across-label, so there are no neighborhoods for
    // descent to exploit — the paper's high-dimension collapse), while
    // document embeddings carry real token-overlap structure, which is
    // the operator's actual use (semantic dedup, graph-ANN build).
    "q226_knn_descent" -> ((s, dir) => {
      import graft.operators.KnnGraph
      // repartition BEFORE embedding: the small parquet reads as one
      // split, which would serialize the embed pass and every
      // downstream vector join on a single task
      val emb = t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id").as("vec_id"),
          graft.rag.Embedder.embedCol(col("text")).as("embedding"))
        .localCheckpoint(true)
      val k = 8
      val sampled = emb.filter(col("vec_id") % 5 === 0)
      val exact = KnnGraph.exactGraph(emb, k, sources = Some(sampled))
        .select("src", "dst").localCheckpoint(true)
      val approx = KnnGraph.nnDescent(emb, k, rounds = 4, blockSize = 50,
        maxDegreeOpt = Some(24)).select("src", "dst")
        .join(sampled.select(col("vec_id").as("src")), Seq("src"),
          "left_semi")
      emb.agg(count(lit(1)).as("n_docs"))
        .crossJoin(exact.agg(countDistinct("src").as("n_sampled"),
          count(lit(1)).as("n_exact")))
        .crossJoin(exact.join(approx, Seq("src", "dst"), "left_semi")
          .agg(count(lit(1)).as("hits")))
        .select(col("n_docs"), col("n_sampled"), col("n_exact"),
          (col("hits") >= col("n_exact") * 0.90).as("recall_ok"))
    }),

    // GRAPH-ANN SERVING (round-12): beam search over the kNN graph —
    // the HNSW/Vamana search idea as `rounds` bounded joins (LSH entry
    // seeds → expand the beam's UNDIRECTED out-neighbors → rescore →
    // keep best beam; per-query volume capped at beam·k per round).
    // HELD-OUT protocol: query docs are EXCLUDED from the index — a
    // corpus-member query is degenerate (its own node seeds via LSH
    // and its exact out-edges are the answer; measured recall 1.0 at
    // every point, i.e. no measurement). At (beam=32, rounds=3) on the
    // undirected graph: 1.0 / 1.0 / 0.9913 at the three scales
    // (KnnTune search mode; the directed graph plateaus at 0.8875 —
    // the recorded local-minima result). Floor 0.95. The exact k=8
    // graph is built in-query as the demo twin (production builds it
    // offline — q226's operator — and serves many queries from it).
    "q230_graph_search" -> ((s, dir) => {
      import graft.operators.KnnGraph
      val emb = t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id").as("vec_id"),
          graft.rag.Embedder.embedCol(col("text")).as("embedding"))
        .localCheckpoint(true)
      val q = emb.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val idx = emb.filter(col("vec_id") % 25 =!= 0)
      val graph = KnnGraph.exactGraph(idx, 8).select("src", "dst")
      // agg-form exact baseline (bounded map-side top-k — documented and
      // oracle-pinned output-identical to the window form): the held-out
      // protocol scores ~200 queries x ~4800 index rows here, and the
      // window form shuffled and sorted every scored pair (guide 2.3)
      val exact = SimilaritySearch.bruteForceTopKAgg(q, idx, k = 4)
        .select("query_id", "vec_id").localCheckpoint(true)
      val served = KnnGraph.graphSearch(q, idx, graph, k = 4,
        beam = 32, rounds = 3).select("query_id", "vec_id")
      exact.agg(countDistinct("query_id").as("n_queries"),
          count(lit(1)).as("n_exact"))
        .crossJoin(exact.join(served, Seq("query_id", "vec_id"),
          "left_semi").agg(count(lit(1)).as("hits")))
        .select(col("n_queries"), col("n_exact"),
          (col("hits") >= col("n_exact") * 0.95).as("recall_ok"))
    }),

    // PERSISTED GRAPH INDEX (round-12): the kNN graph promoted to a
    // served ANN layout with the full store lifecycle (GraphIndex —
    // meta-after-data, fingerprint/snapshot freshness, bucketed
    // edges+vecs through the catalog). Build-once/serve-many: the
    // NN-Descent graph is built on the FIRST run (ensureGraph) and
    // every later run attaches by snapshot id in O(1). Same held-out
    // protocol and 0.95 floor as q230; the end-to-end (approximate
    // build + beam search) recall measured 1.0 / 1.0 / 0.9875 at the
    // three scales (KnnTune nnsearch mode).
    "q231_graph_persisted" -> ((s, dir) => {
      import graft.operators.KnnGraph
      import graft.sources.GraphIndex
      val emb = t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id").as("vec_id"),
          graft.rag.Embedder.embedCol(col("text")).as("embedding"))
        .localCheckpoint(true)
      val q = emb.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val idx = emb.filter(col("vec_id") % 25 =!= 0)
      // serve through the handle ensureGraph already returns — the old
      // queryGraph call re-opened the layout it had just ensured
      // (refreshTable + servable probes, paid twice per run)
      val h231 = GraphIndex.ensureGraph(s, s"$dir#graph", idx, k = 8,
        rounds = 4, blockSize = 50, maxDegree = 24, snapshotId = Some(dir))
      val served = KnnGraph.graphSearch(q, h231.vecs, h231.edges, k = 4,
          beam = 32, rounds = 3, assumeUndirected = true)
        .select("query_id", "vec_id")
      // agg-form exact baseline (bounded map-side top-k — documented and
      // oracle-pinned output-identical to the window form): the held-out
      // protocol scores ~200 queries x ~4800 index rows here, and the
      // window form shuffled and sorted every scored pair (guide 2.3)
      val exact = SimilaritySearch.bruteForceTopKAgg(q, idx, k = 4)
        .select("query_id", "vec_id").localCheckpoint(true)
      exact.agg(countDistinct("query_id").as("n_queries"),
          count(lit(1)).as("n_exact"))
        .crossJoin(exact.join(served, Seq("query_id", "vec_id"),
          "left_semi").agg(count(lit(1)).as("hits")))
        .select(col("n_queries"), col("n_exact"),
          (col("hits") >= col("n_exact") * 0.95).as("recall_ok"))
    }),

    // GRAPH-INDEX INCREMENTAL INSERT (round-12): the HNSW-insert idea —
    // a new node's edges are DISCOVERED BY SEARCHING the current graph,
    // appended undirected, O(new · search) per batch instead of a
    // rebuild's O(index). Build on 75% of the corpus, upsert the rest
    // (batchId=1), REPLAY the same batch (must no-op: served vec count
    // replayed by the oracle proves no double-append), then the q231
    // recall floor over the FULL corpus — if upserted nodes were
    // unreachable, their ~25% share of the true top-4 would sink
    // recall through the floor, so the floor itself is the
    // reachability proof.
    "q232_graph_upsert" -> ((s, dir) => {
      import graft.sources.GraphIndex
      val key = s"$dir#graph_upsert"
      val emb = t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id").as("vec_id"),
          graft.rag.Embedder.embedCol(col("text")).as("embedding"))
        .localCheckpoint(true)
      val q = emb.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val idx = emb.filter(col("vec_id") % 25 =!= 0)
      if (!GraphIndex.graphExists(s, key) ||
          !GraphIndex.graphMeta(s, key).get("last_batch_id")
            .exists(_ >= 1L)) {
        GraphIndex.ensureGraph(s, key, idx.filter(col("vec_id") % 4 =!= 1),
          k = 8, rounds = 4, blockSize = 50, maxDegree = 24)
        val tail = idx.filter(col("vec_id") % 4 === 1)
        GraphIndex.upsertGraph(s, key, tail, batchId = Some(1L))
        GraphIndex.upsertGraph(s, key, tail, batchId = Some(1L)) // replay
      }
      // one openGraph for both the served walk and the panel's
      // n_vecs_served — the old queryGraph call re-opened the layout
      // (refreshTable + servable probes) beside the open above
      val h = GraphIndex.openGraph(s, key)
      val served = graft.operators.KnnGraph.graphSearch(q, h.vecs,
          h.edges, k = 4, beam = 32, rounds = 3, assumeUndirected = true)
        .select("query_id", "vec_id")
      // agg-form exact baseline (bounded map-side top-k — documented and
      // oracle-pinned output-identical to the window form): the held-out
      // protocol scores ~200 queries x ~4800 index rows here, and the
      // window form shuffled and sorted every scored pair (guide 2.3)
      val exact = SimilaritySearch.bruteForceTopKAgg(q, idx, k = 4)
        .select("query_id", "vec_id").localCheckpoint(true)
      exact.agg(countDistinct("query_id").as("n_queries"),
          count(lit(1)).as("n_exact"))
        .crossJoin(h.vecs.agg(count(lit(1)).as("n_vecs_served")))
        .crossJoin(exact.join(served, Seq("query_id", "vec_id"),
          "left_semi").agg(count(lit(1)).as("hits")))
        .select(col("n_queries"), col("n_exact"), col("n_vecs_served"),
          (col("hits") >= col("n_exact") * 0.95).as("recall_ok"))
    }),

    // GRAPH-INDEX DELETE (round-12): tombstoned nodes neither serve
    // nor route (deleteGraph — the anti-join covers results AND both
    // edge endpoints). Victims' own pre-delete vectors are the probes
    // MOST likely to retrieve them (pre-delete each self-matches at
    // rank 1): zero victims served. Survivors' recall floor re-proves
    // the graph absorbed ~5% node loss (light-deletion contract;
    // heavy deletion is the documented rebuild case). Idempotent:
    // replayed deletes fold away, so tomb_rows is stable and the
    // oracle can replay the victim count.
    "q233_graph_delete" -> ((s, dir) => {
      import graft.sources.GraphIndex
      val key = s"$dir#graph_del"
      val emb = t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id").as("vec_id"),
          graft.rag.Embedder.embedCol(col("text")).as("embedding"))
        .localCheckpoint(true)
      val q = emb.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val idx = emb.filter(col("vec_id") % 25 =!= 0)
      val victims = idx.filter(col("vec_id") % 20 === 3)
        .localCheckpoint(true)
      val nVictims = victims.count()
      if (!GraphIndex.graphExists(s, key) ||
          !GraphIndex.graphMeta(s, key).get("tomb_rows")
            .contains(nVictims)) {
        GraphIndex.ensureGraph(s, key, idx, k = 8, rounds = 4,
          blockSize = 50, maxDegree = 24)
        GraphIndex.deleteGraph(s, key, victims)
        GraphIndex.deleteGraph(s, key, victims) // replay — no-op
      }
      val survivors = idx.join(victims.select("vec_id"), Seq("vec_id"),
        "left_anti")
      val victimProbes = victims.select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"))
      // one openGraph serves BOTH walks (victim probes + held-out
      // queries) — the per-call queryGraph re-opened the layout twice
      // (refreshTable + servable probes each time)
      val h233 = GraphIndex.openGraph(s, key)
      val victimServed = graft.operators.KnnGraph.graphSearch(
          victimProbes, h233.vecs, h233.edges, k = 4, beam = 32,
          rounds = 3, assumeUndirected = true)
        .join(victims.select(col("vec_id")), Seq("vec_id"), "left_semi")
      val served = graft.operators.KnnGraph.graphSearch(q, h233.vecs,
          h233.edges, k = 4, beam = 32, rounds = 3,
          assumeUndirected = true)
        .select("query_id", "vec_id")
      // agg-form exact baseline over the survivors (see q230's note)
      val exact = SimilaritySearch.bruteForceTopKAgg(q, survivors, k = 4)
        .select("query_id", "vec_id").localCheckpoint(true)
      victims.agg(count(lit(1)).as("n_victims"))
        .crossJoin(victimServed.agg(count(lit(1)).as("n_victims_served")))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
        .crossJoin(exact.join(served, Seq("query_id", "vec_id"),
          "left_semi").agg(count(lit(1)).as("hits")))
        .select(col("n_victims"), col("n_victims_served"), col("n_exact"),
          (col("hits") >= col("n_exact") * 0.95).as("recall_ok"))
    }),

    // DOCUMENT CENTRALITY for corpus curation (round-12): PageRank
    // over the mutual-kNN cosine graph — the "pick the most
    // representative documents" selection signal (graph centrality on
    // semantic neighborhoods; public technique). Composes two already-
    // oracled pieces (q227's exact mutual-kNN graph, q131's damped
    // dangling-redistributing PageRank) and the oracle replays the
    // WHOLE chain relationally: n² cosine ranking, mutuality join,
    // and all 10 iterations as a materialized CTE ladder.
    "q234_doc_centrality" -> ((s, dir) => {
      import graft.operators.KnnGraph
      val emb = t(s, dir, "embeddings")
      val mutual = KnnGraph.mutualEdges(
        KnnGraph.exactGraph(emb, k = 6), minScore = 0.25)
      val e = mutual.select(col("doc_id_a").as("src"),
          col("doc_id_b").as("dst"), lit(1.0).as("w"))
        .unionByName(mutual.select(col("doc_id_b").as("src"),
          col("doc_id_a").as("dst"), lit(1.0).as("w")))
      val nodes = emb.select(col("vec_id").as("node"))
      graft.operators.GraphRank.pageRank(e, nodes, iters = 10)
        .select(col("node").as("doc_id"), round(col("r"), 6).as("rank"))
    }),

    // ROCCHIO PSEUDO-RELEVANCE FEEDBACK (round-12, Rocchio 1971): the
    // classic PRF query expansion — fetch top-8, move the query toward
    // their centroid (q' = q + 0.5·mean), retrieve top-4 with the
    // expanded query. Queries are embeddings-fixture rows, so the
    // ENTIRE two-pass computation (first kNN, per-dimension centroid,
    // vector arithmetic, second kNN) is replayed relationally by
    // DuckDB — the full-replay standard, not an invariant panel. The
    // beta=0 reduction law (ranks identical to plain exact kNN — a
    // positive scalar on the query cannot reorder cosine) is pinned in
    // OperatorsSpec.
    "q235_rocchio_prf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      SimilaritySearch.rocchioTopK(q, emb, k = 4, fetchK = 8,
        alpha = 1.0, beta = 0.5)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // MUTUAL-kNN CLUSTERING, fully DuckDB-replayed (round-12): the
    // exact k=6 cosine kNN graph over the embeddings fixture,
    // sparsified to canonical mutual edges at score >= 0.25, then
    // connected components — the standard kNN-graph consumer chain
    // (graph → mutual sparsifier → Dedup.clustersAlternating). The
    // oracle recomputes EVERYTHING non-circularly: the n² cosine
    // ranking (window over the cross join — q69 pinned that the double
    // kernel matches DuckDB bit-for-bit), the mutuality self-join, and
    // the recursive-CTE reachability (the q80 discipline).
    "q227_mutual_knn_cc" -> ((s, dir) => {
      import graft.operators.KnnGraph
      val emb = t(s, dir, "embeddings")
      val g = KnnGraph.exactGraph(emb, k = 6)
      val mutual = KnnGraph.mutualEdges(g, minScore = 0.25)
        .select("doc_id_a", "doc_id_b")
      Dedup.clustersAlternating(mutual).select("doc_id", "cluster_id")
    }),

    // LATE-INTERACTION (ColBERT MaxSim) retrieval invariants (round-12,
    // Khattab & Zaharia SIGIR'20): the retrieval queries tokenized to
    // word vectors, documents as their chunk-embedding SETS, score =
    // Σ_token max_chunk cosine. The q65 invariant panel (k hits, dense
    // ranks, monotone scores, chunk count replayed by the recursive-
    // chunker CTE) plus the REDUCTION law that pins the scoring
    // algebra: for single-token queries MaxSim collapses to max-chunk-
    // cosine doc ranking, which is computed here from the engine's own
    // primitives (per-doc max over chunk cosines → top-k) — zero
    // symmetric difference, every fixture scale.
    "q228_maxsim" -> ((s, dir) => {
      import graft.operators.LateInteraction
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200).localCheckpoint(true)
      val qt = LateInteraction.queryTokens(retrievalQueryDf(s))
        .localCheckpoint(true)
      val hits = LateInteraction.maxSimTopK(qt, index, k = 4)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy("rank")
      val panel = hits
        .withColumn("prev_score", lag(col("score"), 1).over(w))
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_hits"),
          (min("rank") === 1 && max("rank") === 4 &&
            countDistinct("rank") === 4).as("ranks_ok"),
          min(coalesce(col("score") <= col("prev_score"), lit(true)))
            .as("scores_monotonic"))
      // single-token reduction: qpos=0 slice of each query vs the
      // composed max-chunk-cosine ranking of the same one-word queries
      val qt1 = qt.filter(col("qpos") === 0)
      val single = LateInteraction.maxSimTopK(qt1, index, k = 4)
        .select("query_id", "rank", "doc_id")
      val qn = broadcast(qt1.select(col("query_id"), col("qvec"),
        graft.functions.VectorOps.l2Norm(col("qvec")).as("qnrm")))
      val composed = index
        .select(col("doc_id"), col("embedding"),
          graft.functions.VectorOps.l2Norm(col("embedding")).as("dnrm"))
        .crossJoin(qn)
        .withColumn("cos",
          when(col("dnrm") * col("qnrm") === 0.0, lit(0.0))
            .otherwise(graft.functions.VectorOps
              .dot(col("embedding"), col("qvec"))
              / (col("dnrm") * col("qnrm"))))
        .groupBy("query_id", "doc_id").agg(max("cos").as("score"))
        .groupBy("query_id")
        .agg(graft.functions.expressions.TopKAgg
          .top_k(col("score"), col("doc_id"), 4).as("topk"))
        .select(col("query_id"),
          posexplode(col("topk")).as(Seq("pos", "hit")))
        .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
          col("hit.id").as("doc_id"))
      panel
        .crossJoin(index.agg(countDistinct("chunk_id")
          .as("n_index_chunks")))
        .crossJoin(single.exceptAll(composed)
          .unionByName(composed.exceptAll(single))
          .agg(count(lit(1)).as("n_diff_single")))
        .select(col("query_id"), col("n_hits"), col("ranks_ok"),
          col("scores_monotonic"), col("n_index_chunks"),
          col("n_diff_single"))
    }),

    // MaxSim SERVING composition (round-12): the two-stage ColBERT
    // architecture — mean-pooled single-vector fetch (VectorMeanAgg ×
    // bounded TopKAgg) then exact MaxSim over ONLY the fetched
    // candidates' chunks — must be output-identical to the full-scan
    // MaxSim at the shipped fetch depth. MaxSimTune measured the
    // required depth (max first-stage rank of any full-scan winner) at
    // 31 / 96 / 128 across the three scales; 192 is the 1.5×-margin
    // operating point (the q103-class recall-1.0 discipline: certify a
    // new depth the same way before serving it). The depth is honest
    // evidence that mean-pooling is a LOSSY proxy — exactly why the
    // exact-MaxSim second stage exists.
    "q229_maxsim_rerank" -> ((s, dir) => {
      import graft.operators.LateInteraction
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200).localCheckpoint(true)
      val qt = LateInteraction.queryTokens(retrievalQueryDf(s))
        .localCheckpoint(true)
      def key(df: DataFrame) = df.select("query_id", "rank", "doc_id")
      val full = key(LateInteraction.maxSimTopK(qt, index, k = 4))
      val cand = LateInteraction.meanPoolCandidates(qt, index, fetchK = 192)
      val served = key(LateInteraction.maxSimRerank(qt, index, cand, k = 4))
      full.agg(count(lit(1)).as("n_full"),
          countDistinct("query_id").as("n_queries"))
        .crossJoin(served.exceptAll(full).unionByName(full.exceptAll(served))
          .agg(count(lit(1)).as("n_diff")))
    }),

    // BATCH QUARANTINE ROUTING under the oracle gate (round-11,
    // completing the contract-gate family): route() splits events on
    // the value cap — trusted main, quarantined violations (never
    // dropped), one audit row — with every count replayed by the
    // oracle. The same routing definition the streaming gate runs per
    // micro-batch (they share DataContract.route).
    "q215_contract_route" -> ((s, dir) => {
      val routed = graft.operators.DataContract.route(
        t(s, dir, "events"), col("value") <= 10.0)
      routed.audit
        .crossJoin(routed.main.agg(count(lit(1)).as("n_main")))
        .crossJoin(routed.quarantine
          .agg(count(lit(1)).as("n_quarantine")))
        .crossJoin(routed.main.agg(
          coalesce(sum((!coalesce(col("value") <= 10.0, lit(false)))
            .cast("long")), lit(0L)).as("n_violations_in_main")))
    }),

    // FUSED contract panel under the oracle gate (round-11): three
    // row-predicate checks over lineitem computed in ONE aggregate
    // pass (panelFused — the Deequ scan-sharing shape; the one-scan
    // plan is pinned in OperatorsSpec), every count replayed.
    "q216_contract_fused" -> ((s, dir) =>
      graft.operators.DataContract.panelFused("lineitem",
        t(s, dir, "lineitem"), Seq(
          "f1_quantity_low" -> (col("l_quantity") >= 1),
          "f2_quantity_cap" -> (col("l_quantity") <= 10),
          "f3_positive_price" -> (col("l_extendedprice") > 0)))
        .orderBy("check_name")),

    // PERSISTED SCD2 DIMENSION STORE (round-11): the events feed split
    // into three time-ordered CDC batches and MERGEd incrementally
    // into the on-disk dimension (Scd2Store: key-bucket-partitioned
    // layout, only touched buckets rewritten per batch, meta-after-
    // data, batchId replay-skip) — the store equals fromChanges over
    // the concatenated feed EXACTLY, so q199's oracle replays it. The
    // build-once discipline (q141): later runs replay-skip all three
    // batch ids and serve the committed layout, so run 2 IS the replay
    // certification. Epoch-micros outputs (house timestamp rule).
    "q208_scd2_store" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("user_id") % 5 === 0)
        .select("user_id", "ts", "event_type")
      val key = s"$dir#scd2store"
      val bounds = ev.agg(unix_micros(min("ts")).as("lo"),
        unix_micros(max("ts")).as("hi")).head
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val (c1, c2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
      val us = unix_micros(col("ts"))
      graft.sources.Scd2Store.merge(s, key, ev.filter(us < c1),
        "user_id", "ts", Seq("event_type"), batchId = 1L)
      graft.sources.Scd2Store.merge(s, key,
        ev.filter(us >= c1 && us < c2),
        "user_id", "ts", Seq("event_type"), batchId = 2L)
      val dim = graft.sources.Scd2Store.merge(s, key, ev.filter(us >= c2),
        "user_id", "ts", Seq("event_type"), batchId = 3L)
      dim.select(col("user_id"), col("event_type"),
          unix_micros(col("valid_from")).as("valid_from_us"),
          unix_micros(col("valid_to")).as("valid_to_us"),
          col("is_current"))
        .orderBy("user_id", "valid_from_us", "event_type")
    }),

    // PRUNED POINT-IN-TIME LOOKUP from the persisted SCD2 store
    // (round-11): a bounded probe set (users % 25) reads ONLY its
    // key-buckets — the probes' kb set becomes a partition filter on
    // the dimension scan (Scd2StoreSpec pins the pruned plan), so a
    // point lookup prices at O(touched buckets), not O(dimension).
    // Same interval-join semantics as q206, replayed by the oracle;
    // the store builds once (batchId replay-skip on later runs).
    "q212_scd2_store_lookup" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("user_id") % 5 === 0)
        .select("user_id", "ts", "event_type")
      val key = s"$dir#scd2pit"
      graft.sources.Scd2Store.merge(s, key, ev, "user_id", "ts",
        Seq("event_type"), batchId = 1L)
      val probes = t(s, dir, "events")
        .filter(col("user_id") % 25 === 0 &&
          col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.sources.Scd2Store.lookupPruned(s, key, probes, "user_id",
          "ts")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("event_type").as("tier"),
          unix_micros(col("valid_from")).as("valid_from_us"))
        .orderBy("user_id", "event_id")
    }),

    // LEAKAGE-FREE SPLIT (round-11): train/val/test assignment keyed
    // on the near-dup CLUSTER representative (exact n-gram Jaccard
    // pairs → alternating-CC closure → rep's md5-52bit bucket mod 10:
    // <8 train, =8 val, =9 test) — near-duplicates can never straddle
    // a split boundary, the contamination guard a naive per-row hash
    // split lacks. Integer arithmetic end-to-end; the oracle replays
    // pairs, recursive-CTE closure, the hex parse, and the bucketing.
    "q211_leakage_free_split" -> ((s, dir) => {
      // fanOut: the q53 rationale (CPU-bound pair generation on a
      // single-split scan; id-keyed deterministic output)
      val pairs = Dedup.ngramJaccard(fanOut(t(s, dir, "documents")),
          k = 3, threshold = 0.12)
        .select("doc_id_a", "doc_id_b")
      CorpusOps.leakageFreeSplit(
          t(s, dir, "documents").select("doc_id"), "doc_id", pairs,
          seed = 77L)
        .orderBy("doc_id")
    }),

    // DATA-CONTRACT AUDIT (round-10): the expectations gate a 100 TB
    // ingest runs before anything downstream trusts the batch — key
    // uniqueness, not-null, referential integrity (one anti-join count
    // each), range and cross-table rules (one aggregate each), unioned
    // into the verdict panel. The events value-cap check FAILS with a
    // real violation share at every scale (live teeth — an audit whose
    // checks all pass proves only that it ran).
    "q200_data_contract" -> ((s, dir) => {
      import graft.operators.DataContract._
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val docs = t(s, dir, "documents")
      val events = t(s, dir, "events")
      val shipJoin = li.select("l_orderkey", "l_shipdate")
        .join(orders.select(col("o_orderkey").as("l_orderkey"),
          col("o_orderdate")), Seq("l_orderkey"))
      panel(Seq(
        unique("c01_customer_key_unique", "customer", customer,
          "c_custkey"),
        notNull("c02_orders_custkey_notnull", "orders", orders,
          "o_custkey"),
        refIntegrity("c03_orders_customer_fk", "orders", orders,
          "o_custkey", customer, "c_custkey"),
        refIntegrity("c04_lineitem_orders_fk", "lineitem", li,
          "l_orderkey", orders, "o_orderkey"),
        expect("c05_totalprice_positive", "orders", orders,
          col("o_totalprice") > 0),
        expect("c06_quantity_in_range", "lineitem", li,
          col("l_quantity") >= 1 && col("l_quantity") <= 50),
        expect("c07_ship_after_order", "lineitem_orders", shipJoin,
          col("l_shipdate") >= col("o_orderdate")),
        unique("c08_doc_id_unique", "documents", docs, "doc_id"),
        expect("c09_event_value_cap", "events", events,
          col("value") <= 10)))
    }),

    // LAST-TOUCH REVENUE ATTRIBUTION (round-10): each purchase's value
    // attributed to the user's most recent click at-or-before it — the
    // marketing-attribution shape, composed from the AS-OF join (q20's
    // operator: ONE key shuffle + window, never a per-pair range join)
    // plus an exact integer-cents rollup per user. Purchases with no
    // preceding click stay honestly unattributed.
    "q201_attribution" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
      graft.operators.AsOfJoin.asOf(purchases, clicks,
          "user_id", "user_id", "ts", "click_ts",
          rightVals = Seq("click_ts", "click_id"),
          rightTiebreak = "click_id")
        .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_purchases"),
          count(col("click_ts")).as("n_attributed"),
          sum(when(col("click_ts").isNotNull, col("cents"))
            .otherwise(lit(0L))).as("attributed_cents"),
          sum(when(col("click_ts").isNull, col("cents"))
            .otherwise(lit(0L))).as("unattributed_cents"))
        .orderBy("user_id")
    }),

    // DATASET MANIFEST (round-10): the provenance record every
    // produced snapshot gets stamped with — per table one
    // order-independent content checksum (sum of engine-portable
    // md5-52bit row hashes over a float-free canonical encoding, exact
    // in DECIMAL(38,0)) plus the row count. A training run pins THIS
    // frame next to its artifacts; any later bit drift in any input
    // table changes exactly one visible cell.
    "q202_dataset_manifest" -> ((s, dir) => {
      import graft.operators.Lineage
      Lineage.manifest(Seq(
        ("customer", t(s, dir, "customer"),
          concat_ws(":", col("c_custkey"), col("c_name"))),
        ("documents", t(s, dir, "documents"),
          concat_ws(":", col("doc_id"), col("text"))),
        ("events", t(s, dir, "events"),
          concat_ws(":", col("event_id"), col("event_type"))),
        ("lineitem", t(s, dir, "lineitem"),
          concat_ws(":", col("l_orderkey"), col("l_linenumber"),
            floor(col("l_quantity")).cast("long"))),
        ("orders", t(s, dir, "orders"),
          concat_ws(":", col("o_orderkey"), col("o_orderstatus"),
            col("o_orderdate").cast("string")))))
    }),

    // Exact equi-depth histogram of order revenue: boundaries at exact
    // global ranks ceil(i·N/16) under the (price, key) total order —
    // computed the distributed way (range repartition + per-partition
    // offsets, never a single-task window) and replayed by the oracle
    // with row_number(). The stats object range predicates price
    // against (equi-width lies under skew; this can't).
    "q185_equidepth_hist" -> ((s, dir) =>
      graft.operators.Histogram.equiDepth(t(s, dir, "orders"),
        "o_totalprice", "o_orderkey", buckets = 16)
        .orderBy("bucket")),

    // ...and the selectivity panel it exists for: 12 seeded `price <=
    // x` predicates estimated by per-bucket linear interpolation
    // (integer micro-row contributions — no float-sum order anywhere),
    // with exact counts and relative error as the honesty columns.
    "q186_range_selectivity" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val hist = graft.operators.Histogram.equiDepth(orders,
        "o_totalprice", "o_orderkey", buckets = 16)
      val mnmx = orders.agg(min(col("o_totalprice")).as("mn"),
        max(col("o_totalprice")).as("mx"))
      val preds = s.range(12).toDF("pred_id")
        .crossJoin(broadcast(mnmx))
        .select(col("pred_id"),
          (col("mn") + (col("pred_id") * 37 % 64)
            * (col("mx") - col("mn")) / 64.0).as("x"))
      val est = graft.operators.Histogram.rangeSelectivity(hist, preds)
      val actual = orders.crossJoin(broadcast(preds))
        .groupBy("pred_id")
        .agg(count(when(col("o_totalprice") <= col("x"), 1))
          .as("actual_rows"))
      est.join(actual, Seq("pred_id"))
        .select(col("pred_id"), round(col("x"), 6).as("x"),
          col("est_micro"), col("est_rows"), col("actual_rows"),
          round(abs(col("est_micro") / 1e6 - col("actual_rows"))
            / greatest(col("actual_rows"), lit(1L)), 6).as("rel_err"))
        .orderBy("pred_id")
    }),

    // CBO join planning from sketch stats: for three star-schema
    // joins, the classic cardinality estimate |A ⋈ B| = |A|·|B| /
    // max(ndv_A, ndv_B) with NDVs from the KMV sketch (two
    // column-pruned stats aggregates per join — the corpus-priced
    // question answered at metadata cost), the exact join size as the
    // honesty panel, and the broadcast-vs-shuffle decision the
    // estimate drives. THE reason an engine carries stats at all.
    "q183_join_planner" -> ((s, dir) => {
      def side(tbl: String, key: String, suffix: String) =
        t(s, dir, tbl).agg(
          count(lit(1)).as(s"rows_$suffix"),
          Sketches.estimate(graft.functions.expressions.KmvAgg.kmv(
            Sketches.hash52(col(key).cast("string"), 29L), 128), 128)
            .as(s"ndv_$suffix"))
      def plan(name: String, ta: String, ka: String, tb: String,
          kb: String) = {
        val exact = t(s, dir, ta).select(col(ka).as("k"))
          .join(t(s, dir, tb).select(col(kb).as("k")), Seq("k"))
          .agg(count(lit(1)).as("exact_rows"))
        side(ta, ka, "a").crossJoin(side(tb, kb, "b"))
          .crossJoin(exact)
          .select(lit(name).as("join_name"),
            col("rows_a"), col("rows_b"),
            round(col("ndv_a"), 6).as("ndv_a"),
            round(col("ndv_b"), 6).as("ndv_b"),
            round(col("rows_a") * col("rows_b")
              / greatest(col("ndv_a"), col("ndv_b")), 6).as("est_rows"),
            col("exact_rows"),
            round(abs(col("rows_a") * col("rows_b")
              / greatest(col("ndv_a"), col("ndv_b"))
              - col("exact_rows")) / col("exact_rows"), 6).as("rel_err"),
            when(least(col("rows_a"), col("rows_b")) < 50000,
              lit("broadcast")).otherwise(lit("shuffle")).as("decision"))
      }
      plan("customer_orders", "customer", "c_custkey",
          "orders", "o_custkey")
        .unionByName(plan("orders_lineitem", "orders", "o_orderkey",
          "lineitem", "l_orderkey"))
        .unionByName(plan("part_lineitem", "part", "p_partkey",
          "lineitem", "l_partkey"))
        .orderBy("join_name")
    }),

    // CDC snapshot diff: v2 = orders under a deterministic mutation
    // (keys mod 97 deleted, totalprice bumped on mod 13, mod-101 rows
    // re-inserted under offset keys) — the change feed an incremental
    // pipeline reads instead of reprocessing the table. orders because
    // o_orderkey is a REAL unique key (the fixture's (l_orderkey,
    // l_linenumber) is not, and diff refuses non-unique keys loudly).
    // Spark compares 8-byte row fingerprints; the oracle replays the
    // SEMANTICS (any-column IS DISTINCT FROM), so a hash that conflated
    // a real change would hash-mismatch here.
    "q182_snapshot_diff" -> ((s, dir) => {
      val v1 = t(s, dir, "orders")
      val v2 = v1.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .unionByName(v1.filter(col("o_orderkey") % 101 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
      SnapshotDiff.diff(v1, v2, Seq("o_orderkey"))
        .filter(col("op") =!= "unchanged")
        .orderBy("o_orderkey")
    }),

    // Incremental view maintenance: a per-orderstatus (count, revenue
    // cents) view maintained from the SIGNED change feed alone — the
    // unchanged bulk is never re-aggregated, and the mutation includes
    // GROUP-MIGRATING updates (mod-31 orders flip their status to 'Z',
    // so -old and +new land in different groups — the IVM case naive
    // delta code gets wrong). The oracle recomputes the view DIRECTLY
    // from v2: incremental must equal recompute digit for digit.
    // Revenue sums as floor(price·100 + 0.5) BIGINT cents — exact, no
    // order-dependent float summation.
    "q184_incremental_agg" -> ((s, dir) => {
      val cents = (c: org.apache.spark.sql.Column) =>
        floor(c * 100 + 0.5).cast("long")
      val v1 = t(s, dir, "orders")
      val v2 = v1.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 31 === 0, lit("Z"))
            .otherwise(col("o_orderstatus")))
        .unionByName(v1.filter(col("o_orderkey") % 101 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
      val base = v1.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("b_rows"),
          sum(cents(col("o_totalprice"))).as("b_cents"))
      val deltas = SnapshotDiff.changeRows(v1, v2, Seq("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(sum(col("sign")).as("d_rows"),
          sum(col("sign") * cents(col("o_totalprice"))).as("d_cents"))
      base.join(deltas, Seq("o_orderstatus"), "full_outer")
        .na.fill(0L, Seq("b_rows", "b_cents", "d_rows", "d_cents"))
        .select(col("o_orderstatus"),
          (col("b_rows") + col("d_rows")).as("n_rows"),
          (col("b_cents") + col("d_cents")).as("sum_cents"),
          col("d_rows"), col("d_cents"))
        .filter(col("n_rows") > 0)
        .orderBy("o_orderstatus")
    }),

    // Time-decayed event mass (the trending/freshness score): the
    // corpus collapses ONCE to (event_type, age_days) cells, then any
    // decay schedule is arithmetic on cells — here half-life-ish
    // 0.9^day and 0.5^(day/7) as exact integer micro-unit weights
    // (only |days| distinct pow() evals, each floor'd at 1e-6 — no
    // order-dependent float summation anywhere), plus the share panel.
    // Changing lambda or the horizon NEVER rescans the corpus.
    "q181_decayed_counts" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"))
      val mx = ev.agg(max(col("d")).as("mxd"))
      val cells = ev.crossJoin(broadcast(mx))
        .groupBy(col("event_type"),
          datediff(col("mxd"), col("d")).as("age"))
        .agg(count(lit(1)).as("cnt"))
      val w = cells
        .withColumn("w09",
          floor(pow(lit(0.9), col("age")) * 1e6).cast("long"))
        .withColumn("w05",
          floor(pow(lit(0.5), col("age") / lit(7.0)) * 1e6).cast("long"))
      val agg = w.groupBy("event_type").agg(
        sum(col("cnt")).as("n_events"),
        sum(col("cnt") * col("w09")).as("decayed_09_micro"),
        sum(col("cnt") * col("w05")).as("decayed_w05_micro"))
      val tot = agg.agg(sum(col("decayed_09_micro")).as("t09"))
      agg.crossJoin(broadcast(tot))
        .select(col("event_type"), col("n_events"),
          col("decayed_09_micro"), col("decayed_w05_micro"),
          round(col("decayed_09_micro").cast("double") / col("t09"), 6)
            .as("share_09"))
        .orderBy("event_type")
    }),

    // Incremental distinct tracking through the PERSISTED sketch
    // store: three deterministic ingest batches (doc_id mod 3), then
    // the merged read — the oracle computes each sketch DIRECTLY from
    // the full corpus, so batched ingest must be invisible digit for
    // digit. Re-runs replay committed batch ids (verified no-ops); the
    // bench's min-of-3 exercises that path by design.
    "q180_kmv_store" -> ((s, dir) => {
      val key = dir + "#kmvstore_v1"
      val toks = t(s, dir, "documents").select(col("doc_id"),
        col("source"),
        explode(HashExpressions.shingles_k_positional(
          filter(split(col("text"), " "), x => x =!= lit("")), 3))
          .as("gram"))
      for (bid <- 0L to 2L)
        graft.sources.SketchStore.update(s, key,
          toks.filter(col("doc_id") % 3 === bid), "source",
          col("gram"), batchId = bid + 1, k = 128, seed = 11L)
      graft.sources.SketchStore.read(s, key)
        .select(col("grp").as("source"),
          size(col("kmv")).as("sk_size"),
          when(size(col("kmv")) > 0,
            element_at(col("kmv"), size(col("kmv")))).as("h_max"),
          round(Sketches.estimate(col("kmv"), 128), 6)
            .as("est_distinct"))
        .orderBy("source")
    }),

    // Theta-sketch A-not-B novelty: each source's marginal distinct-
    // 3-gram contribution vs the REST of the corpus (the source-
    // acquisition question), priced on k-row sketch frames — the exact
    // panel is the per-source corpus anti-join the sketch replaces.
    "q179_kmv_novelty" -> ((s, dir) => {
      val toks = t(s, dir, "documents").select(col("source"),
        explode(HashExpressions.shingles_k_positional(
          filter(split(col("text"), " "), x => x =!= lit("")), 5))
          .as("gram"))
      val nov = Sketches.kmvNovelty(toks, "source", col("gram"), 128, 11L)
      val sg = toks.select("source", "gram").distinct()
      val exact = sg.groupBy("gram")
        .agg(count(lit(1)).as("ns"), min("source").as("source"))
        .where(col("ns") === 1)
        .groupBy("source").agg(count(lit(1)).as("novel_exact"))
      nov.join(exact, Seq("source"), "left")
        .na.fill(0L, Seq("novel_exact"))
        .select(col("source"), col("novel_in_k"),
          round(col("novel_est"), 6).as("novel_est"), col("novel_exact"))
        .orderBy("source")
    }),

    // Count-Min point frequencies with the NEVER-undercounts
    // certificate: a d=4 × w=64 sketch whose exchange is bounded by
    // d·w cells per task regardless of corpus size, probed for the 20
    // heaviest tokens; ge_ok pins est >= exact row by row, overshoot
    // measures the collision mass (the e/w closeness bound is over
    // hash draws — reported, not certified).
    "q177_cms_freq" -> ((s, dir) => {
      val toks = t(s, dir, "documents").select(lit("all").as("grp"),
        explode(filter(split(col("text"), " "), x => x =!= lit("")))
          .as("tok"))
      val cms = CountMin.cmsByGroup(toks, "grp", col("tok"), 4, 64, 19L)
      val exact = toks.groupBy("grp", "tok")
        .agg(count(lit(1)).as("exact_cnt"))
      val top = exact.orderBy(desc("exact_cnt"), asc("tok")).limit(20)
      val total = toks.agg(count(lit(1)).as("n_total"))
      val est = CountMin.pointEstimates(cms,
        top.select("grp", "tok"), "tok", 4, 64, 19L)
      top.join(est, Seq("grp", "tok")).crossJoin(broadcast(total))
        .select(col("tok"), col("exact_cnt"), col("est").as("est_cnt"),
          (col("est") >= col("exact_cnt")).as("ge_ok"),
          round((col("est") - col("exact_cnt")).cast("double")
            / col("n_total"), 6).as("overshoot"))
        .orderBy("tok")
    }),

    // CMS inner products as equi-join size estimates (the optimizer's
    // cardinality question: |A join B on token|) for all 190 source
    // pairs — computed on G·d·w cell frames, never re-touching the
    // corpus; exact panel joins vocabulary-scale count frames. w=16 is
    // DELIBERATELY narrow against the fixture's 31-word vocabulary so
    // collisions are real and ge_ok certifies a live overestimate, not
    // a vacuous equality.
    "q178_cms_join_size" -> ((s, dir) => {
      val toks = t(s, dir, "documents").select(col("source").as("grp"),
        explode(filter(split(col("text"), " "), x => x =!= lit("")))
          .as("tok"))
      val cms = CountMin.cmsByGroup(toks, "grp", col("tok"), 4, 16, 23L)
      val tc = toks.groupBy("grp", "tok").agg(count(lit(1)).as("c"))
      val exact = tc.select(col("grp").as("grp_a"), col("tok"),
          col("c").as("ca"))
        .join(tc.select(col("grp").as("grp_b"), col("tok"),
          col("c").as("cb")), Seq("tok"))
        .where(col("grp_a") < col("grp_b"))
        .groupBy("grp_a", "grp_b")
        .agg(sum(col("ca") * col("cb")).as("exact_join"))
      CountMin.joinSizeEstimates(cms).join(exact, Seq("grp_a", "grp_b"))
        .select(col("grp_a"), col("grp_b"), col("est_join"),
          col("exact_join"),
          (col("est_join") >= col("exact_join")).as("ge_ok"),
          round((col("est_join") - col("exact_join")).cast("double")
            / col("exact_join"), 6).as("rel_overshoot"))
        .orderBy("grp_a", "grp_b")
    }),

    // Z-order (Morton) clustering vs a 1-D sort, judged by zone maps:
    // per-bucket min/max boxes + box_frac (bounding-box area as a
    // domain fraction). Interleaved buckets are compact rectangles;
    // xsort buckets are full-height stripes — the layout decision a
    // 100 TB table makes before writing files.
    "q175_zorder_zonemaps" -> ((s, dir) =>
      ZOrder.zoneMaps(t(s, dir, "lineitem"), "l_partkey", "l_suppkey",
        bits = 8, nBuckets = 32)
        .orderBy("layout", "bucket")),

    // ...and the MEASURED pruning panel: 20 seeded box predicates ×
    // both layouts — buckets touched, rows a zone-map-guided scan
    // reads, true hits, scan amplification. The rect×zonemap join is
    // metadata-scale; data is touched once for the honesty column.
    "q176_zonemap_pruning" -> ((s, dir) =>
      ZOrder.pruningPanel(t(s, dir, "lineitem"), "l_partkey",
        "l_suppkey", bits = 8, nBuckets = 32, nRects = 20)
        .orderBy("rect_id", "layout")),

    // ACTUAL BPE token sequences + the decode round trip (q106 emits
    // counts; packing/export/decode consume SEQUENCES): per doc the
    // ordered symbol stream under the learned 12-merge chain, and the
    // round-trip flag (symbols concatenate back to every word — decode
    // is concatenation by construction). The oracle replays training,
    // encoding, the sequence assembly AND the round trip in SQL.
    // Training rides bpeMergesLocal (the q153 discipline — the merge
    // list is a 12-row driver artifact either way, and the local
    // trainer is row-identical to bpeMerges(B=1) per q110/OperatorsSpec
    // parity at ~1/20th the driver-synchronized rounds).
    "q169_bpe_tokens" -> ((s, dir) => {
      val merges = CorpusOps.bpeMergesLocal(t(s, dir, "documents"),
          numMerges = 12)
        .orderBy("step").select("lhs", "rhs").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      CorpusOps.bpeEncodeTokens(t(s, dir, "documents"), merges)
        .orderBy("doc_id")
    }),

    // Composed IVF-BQ ANN certification (the q121 discipline for the
    // binary family): on the 1536-dim md5-jitter fixture, probe 4 of 8
    // inverted lists and Hamming-scan ONLY their 1-bit codes (probed-
    // row pruning × 32× fewer bytes per row — 8× past IVF-SQ8), then
    // exact-re-rank m=256. The panel pins (a) output IDENTITY to the
    // float IVF path at the same probes (the binary layer is output-
    // lossless at this point) and (b) a recall floor vs exact kNN
    // (inherited from IVF's probe recall, not degraded by BQ).
    "q168_ivfbq_composed" -> ((s, dir) => {
      import graft.functions.expressions.VectorExpressions.tile_jitter
      val emb = t(s, dir, "embeddings")
      val tiled = emb.select(col("vec_id"),
        tile_jitter(col("vec_id"), col("embedding"), reps = 24,
          sigma = 2.0).as("embedding"))
        .localCheckpoint(false)
      val q = tiled.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val cents = SimilaritySearch.kMeansCentroids(tiled, k = 8, iters = 2)
        .localCheckpoint(false)
      val fl = SimilaritySearch.ivfTopK(q, tiled, cents, k = 4, nProbe = 4)
        .select("query_id", "rank", "vec_id")
      val bq = SimilaritySearch.ivfBqTopK(q, tiled, cents, k = 4,
          nProbe = 4, m = 256)
        .select("query_id", "rank", "vec_id")
      val exact = SimilaritySearch.bruteForceTopKAgg(q, tiled, k = 4)
        .select("query_id", "vec_id")
      val nBq = bq.agg(count(lit(1)).as("n_bq"))
      val nDiff = bq.exceptAll(fl).unionByName(fl.exceptAll(bq))
        .agg(count(lit(1)).as("n_diff_float"))
      val recOk = bq.join(exact, Seq("query_id", "vec_id"), "left_semi")
        .agg((count(lit(1)).cast("double") / lit(32.0) >= 0.4)
          .as("recall_ok"))
      nBq.crossJoin(nDiff).crossJoin(recOk)
    }),

    // INCREMENTAL line dedup against the persisted line-df store (the
    // q161 operator streamed batch by batch — the production Dolma
    // shape): batch 1 (even doc_ids) cuts on its own df; batch 2 cuts
    // on batch-1-accumulated + own df. First-arrival leniency is the
    // pinned semantics: a line that crosses maxDf only in batch 2
    // survives in batch 1's (already emitted) output and is cut from
    // batch 2's — the oracle replays both batches' df arithmetic and
    // every rewritten text. Re-runs hit the store's replay path and
    // reconstruct identical output (the bench's min-of-3 exercises it).
    "q167_line_dedup_store" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      val body = transform(
        sequence(lit(0), floor((size(toks) - 1) / 8.0).cast("int")),
        i => concat_ws(" ", slice(toks, i * 8 + 1, lit(8))))
      val aug = t(s, dir, "documents").withColumn("text",
        concat_ws("\n", concat(
          array(concat(lit("== site banner :: "), col("source"),
            lit(" =="))),
          body)))
      val key = dir + "#lines_v1"
      val k1 = graft.sources.DedupStore.lineDedupBatch(s, key,
        aug.filter(col("doc_id") % 2 === 0), batchId = 1L, maxDf = 4)
      val k2 = graft.sources.DedupStore.lineDedupBatch(s, key,
        aug.filter(col("doc_id") % 2 === 1), batchId = 2L, maxDf = 4)
      k1.unionByName(k2)
        .withColumn("batch", (col("doc_id") % 2 + 1).cast("int"))
        .select("batch", "doc_id", "text", "n_lines", "n_cut")
        .orderBy("doc_id")
    }),

    // Poisson-bootstrap 95% CI for the q128 eval harness's recall@5:
    // 200 replicates, each re-weighting every query by a Poisson(1)
    // draw from the engine-portable md5 uniform — weights, replicate
    // estimates, nearest-rank selection all replayed digit for digit.
    // The number an eval report should carry instead of a bare mean:
    // on tens of queries the interval is WIDE, and shipping it makes
    // that fact unhideable.
    "q166_bootstrap_ci" -> ((s, dir) => {
      val q = retrievalQueryDf(s)
      val docs = t(s, dir, "documents")
      val run = KeywordSearch.bm25TopK(q, docs, k = 5)
        .select("query_id", "rank", "doc_id")
      val qt = q.select(col("query_id"),
        explode(array_distinct(KeywordSearch.tokens(col("query_text"))))
          .as("tok"))
      val dt = docs.select(col("doc_id"),
        explode(array_distinct(KeywordSearch.tokens(col("text"))))
          .as("tok"))
      val qrels = qt.join(dt, Seq("tok"))
        .groupBy("query_id", "doc_id").agg(count(lit(1)).as("rel"))
        .filter(col("rel") >= 2)
      val per = Evaluation.rankingMetrics(run, qrels, k = 5)
      Evaluation.bootstrapCI(per, "recall_at_k", b = 200, seed = 7L)
    }),

    // The OPQ recovery closure: give the corpus a front-loaded 0.8^i
    // spectrum, HIDE it behind a fixed orthogonal mix (the eigenbasis
    // of a deterministic sin-matrix — axis-aligned energy gone), fit
    // rotationModel on the scrambled corpus alone, and serve a d=8
    // TRUNCATED search in the recovered basis. Oracle = plain exact
    // kNN over the UNMIXED front-loaded vectors: hash-matching proves
    // (a) the recovered rotation re-concentrates 97% of energy into 8
    // axes (else the d=8 shortlist loses neighbors) and (b) the whole
    // mix→recover chain is an exact isometry (6-decimal cosines
    // identical). `AnnTune rot` records the spectrum + frontier; the
    // flat fixture is the measured negative control (nothing to
    // recover — rotation earns nothing there, and the scaladoc says
    // so).
    "q165_opq_recovery" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val fl = emb.select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x * pow(lit(0.8), i)).cast("float")).as("embedding"))
      val d = 64
      val m0 = Array.tabulate(d * d) { kk =>
        val i = kk / d; val j = kk % d
        math.sin(i * 7919.0 + j * 104729.0) +
          math.sin(j * 7919.0 + i * 104729.0)
      }
      val (_, qcols) = SimilaritySearch.jacobiEig(m0, d)
      val qrows = Array.tabulate(d * d)(kk =>
        qcols((kk % d) * d + kk / d))
      val mix = SimilaritySearch.RotationModel(qrows, Array.fill(d)(0.0), d)
      val scrambled = SimilaritySearch.rotate(fl, mix).localCheckpoint(false)
      val rec = SimilaritySearch.rotationModel(scrambled)
      val unscr = SimilaritySearch.rotate(scrambled, rec)
        .localCheckpoint(false)
      val q = unscr.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      SimilaritySearch.truncatedTopK(q, unscr, k = 4, d = 8, m = 32)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // Calibration audit of the language-ID classifier: its Laplace-
    // smoothed confidence (hits+1)/(total+|langs|) binned into 10
    // reliability buckets against the fixture's true lang labels, plus
    // the Expected Calibration Error — the eval that tells you whether
    // a score is a PROBABILITY or just a ranking before anyone
    // thresholds on it. Full SQL replay (marker hits, argmax, smoothing,
    // binning, ECE) at all three scales.
    "q163_langid_calibration" -> ((s, dir) => {
      val scored = TextAnalysis.languageIdWithConf(t(s, dir, "documents"))
        .withColumn("correct", col("predicted_lang") === col("lang"))
      Evaluation.calibration(scored, "lang_conf", "correct", bins = 10)
        .select(col("bin"), col("n"),
          round(col("conf"), 6).as("conf"),
          round(col("acc"), 6).as("acc"),
          round(col("ece"), 6).as("ece"))
        .orderBy("bin")
    }),

    // Ordered FUNNEL (first-match semantics, 7-day conversion window
    // anchored at funnel entry): view -> click -> purchase per user —
    // the product-analytics staple over the events log. One user-keyed
    // min aggregate per step; monotone counts by construction.
    "q157_funnel" -> ((s, dir) =>
      Funnel.funnelCounts(t(s, dir, "events"),
        Seq("view", "click", "purchase"), within = Some("7 DAYS"))),

    // Weekly COHORT RETENTION: cohort = ISO week of first event;
    // each (cohort, week_offset) cell counts distinct active users.
    "q158_retention" -> ((s, dir) =>
      Funnel.retentionCohorts(t(s, dir, "events"))
        // the compare layer renders date32 as midnight timestamps —
        // ship the cohort key as its ISO string
        .withColumn("cohort_week",
          date_format(col("cohort_week"), "yyyy-MM-dd"))
        .orderBy("cohort_week", "week_offset")),

    // Per-source TOKEN-BUDGET admission (quota ingest): admit each
    // source's maximal doc_id-ordered prefix whose token total stays
    // ≤ 2000 — the batch form of the streaming quota (rejected docs
    // advance the total too: a crossed budget CLOSES the source).
    // Streaming twin parity is StreamOpsSpec-pinned; here the whole
    // cumulative rule replays in SQL.
    "q156_budget_admit" -> ((s, dir) =>
      CorpusOps.budgetAdmit(t(s, dir, "documents"), "source", "doc_id",
          budget = 2000L)
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"),
          sum(when(col("admitted"), col("n_tok")).otherwise(0L))
            .as("admitted_tok"))),

    // HARD-NEGATIVE mining (the DPR recipe): BM25 top-20 minus the
    // token-overlap relevance set (q128's qrels), renumbered — the
    // strongest non-relevant candidates, i.e. the negatives contrastive
    // retriever training actually needs. Run + qrels + anti + renumber
    // all replay in SQL.
    "q155_hard_negatives" -> ((s, dir) => {
      val q = retrievalQueryDf(s)
      val docs = t(s, dir, "documents")
      val run = KeywordSearch.bm25TopK(q, docs, k = 20)
      val qt = q.select(col("query_id"),
        explode(array_distinct(KeywordSearch.tokens(col("query_text"))))
          .as("tok"))
      val dt = docs.select(col("doc_id"),
        explode(array_distinct(KeywordSearch.tokens(col("text"))))
          .as("tok"))
      // rel >= 4 on these 4-token queries = "shares every query token";
      // anything weaker floods qrels on this vocabulary-dense corpus
      // and the whole top-20 reads relevant (no negatives anywhere)
      val qrels = qt.join(dt, Seq("tok"))
        .groupBy("query_id", "doc_id").agg(count(lit(1)).as("rel"))
        .filter(col("rel") >= 4)
      Evaluation.hardNegatives(run, qrels, n = 5)
        .withColumn("score", round(col("score"), 6))
    }),

    // WINNOWING (MOSS) fingerprint overlap: window-min selection over
    // k-gram hashes gives the paper's guarantee (any shared run of
    // ≥ w+k−1 tokens yields a shared fingerprint at ~2/(w+1) density)
    // — the CONTAINMENT-oriented dedup signal MinHash's resemblance
    // estimate misses. df-capped fp self-join → overlap pairs.
    "q154_winnow_pairs" -> ((s, dir) => {
      val fps = Dedup.winnowFingerprints(t(s, dir, "documents"))
      Dedup.winnowPairs(fps).orderBy("doc_id_a", "doc_id_b")
    }),

    // Tokenizer FERTILITY per language (tokens/word under the trained
    // merges — the standard tokenizer-equity metric: a language with
    // high fertility pays more sequence length per content, the signal
    // vocabulary-allocation decisions key on). Trains the q101/q106
    // merge list via the driver-side trainer (row-identical to
    // bpeMerges(B=1) — q110/OperatorsSpec parity — and ~21× faster:
    // ONE vocab aggregate instead of 12 driver-synchronized Spark
    // rounds), encodes the distinct vocabulary once, one stratum-keyed
    // aggregate.
    "q153_tokenizer_fertility" -> ((s, dir) => {
      val merges = CorpusOps.bpeMergesLocal(t(s, dir, "documents"),
          numMerges = 12)
        .orderBy("step").select("lhs", "rhs").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      CorpusOps.tokenizerFertility(t(s, dir, "documents"), merges)
    }),

    // Temperature-scaled mixture (XLM/mBERT alpha-sampling, T = 2):
    // shares ∝ nat_share^(1/T) computed IN-PLAN and fed straight into
    // the mixture planner relation-to-relation — upweights low-resource
    // languages without hand-written shares; the whole two-stage
    // arithmetic replays in SQL.
    "q152_temperature_mixture" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val shares = CorpusOps.temperatureShares(d, "lang",
        temperature = 2.0)
      CorpusOps.mixturePlanFromShares(d, "lang",
        shares.select(col("lang"), col("target_share")))
    }),

    // The QUANTIZED adaptive serving surface (the q145 discipline for
    // the blended retriever): both probe fans served from the persisted
    // SQ8 codes must be OUTPUT-IDENTICAL to the direct adaptive blend
    // AND to the LSH-persisted form at the certified margin, and the
    // alpha = 1 quantized path must degrade to the plain retrieval
    // bit-exactly (the q89 closure, served compressed).
    "q151_adaptive_quantized" -> ((s, dir) => {
      import s.implicits._
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200)
      val q = Seq((1L, 7L, "vector index scan fast"),
        (2L, 8L, "spark join shuffle partition"))
        .toDF("query_id", "user_id", "query_text")
      val hist = Seq((7L, "customer order value table"),
        (8L, "window agg batch row")).toDF("user_id", "question")
      def hitsOf(df: DataFrame) = df.select("query_id", "rank", "chunk_id")
      val exact = hitsOf(RagPipeline.adaptiveRetrieve(q, hist, index,
        k = 4, alpha = 0.3))
      val quantized = hitsOf(RagPipeline.adaptiveRetrieveQuantized(s,
        dir + "!adaptq", q, hist, index, k = 4, alpha = 0.3))
      val persisted = hitsOf(RagPipeline.adaptiveRetrievePersisted(s,
        dir + "!hybrid", q, hist, index, k = 4, alpha = 0.3))
      val plain = hitsOf(RagPipeline.retrieve(
        q.select("query_id", "query_text"), index, k = 4))
      val a1 = hitsOf(RagPipeline.adaptiveRetrieveQuantized(s,
        dir + "!adaptq", q, hist, index, k = 4, alpha = 1.0))
      exact.agg(count(lit(1)).as("n_adaptive"))
        .crossJoin(quantized.exceptAll(exact)
          .unionByName(exact.exceptAll(quantized))
          .agg(count(lit(1)).as("n_diff_direct")))
        .crossJoin(quantized.exceptAll(persisted)
          .unionByName(persisted.exceptAll(quantized))
          .agg(count(lit(1)).as("n_diff_persisted")))
        .crossJoin(a1.exceptAll(plain).unionByName(plain.exceptAll(a1))
          .agg(count(lit(1)).as("n_diff_alpha1")))
    }),

    // MMR diversified retrieval (LangChain `search_type="mmr"`, the
    // reference stack's documented diversity mode) — invariant closure:
    // rank-1 ≡ the exact relevance top-1 per query, every selection
    // drawn from the fetch-20 candidate set, and the selected set's
    // mean pairwise cosine (redundancy) no worse than plain top-k's.
    // The greedy selection itself is pinned by a hand-computed
    // ScalaTest (OperatorsSpec).
    "q117_mmr_invariants" -> ((s, dir) => {
      import graft.functions.VectorOps
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val mmr = SimilaritySearch.mmrTopK(q, emb, k = 4, fetchK = 20,
        lambda = 0.5)
      val exact = SimilaritySearch.bruteForceTopK(q, emb, k = 4)
      val fetched = SimilaritySearch.bruteForceTopK(q, emb, k = 20)
        .select("query_id", "vec_id")
      def redundancy(sel: DataFrame): DataFrame = {
        val withV = sel.select("query_id", "vec_id")
          .join(emb.select("vec_id", "embedding"), Seq("vec_id"))
        withV.select(col("query_id"), col("vec_id").as("id_a"),
            col("embedding").as("emb_a"))
          .join(withV.select(col("query_id"), col("vec_id").as("id_b"),
            col("embedding").as("emb_b")), Seq("query_id"))
          .filter(col("id_a") < col("id_b"))
          .agg(avg(VectorOps.cosine(col("emb_a"), col("emb_b"))).as("red"))
      }
      mmr.agg(countDistinct("query_id").as("n_queries"),
          count(lit(1)).as("n_rows"))
        .crossJoin(mmr.filter(col("rank") === 1)
          .join(exact.filter(col("rank") === 1), Seq("query_id", "vec_id"),
            "left_anti")
          .agg(count(lit(1)).as("top1_misses")))
        .crossJoin(mmr.join(fetched, Seq("query_id", "vec_id"), "left_anti")
          .agg(count(lit(1)).as("n_outside")))
        .crossJoin(redundancy(mmr).select(col("red").as("mmr_red")))
        .crossJoin(redundancy(exact).select(col("red").as("exact_red")))
        .select(col("n_queries"), col("n_rows"), col("top1_misses"),
          col("n_outside"),
          (col("mmr_red") <= col("exact_red") + 1e-12).as("diversity_ok"))
    }),

    // Score-threshold retrieval (LangChain `similarity_score_threshold`)
    // — top-10 filtered to cosine ≥ 0.32; a query keeps its pre-filter
    // ranks and may return fewer than 10 rows. Fully SQL-expressible.
    "q118_threshold_retrieval" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      SimilaritySearch.thresholdTopK(q, emb, k = 10, minScore = 0.32)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // Deterministic global shuffle — the export-time decorrelation pass
    // (position = rank of md5(doc_id ":" seed)): no global-sort funnel,
    // range-partitioned order + per-partition numbering + broadcast
    // prefix offsets. The oracle replays the identical permutation.
    "q119_global_shuffle" -> ((s, dir) =>
      CorpusOps.globalShuffle(t(s, dir, "documents")
          .select("doc_id", "n_chars"), "doc_id", seed = 42L)
        .select("doc_id", "n_chars", "shuffle_pos")),

    // The 100 TB-shaped BPE trainer (counts formulation): ONE
    // distributed wordcount pass, then every merge learned driver-side
    // with incremental pair-count updates — zero per-merge Spark jobs
    // (vs q101's one round per merge), row-identical to the exact
    // greedy distributed path by construction. Same replay oracle as
    // q101 proves the identity end-to-end.
    "q110_bpe_local" -> ((s, dir) =>
      CorpusOps.bpeMergesLocal(t(s, dir, "documents"), numMerges = 12)),

    // n-gram LM quality scoring (the CCNet perplexity filter): train an
    // interpolated add-α bigram LM on the corpus, score every doc by
    // per-token cross-entropy. The DuckDB oracle retrains the identical
    // LM and rescores relationally.
    "q104_lm_score" -> ((s, dir) =>
      TextAnalysis.lmScore(t(s, dir, "documents"))),

    // BPE ENCODING: apply the 12 learned merges (q101's training run)
    // back to the corpus — per-doc token counts + realized compression.
    // The merge list is the trained model artifact (12 rows, driver-
    // held); encoding runs over the distinct-word vocabulary and joins
    // back, so repeated words are encoded once. Training rides
    // bpeMergesLocal (q153 discipline; row-identical to bpeMerges(B=1)
    // per q110/OperatorsSpec parity — q101 keeps the distributed
    // trainer, its oracle replays the 12 rounds themselves).
    "q106_bpe_encode" -> ((s, dir) => {
      val merges = CorpusOps.bpeMergesLocal(t(s, dir, "documents"),
          numMerges = 12)
        .orderBy("step").select("lhs", "rhs").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      CorpusOps.bpeEncode(t(s, dir, "documents"), merges)
    }),

    // PERSISTED SQ8 serving: the quantized codes live bucketed on disk
    // (built once per fixture, attach-by-DDL in a fresh process), the
    // query scans codes-only + re-ranks the m winners against the
    // co-bucketed float table. Same exact-kNN oracle as q103 — the
    // persisted path is output-identical too.
    "q105_sq8_persisted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val h = graft.sources.AnnIndex.ensureSq8(s, dir,
        emb.select("vec_id", "embedding"))
      graft.sources.AnnIndex.querySq8(q, h, k = 4, m = 32)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // Pinecone-style DELETE on the persisted SQ8 index (the lifecycle
    // verb next to q105's build and the upsert family): build a fresh
    // layout under its own key, tombstone the 8 query vectors
    // themselves — the strongest possible visibility, every rank-1
    // self-hit disappears — and query through the tombstone-filtered
    // handle. The oracle is the exact kNN restricted to the surviving
    // ids (vec_id >= 8); hash-matching it proves merge-on-read delete
    // semantics end-to-end at the certified m=32 margin. Re-runs are
    // deterministic: ensureSq8 treats a tombstoned layout as stale
    // ("serve exactly this source"), rebuilding before re-deleting.
    "q116_sq8_delete" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val key = s"$dir#sq8del"
      graft.sources.AnnIndex.ensureSq8(s, key, emb.select("vec_id", "embedding"))
      val h = graft.sources.AnnIndex.deleteSq8(s, key,
        emb.filter(col("vec_id") < 8).select("vec_id"))
      graft.sources.AnnIndex.querySq8(q, h, k = 4, m = 32)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // DELETE on the composed IVF-SQ8 serving layout — the verb the
    // 100 TB layouts were missing (round-8 gap #3): build a fresh
    // layout under its own key, tombstone the 8 query vectors
    // (centroid-co-keyed merge-on-read), query through the filtered
    // handle. The IVF probe is approximate, so the closure is the
    // q109 invariant adapted to deletion: (a) ZERO symmetric
    // difference vs the FLOAT persisted IVF at the same operating
    // point with its lists restricted to the survivors (same
    // deterministic centroids — both train on the identical source);
    // (b) zero tombstoned ids in the output; (c) recall@4 vs the
    // exact kNN over survivors clears the q68 floor.
    "q141_ivfsq8_delete" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      // build-once / serve-many (the persisted-fixture discipline): a
      // tombstoned layout deliberately fails ensure's freshness, so a
      // per-run ensure would retrain k-means every run — branch on the
      // op-point exists check and let the batchId replay-skip make the
      // delete idempotent across runs. Bump the key suffix if the
      // operating point here ever changes.
      val key = s"$dir#ivfsq8del"
      if (!graft.sources.AnnIndex.ivfSq8Exists(s, key, lists = 64,
          iters = 5))
        graft.sources.AnnIndex.ensureIvfSq8(s, key,
          emb.select("vec_id", "embedding"), lists = 64, iters = 5)
      val h = graft.sources.AnnIndex.deleteIvfSq8(s, key,
        emb.filter(col("vec_id") < 8).select("vec_id"),
        batchId = Some(1L))
      val composed = graft.sources.AnnIndex
        .queryIvfSq8(q, h, k = 4, nProbe = 24, m = 32)
        .select("query_id", "rank", "vec_id")
      val ivfH = graft.sources.AnnIndex.ensureIvf(s, dir,
        emb.select("vec_id", "embedding"), lists = 64, iters = 5)
      val ivf = graft.sources.AnnIndex.queryIvf(q,
          graft.sources.AnnIndex.IvfHandle(ivfH.centroids,
            ivfH.lists.filter(col("vec_id") >= 8)),
          k = 4, nProbe = 24)
        .select("query_id", "rank", "vec_id")
      val exact = SimilaritySearch.bruteForceTopK(q,
          emb.filter(col("vec_id") >= 8).select("vec_id", "embedding"),
          k = 4)
        .select("query_id", "vec_id")
      composed.agg(count(lit(1)).as("n_composed"))
        .crossJoin(composed.exceptAll(ivf)
          .unionByName(ivf.exceptAll(composed))
          .agg(count(lit(1)).as("n_diff_ivf")))
        .crossJoin(composed.filter(col("vec_id") < 8)
          .agg(count(lit(1)).as("n_deleted_hits")))
        .crossJoin(exact.agg(count(lit(1)).as("ne"))
          .crossJoin(exact
            .join(composed.select("query_id", "vec_id"),
              Seq("query_id", "vec_id"), "left_semi")
            .agg(count(lit(1)).as("hits")))
          .select((col("hits") >= col("ne") * 0.84).as("recall_floor_ok")))
    }),

    // DELETE on the composed IVF-PQ serving layout — q141's PQ twin,
    // same invariant closure at the q123 operating point (m=64).
    "q142_ivfpq_delete" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      // build-once / serve-many via the op-point exists branch + the
      // batchId replay-skip (the q141 note) — a per-run ensure would
      // retrain centroids AND the PQ codebook every run
      val key = s"$dir#ivfpqdel"
      if (!graft.sources.AnnIndex.ivfPqExists(s, key, lists = 64,
          iters = 5))
        graft.sources.AnnIndex.ensureIvfPq(s, key,
          emb.select("vec_id", "embedding"), lists = 64, iters = 5)
      val h = graft.sources.AnnIndex.deleteIvfPq(s, key,
        emb.filter(col("vec_id") < 8).select("vec_id"),
        batchId = Some(1L))
      // m = 128: within the survivor-restricted candidate set the ADC
      // #4/#5 boundary tightens (measured: m=64 leaves a 2-row diff at
      // sf0.1) — the margin is rerank-side only, the ADC scan cost is
      // unchanged
      val composed = graft.sources.AnnIndex
        .queryIvfPq(q, h, k = 4, nProbe = 24, m = 128)
        .select("query_id", "rank", "vec_id")
      val ivfH = graft.sources.AnnIndex.ensureIvf(s, dir,
        emb.select("vec_id", "embedding"), lists = 64, iters = 5)
      val ivf = graft.sources.AnnIndex.queryIvf(q,
          graft.sources.AnnIndex.IvfHandle(ivfH.centroids,
            ivfH.lists.filter(col("vec_id") >= 8)),
          k = 4, nProbe = 24)
        .select("query_id", "rank", "vec_id")
      val exact = SimilaritySearch.bruteForceTopK(q,
          emb.filter(col("vec_id") >= 8).select("vec_id", "embedding"),
          k = 4)
        .select("query_id", "vec_id")
      composed.agg(count(lit(1)).as("n_composed"))
        .crossJoin(composed.exceptAll(ivf)
          .unionByName(ivf.exceptAll(composed))
          .agg(count(lit(1)).as("n_diff_ivf")))
        .crossJoin(composed.filter(col("vec_id") < 8)
          .agg(count(lit(1)).as("n_deleted_hits")))
        .crossJoin(exact.agg(count(lit(1)).as("ne"))
          .crossJoin(exact
            .join(composed.select("query_id", "vec_id"),
              Seq("query_id", "vec_id"), "left_semi")
            .agg(count(lit(1)).as("hits")))
          .select((col("hits") >= col("ne") * 0.84).as("recall_floor_ok")))
    }),

    // Metadata-FILTERED search on the composed IVF-SQ8 layout (the
    // q113/q114 filter shape at the 100 TB serving point — round-8 gap
    // #4): allowed = even-label ids (~50% selectivity), PRE-filter
    // semantics. Closure: zero symmetric difference vs the float
    // persisted IVF over the same filtered lists; every hit inside the
    // filter; recall@4 vs the FILTERED exact kNN clears the floor.
    "q143_ivfsq8_filtered" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val allowed = emb.filter(col("label") % 2 === 0).select("vec_id")
      val h = graft.sources.AnnIndex.ensureIvfSq8(s, dir,
        emb.select("vec_id", "embedding"), lists = 64, iters = 5)
      val composed = graft.sources.AnnIndex
        .queryIvfSq8Filtered(q, h, allowed, k = 4, nProbe = 24, m = 32)
        .select("query_id", "rank", "vec_id")
      val ivfH = graft.sources.AnnIndex.ensureIvf(s, dir,
        emb.select("vec_id", "embedding"), lists = 64, iters = 5)
      val ivf = graft.sources.AnnIndex.queryIvf(q,
          graft.sources.AnnIndex.IvfHandle(ivfH.centroids,
            ivfH.lists.join(allowed, Seq("vec_id"), "left_semi")),
          k = 4, nProbe = 24)
        .select("query_id", "rank", "vec_id")
      val exact = SimilaritySearch.bruteForceTopK(q,
          emb.filter(col("label") % 2 === 0).select("vec_id", "embedding"),
          k = 4)
        .select("query_id", "vec_id")
      composed.agg(count(lit(1)).as("n_composed"))
        .crossJoin(composed.exceptAll(ivf)
          .unionByName(ivf.exceptAll(composed))
          .agg(count(lit(1)).as("n_diff_ivf")))
        .crossJoin(composed.join(allowed, Seq("vec_id"), "left_anti")
          .agg(count(lit(1)).as("n_outside_filter")))
        .crossJoin(exact.agg(count(lit(1)).as("ne"))
          .crossJoin(exact
            .join(composed.select("query_id", "vec_id"),
              Seq("query_id", "vec_id"), "left_semi")
            .agg(count(lit(1)).as("hits")))
          .select((col("hits") >= col("ne") * 0.84).as("recall_floor_ok")))
    }),

    // Metadata-FILTERED search on the composed IVF-PQ layout — q143's
    // PQ twin at the q123 operating point (m=64).
    "q144_ivfpq_filtered" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val allowed = emb.filter(col("label") % 2 === 0).select("vec_id")
      val h = graft.sources.AnnIndex.ensureIvfPq(s, dir,
        emb.select("vec_id", "embedding"), lists = 64, iters = 5)
      val composed = graft.sources.AnnIndex
        // m = 128 — the q142 margin note: the filtered candidate set
        // tightens the ADC boundary (m=64 measured a 2-row diff at
        // sf0.1); rerank-side cost only
        .queryIvfPqFiltered(q, h, allowed, k = 4, nProbe = 24, m = 128)
        .select("query_id", "rank", "vec_id")
      val ivfH = graft.sources.AnnIndex.ensureIvf(s, dir,
        emb.select("vec_id", "embedding"), lists = 64, iters = 5)
      val ivf = graft.sources.AnnIndex.queryIvf(q,
          graft.sources.AnnIndex.IvfHandle(ivfH.centroids,
            ivfH.lists.join(allowed, Seq("vec_id"), "left_semi")),
          k = 4, nProbe = 24)
        .select("query_id", "rank", "vec_id")
      val exact = SimilaritySearch.bruteForceTopK(q,
          emb.filter(col("label") % 2 === 0).select("vec_id", "embedding"),
          k = 4)
        .select("query_id", "vec_id")
      composed.agg(count(lit(1)).as("n_composed"))
        .crossJoin(composed.exceptAll(ivf)
          .unionByName(ivf.exceptAll(composed))
          .agg(count(lit(1)).as("n_diff_ivf")))
        .crossJoin(composed.join(allowed, Seq("vec_id"), "left_anti")
          .agg(count(lit(1)).as("n_outside_filter")))
        .crossJoin(exact.agg(count(lit(1)).as("ne"))
          .crossJoin(exact
            .join(composed.select("query_id", "vec_id"),
              Seq("query_id", "vec_id"), "left_semi")
            .agg(count(lit(1)).as("hits")))
          .select((col("hits") >= col("ne") * 0.84).as("recall_floor_ok")))
    }),

    // COMPOSED IVF-SQ8 serving: int8 codes INSIDE the probed inverted
    // lists (faiss's IVFx,SQ8 layout natively) — probed-row pruning ×
    // 4× fewer bytes per scanned row, the two measured wins multiplied.
    // The IVF probe is approximate by design (q37/q68), so the oracle
    // pins what IS exact: (a) ZERO symmetric difference between the
    // composed path and the FLOAT persisted IVF at the same operating
    // point (64 lists / nProbe=24) — the SQ8 layer inside the probed
    // lists is output-lossless, measured at every fixture scale and at
    // m=16 and 32 (AnnTune ivfsq8); (b) recall@4 vs the exact kNN
    // clears q68's 0.84 IVF floor. Both layouts train the same
    // deterministic k-means, so (a) is an equality, not a floor.
    "q109_ivfsq8_persisted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val ivfH = graft.sources.AnnIndex.ensureIvf(s, dir,
        emb.select("vec_id", "embedding"), lists = 64, iters = 5)
      val ivf = graft.sources.AnnIndex.queryIvf(q, ivfH, k = 4, nProbe = 24)
        .select("query_id", "rank", "vec_id")
      val h = graft.sources.AnnIndex.ensureIvfSq8(s, dir,
        emb.select("vec_id", "embedding"), lists = 64, iters = 5)
      val composed = graft.sources.AnnIndex
        .queryIvfSq8(q, h, k = 4, nProbe = 24, m = 32)
        .select("query_id", "rank", "vec_id")
      val exact = SimilaritySearch.bruteForceTopK(q, emb, k = 4)
        .select("query_id", "vec_id")
      composed.agg(count(lit(1)).as("n_composed"))
        .crossJoin(composed.exceptAll(ivf)
          .unionByName(ivf.exceptAll(composed))
          .agg(count(lit(1)).as("n_diff_ivf")))
        .crossJoin(exact.agg(count(lit(1)).as("ne"))
          .crossJoin(exact
            .join(composed.select("query_id", "vec_id"),
              Seq("query_id", "vec_id"), "left_semi")
            .agg(count(lit(1)).as("hits")))
          .select((col("hits") >= col("ne") * 0.84).as("recall_floor_ok")))
    }),

    // MRL truncated-dim serving, POSITIVELY certified on an earned
    // fixture: component i scaled by 0.8^i (float-rounded — the
    // energy-decaying shape MRL training produces, replayed verbatim by
    // the DuckDB oracle), then first-16-of-64-components coarse ranking
    // + exact full-dim re-rank. Hash-matching the exact kNN over the
    // SAME front-loaded vectors proves output identity at (d=16, m=32)
    // — measured at every fixture scale and with margin (identity holds
    // down to d=8, m=16 at decay 0.8; decay 0.9 at (8,16) is the
    // measured NEGATIVE boundary, AnnTune mrlfl). The untransformed
    // fixture remains the negative control (BASELINE.md): flat spectra
    // earn no identity point, which is exactly the deploy contract
    // truncatedTopK documents.
    "q111_mrl_frontloaded" -> ((s, dir) => {
      val fl = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"),
          (x, i) => (x * pow(lit(0.8), i)).cast("float")).as("embedding"))
      val q = fl.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      SimilaritySearch.truncatedTopK(q, fl, k = 4, d = 16, m = 32)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // The composed bandwidth lever — truncate THEN quantize: int8 codes
    // of the first 16 components only (16/64 · 1/4 = 1/16 of the float
    // scan bytes), exact full-dim re-rank. Same front-loaded oracle —
    // the quantization layer adds no error the candidate margin doesn't
    // absorb, certifying the d/dim · ¼ scan-bytes claim end-to-end.
    "q112_mrl_sq8" -> ((s, dir) => {
      val fl = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"),
          (x, i) => (x * pow(lit(0.8), i)).cast("float")).as("embedding"))
      val q = fl.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      SimilaritySearch.truncatedQuantizedTopK(q, fl, k = 4, d = 16, m = 32)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // Metadata-FILTERED exact kNN — the vector-store `filter=` query
    // (Pinecone metadata filtering, the reference stack's API): top-4
    // cosine among vectors whose label is even (~50% selectivity),
    // PRE-filter semantics (top-k within the filtered set — exact, a
    // full k hits per query, no post-filter recall loss).
    "q113_filtered_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      SimilaritySearch.bruteForceTopK(q,
          emb.filter(col("label") % 2 === 0).select("vec_id", "embedding"),
          k = 4)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // The same filtered query SERVED from the persisted SQ8 index:
    // the allowed-id set (attribute table filtered by the predicate)
    // left-semi restricts the compressed codes scan BEFORE candidate
    // selection, exact re-rank of the m winners — same filtered
    // exact-kNN oracle as q113 proves the filtered quantized path is
    // output-identical (the q103/q105 identity within the filtered
    // set).
    "q114_filtered_sq8" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val h = graft.sources.AnnIndex.ensureSq8(s, dir,
        emb.select("vec_id", "embedding"))
      graft.sources.AnnIndex.querySq8Filtered(q, h,
          emb.filter(col("label") % 2 === 0).select("vec_id"), k = 4, m = 32)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // Domain-mixture reweighting: per-language sampling rates hitting a
    // target token mixture — the largest feasible downsample-only mix
    // (T* = min over langs of tokens/share); one corpus aggregate, all
    // rate arithmetic on the tiny per-lang frame.
    "q96_mixture_plan" -> ((s, dir) =>
      CorpusOps.mixturePlan(t(s, dir, "documents"), "lang",
        Map("en" -> 0.4, "es" -> 0.15, "de" -> 0.15, "fr" -> 0.15,
          "zh" -> 0.15))),

    // Vocabulary induction: top-100 words by corpus frequency
    // (deterministic tie-break) with cumulative token-mass coverage —
    // 1 − cum_frac at rank 100 is the closed-vocab OOV rate. Corpus
    // work = one wordcount aggregate + TakeOrdered; no global sort.
    "q97_vocab_coverage" -> ((s, dir) =>
      CorpusOps.vocabulary(t(s, dir, "documents"), topV = 100)),

    // Lexical retrieval: Okapi BM25 top-5 per retrieval query — the
    // keyword half of hybrid search (inverted-index plan: postings built
    // with one map-side-combinable groupBy, query terms broadcast,
    // candidate-only shuffles, bounded TopKAgg). Fully SQL-oracled.
    "q78_bm25_topk" -> ((s, dir) =>
      KeywordSearch.bm25TopK(retrievalQueryDf(s), t(s, dir, "documents"),
        k = 5)),

    // Hybrid retrieval: reciprocal-rank fusion of two lexical rankers
    // (BM25 + token-set jaccard), both SQL-expressible so the FUSION
    // itself is fully oracled; the BM25+vector composition reuses this
    // exact rrfFuse (RagPipeline.hybridRetrieve, spec-covered — the
    // vector half is hash-embedder-based and thus not SQL-expressible).
    "q79_hybrid_rrf" -> ((s, dir) => {
      val q = retrievalQueryDf(s)
      val docs = t(s, dir, "documents")
      KeywordSearch.rrfFuse(Seq(
        KeywordSearch.bm25TopK(q, docs, k = 10),
        KeywordSearch.tokenJaccardTopK(q, docs, k = 10)), k = 5)
    }),

    // K1/K2 through the PERSISTED postings (the q67 pattern for the
    // lexical index): build-or-reuse by content fingerprint, query the
    // stored table — same oracle as q78 proves the persisted path is
    // output-identical to the direct one.
    "q81_bm25_persisted" -> ((s, dir) => {
      val post = graft.sources.KeywordIndex.ensurePostings(s, dir,
        t(s, dir, "documents"))
      // stats from the STORE (vocabulary-sized df lookup + meta
      // literals) — no full-postings aggregates per call; the same q78
      // oracle hash proves the served stats ≡ the derived ones
      KeywordSearch.bm25TopKFromPostings(retrievalQueryDf(s), post, k = 5,
        stats = graft.sources.KeywordIndex.statsFor(s, dir))
    }),

    // K2 upsert ≡ rebuild, EXACTLY (the q71 pattern, minus the
    // recall-operating-point caveat): postings for 90% of the corpus,
    // the rest upserted; df/avgdl/N derive from the merged postings at
    // query time, so the q78 oracle must hash-match — not approximately,
    // row-identically.
    "q82_bm25_upsert" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val post = graft.sources.KeywordIndex.ensurePostingsUpserted(s,
        dir + "!kwupsert",
        docs.filter(col("doc_id") % 10 =!= 7),
        docs.filter(col("doc_id") % 10 === 7))
      // stats composed across base+upsert (meta sum + df deltas) must
      // hash-match the q78 full-rebuild oracle — upsert ≡ rebuild for
      // the stats too, not just the postings rows
      KeywordSearch.bm25TopKFromPostings(retrievalQueryDf(s), post, k = 5,
        stats = graft.sources.KeywordIndex.statsFor(s, dir + "!kwupsert"))
    }),

    // The FUSION over the persisted postings (verdict r5 #1): identical
    // oracle to q79, but the BM25 half of the executed plan scans the
    // stored graft_kw_postings table (PlanInvariantsSpec pins the scan)
    // instead of re-tokenizing the corpus — proof that the persisted
    // lexical index composes into hybrid retrieval output-identically.
    "q86_hybrid_persisted" -> ((s, dir) => {
      val q = retrievalQueryDf(s)
      val docs = t(s, dir, "documents")
      val post = graft.sources.KeywordIndex.ensurePostings(s, dir, docs)
      KeywordSearch.rrfFuse(Seq(
        KeywordSearch.bm25TopKFromPostings(q, post, k = 10,
          stats = graft.sources.KeywordIndex.statsFor(s, dir)),
        KeywordSearch.tokenJaccardTopK(q, docs, k = 10)), k = 5)
    }),

    // BLOCK-MAX WAND BM25 (round-13, verdict #4): impact-banded
    // postings with per-band max-impact bounds prune the scoring
    // aggregate's input to candidate docs only — at 100 TB the
    // exhaustive path's per-(query,doc) aggregate receives every
    // posting of every query term (Σ_t df_t rows per query; one
    // stopword ≈ the corpus), which the bounded TopKAgg tail cannot
    // cap. Output-IDENTICAL to exhaustive BM25: the same DuckDB
    // oracle as q78 hash-gates the WAND rows directly.
    "q240_bm25_wand" -> ((s, dir) => {
      val key = s"$dir#bmw"
      graft.sources.ImpactIndex.ensureImpacts(s, key,
        t(s, dir, "documents"), snapshotId = Some(dir))
      graft.sources.ImpactIndex.wandTopK(s, key, retrievalQueryDf(s),
        k = 5)
    }),

    // WAND soundness panel (round-13): the two claims the pruning rests
    // on, replayed relationally — (a) θ never exceeds the true k-th
    // best score (the lower-bound property of partial sums; violations
    // would make pruning lossy), (b) the pruned evaluation is
    // row-identical to the exhaustive one. n_exhaustive_pairs (the
    // aggregate input rows the exhaustive path pays) is DuckDB-replayed
    // exactly; the measured candidate-fraction table lives in
    // BASELINE.md (HybridTune wand mode).
    "q241_wand_soundness" -> ((s, dir) => {
      val key = s"$dir#bmw"
      if (!graft.sources.ImpactIndex.impactsExist(s, key))
        graft.sources.ImpactIndex.ensureImpacts(s, key,
          t(s, dir, "documents"), snapshotId = Some(dir))
      val q = retrievalQueryDf(s)
      val fr = graft.sources.ImpactIndex.wandFrames(s, key, q, k = 5,
        p1Bands = 3)
      val full = KeywordSearch.bm25TopK(q, t(s, dir, "documents"), k = 5)
        .localCheckpoint(true)
      def keyd(df: DataFrame) =
        df.select("query_id", "rank", "doc_id", "score")
      val nDiff = keyd(fr.result).exceptAll(keyd(full))
        .unionByName(keyd(full).exceptAll(keyd(fr.result)))
        .agg(count(lit(1)).as("n_diff"))
      // kth_score is the 6-decimal ROUNDED ranking key (rankedTail's
      // output), up to 0.5e-6 below the raw k-th score θ lower-bounds —
      // the tolerance covers exactly that rounding gap
      val kth = full.filter(col("rank") === 5)
        .select(col("query_id"), col("score").as("kth_score"))
      val thetaViol = fr.theta.join(kth, Seq("query_id"))
        .filter(col("theta") > col("kth_score") + 1e-6)
        .agg(count(lit(1)).as("n_theta_violations"))
      fr.qterms.agg(countDistinct("query_id").as("n_queries"),
          sum("df").cast("long").as("n_exhaustive_pairs"))
        .crossJoin(thetaViol)
        .crossJoin(nDiff)
    }),

    // WAND ON A STOPWORD-SKEWED CORPUS (round-14, verdict #5): the
    // fixtures' near-uniform vocabulary gives θ little to cut (q240's
    // measured candidate fraction ~0.75 — BASELINE.md round-13), so
    // the asymptote claim was pinned only by a spec fixture. This
    // query derives a deterministic skewed corpus FROM the documents
    // table (one stopword in every doc, a rare term in doc_id%40==3 —
    // the real-corpus Zipf shape), serves "special common" through
    // the persisted block-max layout, and emits the top-k rows WITH
    // the in-query candidate measurement: the DuckDB oracle replays
    // the exhaustive BM25 ranking AND Σ_t df_t exactly, and
    // pruning_bites pins candidates < half the exhaustive aggregate
    // input — the skew point where WAND's candidate cut matters.
    "q246_wand_skew" -> ((s, dir) => {
      import graft.sources.ImpactIndex
      val skewed = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("common filler w"),
          (col("doc_id") % 7).cast("string"), lit(" w"),
          (col("doc_id") % 13).cast("string"),
          when(col("doc_id") % 40 === 3,
            concat(lit(" special token"), col("doc_id").cast("string")))
            .otherwise(lit(""))).as("text"))
      val key = s"$dir#bmwskew"
      ImpactIndex.ensureImpacts(s, key, skewed, snapshotId = Some(dir))
      val q = s.createDataFrame(Seq((1L, "special common")))
        .toDF("query_id", "query_text")
      val fr = ImpactIndex.wandFrames(s, key, q, k = 5, p1Bands = 3)
      val measured = fr.qterms
        .agg(sum("df").cast("long").as("n_exhaustive_pairs"))
        .crossJoin(fr.candidates.agg(count(lit(1)).as("n_cand")))
        .select(col("n_exhaustive_pairs"),
          (col("n_cand") * 2 < col("n_exhaustive_pairs"))
            .as("pruning_bites"))
      fr.result.select(col("query_id"), col("rank"), col("doc_id"),
          round(col("score"), 6).as("score"))
        .crossJoin(measured)
    }),

    // PERSISTED LATE-INTERACTION LAYOUT (round-13, verdict #6 — the
    // PLAID architecture, CIKM'22): the chunk multi-vector table
    // k-means-clustered and stored PARTITIONED BY centroid, so MaxSim
    // stage 1 scans only the lists the query's tokens probe (DPP
    // prunes the rest) and stage 2 only the partitions holding a
    // candidate's chunks — the byte-heaviest layout in the engine gets
    // its scan win. Output-identical to the q228 full scan at the
    // MaxSimTune-certified point: required mDocs measured 4 / 4 / 4 at
    // the three scales at nProbe=16 → shipped mDocs=16 is a 4× margin
    // (the q237 discipline). Probed fraction measured 0.92/0.95/0.91 —
    // modest on THESE fixtures by construction: the deterministic hash
    // embeddings are near-uniform (the q226 note's pathological case),
    // so clustered pruning has little structure to exploit; real text
    // embeddings concentrate, which is what the layout is for.
    "q242_plaid_maxsim" -> ((s, dir) => {
      import graft.operators.LateInteraction
      import graft.sources.PlaidIndex
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200).localCheckpoint(true)
      val key = s"$dir#plaid"
      PlaidIndex.ensurePlaid(s, key,
        index.select(col("doc_id"), col("chunk_id").as("vec_id"),
          col("embedding")), snapshotId = Some(dir))
      val qt = LateInteraction.queryTokens(retrievalQueryDf(s))
        .localCheckpoint(true)
      def keyd(df: DataFrame) = df.select("query_id", "rank", "doc_id")
      val full = keyd(LateInteraction.maxSimTopK(qt, index, k = 4))
      val served = keyd(PlaidIndex.plaidTopK(s, key, qt, k = 4,
        nProbe = 16, mDocs = 16))
      full.agg(count(lit(1)).as("n_full"),
          countDistinct("query_id").as("n_queries"))
        .crossJoin(served.exceptAll(full).unionByName(full.exceptAll(served))
          .agg(count(lit(1)).as("n_diff")))
    }),

    // QUANTIZED PLAID SERVING (round-14 second wave — the paper's
    // compressed design, engine-style): the clustered lists store SQ8
    // codes BESIDE the float chunk vectors, and the quantized stage 1
    // reads ONLY the probed partitions' int8 columns (parquet columnar
    // projection — ReadSchema excludes `embedding`; PlanInvariantsSpec
    // pins it), so the engine's two measured scan cuts MULTIPLY on its
    // byte-heaviest table: probed directories × ~4× fewer bytes per
    // row. Stage 2 is the same exact float rerank over the candidates'
    // partitions. Output-identical to the q228 full scan at the
    // measured (nProbe, mDocs) margin — MaxSimTune `plaidq` measures
    // required mDocs 4/4/4 at nProbe=16 across the scales, same as the
    // float stage (int8 rounding never reorders past the margin);
    // shipped mDocs=16 keeps the 4× cushion (the q237/q242 discipline).
    "q247_plaidq_maxsim" -> ((s, dir) => {
      import graft.operators.LateInteraction
      import graft.sources.PlaidIndex
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200).localCheckpoint(true)
      val key = s"$dir#plaid"
      PlaidIndex.ensurePlaid(s, key,
        index.select(col("doc_id"), col("chunk_id").as("vec_id"),
          col("embedding")), snapshotId = Some(dir))
      val qt = LateInteraction.queryTokens(retrievalQueryDf(s))
        .localCheckpoint(true)
      def keyd(df: DataFrame) = df.select("query_id", "rank", "doc_id")
      val full = keyd(LateInteraction.maxSimTopK(qt, index, k = 4))
      val served = keyd(PlaidIndex.plaidTopKQuantized(s, key, qt, k = 4,
        nProbe = 16, mDocs = 16))
      full.agg(count(lit(1)).as("n_full"),
          countDistinct("query_id").as("n_queries"))
        .crossJoin(served.exceptAll(full).unionByName(full.exceptAll(served))
          .agg(count(lit(1)).as("n_diff")))
    }),

    // ROUND-14 MAINTENANCE LEGS UNDER THE ORACLE (q243's discipline
    // extended to the two store families that gained their fold this
    // round): the PLAID layout accumulates per-upsert file sets, the
    // line-dedup store per-batch file sets; maintain() at a
    // deliberately BELOW-floor threshold (maxFiles=1) must fold each
    // once through its own verb and then no-op (the auto-floor — a
    // below-floor threshold must not recompact every run), with
    // answers byte-identical on both surfaces and the line store's
    // batch-keyed replay reconstruction intact across the fold.
    // Replay-stable outputs only (the q243 rule): second-run
    // compaction count, both symmetric differences, and counts the
    // oracle replays.
    "q249_maintain_r14" -> ((s, dir) => {
      import graft.operators.{Governance, LateInteraction}
      import graft.sources.{DedupStore, PlaidIndex}
      val docs = t(s, dir, "documents").select("doc_id", "text")
        .localCheckpoint(true)
      val chunks = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200)
        .select(col("doc_id"), col("chunk_id").as("vec_id"),
          col("embedding")).localCheckpoint(true)
      val kP = s"$dir#maintp"
      val kL = s"$dir#maintl"
      if (!PlaidIndex.plaidExists(s, kP))
        PlaidIndex.ensurePlaid(s, kP,
          chunks.filter(col("doc_id") % 5 =!= 0))
      PlaidIndex.upsertPlaid(s, kP,
        chunks.filter(col("doc_id") % 10 === 0), batchId = Some(1L))
      PlaidIndex.upsertPlaid(s, kP,
        chunks.filter(col("doc_id") % 10 === 5), batchId = Some(2L))
      DedupStore.lineDedupBatch(s, kL,
        docs.filter(col("doc_id") % 2 === 0), batchId = 1L, maxDf = 2)
      DedupStore.lineDedupBatch(s, kL,
        docs.filter(col("doc_id") % 2 === 1), batchId = 2L, maxDf = 2)
      val qt = LateInteraction.queryTokens(retrievalQueryDf(s))
        .localCheckpoint(true)
      def plaidAns() = PlaidIndex.plaidTopKQuantized(s, kP, qt, k = 4,
        nProbe = 16, mDocs = 16).select("query_id", "rank", "doc_id")
      // the line store's served surface here is the batch-keyed replay
      // reconstruction — rows survive the fold verbatim or this path's
      // stored-count verification fails loudly
      def lineAns() = DedupStore.lineDedupBatch(s, kL,
          docs.filter(col("doc_id") % 2 === 1), batchId = 2L, maxDf = 2)
        .select("doc_id", "n_lines", "n_cut")
      val pBefore = plaidAns().localCheckpoint(true)
      val lBefore = lineAns().localCheckpoint(true)
      val scope = Governance.PurgeScope(plaid = Seq(kP),
        dedupLines = Seq(kL))
      Governance.maintain(s, scope, maxFiles = 1).localCheckpoint(true)
      val pAfter = plaidAns()
      val lAfter = lineAns()
      val run2 = Governance.maintain(s, scope, maxFiles = 1)
        .localCheckpoint(true)
      def sdiff(a: DataFrame, b: DataFrame) =
        a.exceptAll(b).unionByName(b.exceptAll(a))
      run2.agg(count(lit(1)).as("n_layouts"),
          sum(when(col("compacted"), 1L).otherwise(0L))
            .as("n_second_run_compactions"))
        .crossJoin(sdiff(pAfter, pBefore)
          .agg(count(lit(1)).as("n_diff_plaid")))
        .crossJoin(sdiff(lAfter, lBefore)
          .agg(count(lit(1)).as("n_diff_lines")))
        .crossJoin(pBefore.agg(count(lit(1)).as("n_plaid_rows")))
        .crossJoin(lBefore.agg(count(lit(1)).as("n_line_docs")))
    }),

    // FILTERED late-interaction retrieval on the clustered layout
    // (round-14 — the queryIvfSq8Filtered pre-filter contract brought
    // to MaxSim): top-k WITHIN an allowed doc set, the filter
    // semi-joined onto the probed lists BEFORE the stage-1 max so the
    // shortlist spends its slots on eligible docs only — the
    // post-filter failure mode (a restrictive filter starving the
    // top-k) is structurally impossible. Identity: zero symmetric
    // difference vs the full-scan MaxSim over ONLY the allowed docs,
    // plus a disallowed-doc count pinned 0, at every fixture scale.
    "q248_plaid_filtered" -> ((s, dir) => {
      import graft.operators.LateInteraction
      import graft.sources.PlaidIndex
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200).localCheckpoint(true)
      val key = s"$dir#plaid"
      PlaidIndex.ensurePlaid(s, key,
        index.select(col("doc_id"), col("chunk_id").as("vec_id"),
          col("embedding")), snapshotId = Some(dir))
      val qt = LateInteraction.queryTokens(retrievalQueryDf(s))
        .localCheckpoint(true)
      val allowed = index.select("doc_id").distinct()
        .filter(col("doc_id") % 3 =!= 1)
      def keyd(df: DataFrame) = df.select("query_id", "rank", "doc_id")
      val full = keyd(LateInteraction.maxSimTopK(qt,
        index.filter(col("doc_id") % 3 =!= 1), k = 4))
      val served = keyd(PlaidIndex.plaidTopKFiltered(s, key, qt,
        allowed, k = 4, nProbe = 16, mDocs = 16))
      full.agg(count(lit(1)).as("n_full"),
          countDistinct("query_id").as("n_queries"))
        .crossJoin(served.exceptAll(full).unionByName(full.exceptAll(served))
          .agg(count(lit(1)).as("n_diff")))
        .crossJoin(served.filter(col("doc_id") % 3 === 1)
          .agg(count(lit(1)).as("n_disallowed_served")))
    }),

    // FILTERED serving through the QUANTIZED stage 1 (round-15,
    // verdict #1 — the layout's last composition hole): q248's float
    // filtered path re-reads full float embeddings for its shortlist
    // scan the moment a metadata filter appears, forfeiting the int8
    // scan win q247 certifies — exactly the composition
    // queryIvfSq8Filtered already solved for the flat quantized
    // layout (q143/q144). plaidTopKFilteredQuantized keeps all three
    // disciplines at once: pre-filter semantics (allowed-set
    // semi-join BEFORE the stage-1 max — no shortlist starvation),
    // int8-only stage-1 bytes (ReadSchema excludes `embedding`;
    // PlanInvariantsSpec pins it), centroid partition literals on
    // both stages' scans. Identity: zero symmetric difference vs the
    // full-scan MaxSim over ONLY the allowed docs, plus a
    // disallowed-served count pinned 0, at every fixture scale.
    "q250_plaidq_filtered" -> ((s, dir) => {
      import graft.operators.LateInteraction
      import graft.sources.PlaidIndex
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200).localCheckpoint(true)
      val key = s"$dir#plaid"
      PlaidIndex.ensurePlaid(s, key,
        index.select(col("doc_id"), col("chunk_id").as("vec_id"),
          col("embedding")), snapshotId = Some(dir))
      val qt = LateInteraction.queryTokens(retrievalQueryDf(s))
        .localCheckpoint(true)
      val allowed = index.select("doc_id").distinct()
        .filter(col("doc_id") % 3 =!= 1)
      def keyd(df: DataFrame) = df.select("query_id", "rank", "doc_id")
      val full = keyd(LateInteraction.maxSimTopK(qt,
        index.filter(col("doc_id") % 3 =!= 1), k = 4))
      val served = keyd(PlaidIndex.plaidTopKFilteredQuantized(s, key,
        qt, allowed, k = 4, nProbe = 16, mDocs = 16))
      full.agg(count(lit(1)).as("n_full"),
          countDistinct("query_id").as("n_queries"))
        .crossJoin(served.exceptAll(full).unionByName(full.exceptAll(served))
          .agg(count(lit(1)).as("n_diff")))
        .crossJoin(served.filter(col("doc_id") % 3 === 1)
          .agg(count(lit(1)).as("n_disallowed_served")))
    }),

    // IMPACT-LAYOUT STALENESS CONTRACT UNDER THE ORACLE (round 15 —
    // the rebuild-only contract made EXPLICIT, r14 verdict #5): the
    // KeywordIndex postings twin is THE streaming lexical serving
    // surface (O(batch) upserts, exact BM25 under fresh statistics);
    // the impact-banded layout bakes df/avgdl/gmax at build and is
    // re-banded on a schedule. Between re-bands it is STALE — exact
    // for the corpus it was built over, behind the streaming surface —
    // and that state is decidable at the control plane with ZERO data
    // scans: both layouts fingerprint (n_docs, checksum) over
    // (doc_id, text) and the postings one xor-composes across
    // upserts, so listIndexes' `stale` column is a meta-only compare.
    // This query drives the full lifecycle: fresh twins (not stale) →
    // postings upsert (stale, NOT poisoned — it still serves) →
    // re-band over the grown corpus (cleared). Deterministic on
    // replay runs: each ensure re-fingerprints, so a replayed build
    // rebuilds to the same state.
    "q252_impact_staleness" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.{AnnIndex, ImpactIndex, IndexStore,
        KeywordIndex}
      val docs = t(s, dir, "documents").select("doc_id", "text")
        .localCheckpoint(true)
      val key = s"$dir#stale"
      val base = docs.filter(col("doc_id") % 10 =!= 7)
      val tail = docs.filter(col("doc_id") % 10 === 7)
        .localCheckpoint(true)
      KeywordIndex.ensurePostings(s, key, base)
      ImpactIndex.ensureImpacts(s, key, base)
      val name = s"graft_kwbmw_${IndexStore.pathTag(key)}"
      def flags() = AnnIndex.listIndexes(s)
        .filter(col("name") === name)
        .select(
          when(col("stale"), 1L).otherwise(0L).as("st"),
          when(col("poisoned"), 1L).otherwise(0L).as("po"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).head
      val fresh = flags()
      // no batchId: the postings layout REBUILDS at step 1 on a replay
      // run but keeps its monotonic batch counter (the streaming
      // contract), so a fixed id would read as a replay and skip —
      // this upsert must apply on every run to drive the lifecycle
      KeywordIndex.upsertPostings(s, key, tail)
      val upserted = flags()
      // the stale layout still SERVES (exact for its built corpus):
      // wandTopK answers without a poison refusal
      val servedFlag =
        if (ImpactIndex.wandTopK(s, key, retrievalQueryDf(s), k = 3)
          .count() > 0L) 1L else 0L
      ImpactIndex.ensureImpacts(s, key, docs)
      val rebanded = flags()
      Seq((fresh._1, fresh._2, upserted._1, upserted._2, rebanded._1,
          rebanded._2, servedFlag))
        .toDF("stale_fresh", "poisoned_fresh", "stale_after_upsert",
          "poisoned_after_upsert", "stale_after_reband",
          "poisoned_after_reband", "served_while_stale")
        .crossJoin(tail.agg(count(lit(1)).as("n_tail")))
    }),

    // ROUND-15 MAINTENANCE LEGS UNDER THE ORACLE (the q249 discipline
    // for the three legs this round adds/repairs): the SKETCH store
    // appends one KMV pane file-set per micro-batch forever (the last
    // append-forever family, r14 verdict #3), the composed OPQ-IVF-PQ
    // layout accumulates through its NEW outer upsert verb, and the
    // near-dup store's sigs fold width now clamps to the threshold
    // (the r14 advice defect — an unclamped default-8 fold parked the
    // layout above any lower threshold and recompacted it every run).
    // maintain() at a deliberately BELOW-floor threshold (maxFiles=1)
    // must fold each once through its own verb and then no-op, with
    // the merged sketch, the composed-OPQ answers, and the near
    // store's batch-keyed replay reconstruction all byte-identical
    // across the fold. Replay-stable outputs only (the q243/q249
    // rule): second-run counts, symmetric differences, and counts the
    // oracle replays from the fixture tables.
    "q251_maintain_r15" -> ((s, dir) => {
      import graft.operators.Governance
      import graft.sources.{AnnIndex, DedupStore, SketchStore}
      val docs = t(s, dir, "documents").select("doc_id", "text")
        .localCheckpoint(true)
      val kS = s"$dir#maints"
      val kO = s"$dir#mainto"
      val kN = s"$dir#maintn"
      // sketch panes: one per ingest batch (replayed ids no-op)
      val items = docs.select((col("doc_id") % 3).cast("int").as("grp"),
        concat(lit("d"), col("doc_id")).as("item"))
      SketchStore.update(s, kS, items.filter(col("grp") =!= 2), "grp",
        col("item"), batchId = 1L, k = 64, seed = 7L)
      SketchStore.update(s, kS, items.filter(col("grp") === 2), "grp",
        col("item"), batchId = 2L, k = 64, seed = 7L)
      // composed OPQ: build over the base slice, grow by upsert (the
      // round-15 outer verb; replayed batch ids fold away)
      val fl = t(s, dir, "embeddings").select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
        .localCheckpoint(true)
      // the guard must name EVERY build param (defaults differ:
      // numSub 16/ksub 64) or it reads false on replay runs and the
      // re-ensure retrains the layout down to the base slice — the
      // upsert legs then replay-skip and never return
      if (!AnnIndex.opqIvfPqExists(s, kO, lists = 8, iters = 2,
          numSub = 8, ksub = 16, pqIters = 2))
        AnnIndex.ensureOpqIvfPq(s, kO, fl.filter(col("vec_id") % 5 =!= 0),
          lists = 8, iters = 2, numSub = 8, ksub = 16, pqIters = 2)
      AnnIndex.upsertOpqIvfPq(s, kO, fl.filter(col("vec_id") % 10 === 0),
        batchId = Some(1L))
      AnnIndex.upsertOpqIvfPq(s, kO, fl.filter(col("vec_id") % 10 === 5),
        batchId = Some(2L))
      // near-dup store: two ingest batches (replays reconstruct)
      val nearIn2 = docs.filter(col("doc_id") % 2 === 1)
        .localCheckpoint(true)
      DedupStore.nearDedupBatch(s, kN,
        docs.filter(col("doc_id") % 2 === 0), batchId = 1L)
      DedupStore.nearDedupBatch(s, kN, nearIn2, batchId = 2L)
      def sketchAns() = SketchStore.read(s, kS)
        .select(col("grp"), array_sort(col("kmv")).as("kmv"))
      val q = fl.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec")).localCheckpoint(true)
      def opqAns() = AnnIndex.queryOpqIvfPq(q,
        AnnIndex.openOpqIvfPq(s, kO), k = 4, nProbe = 8, m = 128)
        .select("query_id", "rank", "vec_id")
      def nearAns() = DedupStore.nearDedupBatch(s, kN, nearIn2,
        batchId = 2L).select("doc_id")
      val sBefore = sketchAns().localCheckpoint(true)
      val oBefore = opqAns().localCheckpoint(true)
      val nBefore = nearAns().localCheckpoint(true)
      val scope = Governance.PurgeScope(sketches = Seq(kS),
        opqIvfPq = Seq(kO), dedupNear = Seq(kN))
      Governance.maintain(s, scope, maxFiles = 1).localCheckpoint(true)
      val sAfter = sketchAns()
      val oAfter = opqAns()
      val nAfter = nearAns()
      val run2 = Governance.maintain(s, scope, maxFiles = 1)
        .localCheckpoint(true)
      def sdiff(a: DataFrame, b: DataFrame) =
        a.exceptAll(b).unionByName(b.exceptAll(a))
      run2.agg(count(lit(1)).as("n_layouts"),
          sum(when(col("compacted"), 1L).otherwise(0L))
            .as("n_second_run_compactions"))
        .crossJoin(sdiff(sAfter, sBefore)
          .agg(count(lit(1)).as("n_diff_sketch")))
        .crossJoin(sdiff(oAfter, oBefore)
          .agg(count(lit(1)).as("n_diff_opq")))
        .crossJoin(sdiff(nAfter, nBefore)
          .agg(count(lit(1)).as("n_diff_near")))
        .crossJoin(sBefore.agg(count(lit(1)).as("n_sketch_groups")))
        .crossJoin(oBefore.agg(count(lit(1)).as("n_opq_answers")))
        .crossJoin(nearIn2.agg(count(lit(1)).as("n_near_input")))
    }),

    // PLAID INCREMENTAL INGEST ≡ REBUILD (round-14 — closes the
    // round-13 "rebuild-only" frontier gap #1): the layout built by
    // clustering the 80% base and ASSIGNING the 20% tail to the stored
    // centroids (upsertPlaid — O(batch) per ingest, the
    // streamingPlaidUpsert path) must serve the SAME answers as a full
    // re-cluster over the whole corpus AND as the exhaustive full-scan
    // MaxSim, at the shipped (nProbe=16, mDocs=16) margin — zero
    // symmetric difference on (query_id, rank, doc_id) both ways, at
    // every fixture scale. The upserted layout's stage-1 scores are
    // still per-token lower bounds (assignment is argmax over the SAME
    // stored centroids serving restricts to), so the mDocs margin is
    // the only recall surface — this query measures it holding under
    // base-only-trained centroids, the state a streamed corpus serves
    // from between re-clusters.
    "q245_plaid_upsert" -> ((s, dir) => {
      import graft.operators.LateInteraction
      import graft.sources.PlaidIndex
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200).localCheckpoint(true)
      val chunks = index.select(col("doc_id"),
        col("chunk_id").as("vec_id"), col("embedding"))
      val baseC = chunks.filter(col("doc_id") % 5 =!= 0)
      val tailC = chunks.filter(col("doc_id") % 5 === 0)
      val kUp = s"$dir#plaidup"
      val kRb = s"$dir#plaidrb"
      PlaidIndex.ensurePlaidUpserted(s, kUp, baseC, tailC)
      PlaidIndex.ensurePlaid(s, kRb, chunks, snapshotId = Some(dir))
      val qt = LateInteraction.queryTokens(retrievalQueryDf(s))
        .localCheckpoint(true)
      def keyd(df: DataFrame) = df.select("query_id", "rank", "doc_id")
      def sdiff(a: DataFrame, b: DataFrame) =
        a.exceptAll(b).unionByName(b.exceptAll(a))
      val upserted = keyd(PlaidIndex.plaidTopK(s, kUp, qt, k = 4,
        nProbe = 16, mDocs = 16))
      val rebuilt = keyd(PlaidIndex.plaidTopK(s, kRb, qt, k = 4,
        nProbe = 16, mDocs = 16))
      val full = keyd(LateInteraction.maxSimTopK(qt, index, k = 4))
      full.agg(count(lit(1)).as("n_full"),
          countDistinct("query_id").as("n_queries"))
        .crossJoin(sdiff(upserted, rebuilt)
          .agg(count(lit(1)).as("n_diff_rebuild")))
        .crossJoin(sdiff(upserted, full)
          .agg(count(lit(1)).as("n_diff_fullscan")))
    }),

    // The production hybrid surface (RagPipeline.hybridRetrievePersisted
    // — dense half from the persisted LSH buckets, lexical half from the
    // persisted postings) must be OUTPUT-IDENTICAL to the direct
    // hybridRetrieve at the recall-1.0 operating point: zero symmetric
    // difference on (query_id, rank, chunk_id), the q85 invariant style,
    // at every fixture scale.
    "q87_hybrid_persisted_identity" -> ((s, dir) => {
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200)
      val q = retrievalQueryDf(s)
      def hitsOf(df: DataFrame) = df.select("query_id", "rank", "chunk_id")
      val direct = hitsOf(RagPipeline.hybridRetrieve(q, index, k = 4))
      val persisted = hitsOf(RagPipeline.hybridRetrievePersisted(s,
        dir + "!hybrid", q, index, k = 4))
      direct.agg(count(lit(1)).as("n_direct"))
        .crossJoin(persisted.exceptAll(direct)
          .unionByName(direct.exceptAll(persisted))
          .agg(count(lit(1)).as("n_diff")))
    }),

    // The QUANTIZED hybrid serving surface (round-8 gap #3 closed):
    // hybridRetrieveQuantized serves the dense half from the persisted
    // SQ8 codes (4× less dense-scan I/O than the float path) and must
    // be OUTPUT-IDENTICAL to BOTH the direct hybridRetrieve and the
    // LSH-based hybridRetrievePersisted at the certified margin
    // (m=64 ≥ fetchK=10) — zero symmetric difference on
    // (query_id, rank, chunk_id) at every fixture scale.
    "q145_hybrid_quantized" -> ((s, dir) => {
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200)
      val q = retrievalQueryDf(s)
      def hitsOf(df: DataFrame) = df.select("query_id", "rank", "chunk_id")
      val direct = hitsOf(RagPipeline.hybridRetrieve(q, index, k = 4))
      val quantized = hitsOf(RagPipeline.hybridRetrieveQuantized(s,
        dir + "!hybridq", q, index, k = 4))
      val persisted = hitsOf(RagPipeline.hybridRetrievePersisted(s,
        dir + "!hybrid", q, index, k = 4))
      direct.agg(count(lit(1)).as("n_direct"))
        .crossJoin(quantized.exceptAll(direct)
          .unionByName(direct.exceptAll(quantized))
          .agg(count(lit(1)).as("n_diff_direct")))
        .crossJoin(quantized.exceptAll(persisted)
          .unionByName(persisted.exceptAll(quantized))
          .agg(count(lit(1)).as("n_diff_persisted")))
    }),

    // SQ8-served RAG retrieval ≡ direct dense retrieval (the q87
    // discipline for the quantized serving path): the persisted int8
    // codes answer the reference's E2 retrieval with zero symmetric
    // difference from the full-precision scan.
    "q108_sq8_retrieval_identity" -> ((s, dir) => {
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200)
      val q = retrievalQueryDf(s)
      def hitsOf(df: DataFrame) = df.select("query_id", "rank", "chunk_id")
      val direct = hitsOf(RagPipeline.retrieve(q, index, k = 4))
      val sq8 = hitsOf(RagPipeline.retrieveSq8Persisted(s,
        dir + "!ragsq8", q, index, k = 4))
      direct.agg(count(lit(1)).as("n_direct"))
        .crossJoin(sq8.exceptAll(direct)
          .unionByName(direct.exceptAll(sq8))
          .agg(count(lit(1)).as("n_diff")))
    }),

    // A9 cluster assignment via the ALTERNATING (large-star/small-star)
    // connected components — O(log n) rounds vs q53's O(diameter)
    // propagation, the 100 TB answer to boilerplate chains; same
    // recursive-CTE oracle as q53 proves output identity.
    "q80_cc_logrounds" -> ((s, dir) => {
      // fanOut: the q53 rationale
      val pairs = Dedup.ngramJaccard(fanOut(t(s, dir, "documents")), k = 3,
        threshold = 0.12)
      Dedup.clustersAlternating(pairs).select("doc_id", "cluster_id")
    }),

    // The reference's titular "adaptive recommendation" as an EQUALITY
    // invariant (the q71 style — no data-dependent constants): alpha=1
    // and empty-history adaptiveRetrieve must both reduce EXACTLY to
    // plain retrieve (8 = 2 queries × k rows, zero symmetric
    // difference). That the profile genuinely SHIFTS rankings is pinned
    // on controlled data in RagPipelineSpec, where the expected winner
    // is known.
    "q85_adaptive_invariants" -> ((s, dir) => {
      import s.implicits._
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200)
      val q = Seq((1L, 7L, "vector index scan fast"),
        (2L, 8L, "spark join shuffle partition"))
        .toDF("query_id", "user_id", "query_text")
      val hist = Seq((7L, "customer order value table"),
        (8L, "window agg batch row")).toDF("user_id", "question")
      val noHist = Seq.empty[(Long, String)].toDF("user_id", "question")
      def hitsOf(df: DataFrame) = df.select("query_id", "rank", "chunk_id")
      val plain = hitsOf(RagPipeline.retrieve(
        q.select("query_id", "query_text"), index, k = 4))
      val a1 = hitsOf(RagPipeline.adaptiveRetrieve(q, hist, index, k = 4,
        alpha = 1.0))
      val nh = hitsOf(RagPipeline.adaptiveRetrieve(q, noHist, index, k = 4,
        alpha = 0.3))
      plain.agg(count(lit(1)).as("n_plain"))
        .crossJoin(a1.exceptAll(plain).unionByName(plain.exceptAll(a1))
          .agg(count(lit(1)).as("n_diff_alpha1")))
        .crossJoin(nh.exceptAll(plain).unionByName(plain.exceptAll(nh))
          .agg(count(lit(1)).as("n_diff_nohist")))
    }),

    // The blended-score adaptive retriever over the PERSISTED index
    // (verdict r5 #7): probing the stored buckets with BOTH the query
    // and profile vectors and reranking the candidate union by the
    // blend must be OUTPUT-IDENTICAL to the exact adaptiveRetrieve at
    // the recall-1.0 operating point — and alpha=1 must still reduce to
    // plain retrieve. The q85 invariant style, at every fixture scale.
    "q89_adaptive_persisted_invariants" -> ((s, dir) => {
      import s.implicits._
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200)
      val q = Seq((1L, 7L, "vector index scan fast"),
        (2L, 8L, "spark join shuffle partition"))
        .toDF("query_id", "user_id", "query_text")
      val hist = Seq((7L, "customer order value table"),
        (8L, "window agg batch row")).toDF("user_id", "question")
      def hitsOf(df: DataFrame) = df.select("query_id", "rank", "chunk_id")
      val exact = hitsOf(RagPipeline.adaptiveRetrieve(q, hist, index,
        k = 4, alpha = 0.3))
      val persisted = hitsOf(RagPipeline.adaptiveRetrievePersisted(s,
        dir + "!hybrid", q, hist, index, k = 4, alpha = 0.3))
      val plain = hitsOf(RagPipeline.retrieve(
        q.select("query_id", "query_text"), index, k = 4))
      val a1 = hitsOf(RagPipeline.adaptiveRetrievePersisted(s,
        dir + "!hybrid", q, hist, index, k = 4, alpha = 1.0))
      exact.agg(count(lit(1)).as("n_adaptive"))
        .crossJoin(persisted.exceptAll(exact)
          .unionByName(exact.exceptAll(persisted))
          .agg(count(lit(1)).as("n_diff_persisted")))
        .crossJoin(a1.exceptAll(plain).unionByName(plain.exceptAll(a1))
          .agg(count(lit(1)).as("n_diff_alpha1")))
    }),

    // The composed training-data CLEANING funnel (the q66 pattern for
    // text curation): quality-score filter → language filter (detected
    // AND recorded lang agree on 'en') → bag-of-words dedup (keep min id
    // per sorted distinct token set — content-normalized, so reordered/
    // repeated-token copies collapse where exact-text dedup would not)
    // → corpus stats. Each stage's count plus the kept corpus's token
    // mass is recomputed by the DuckDB oracle, and each stage DROPS rows
    // on the fixture (500 → ~470 → ~200 → fewer). Every stage is a
    // per-row projection or a hash-keyed aggregate — the only
    // corpus-wide exchanges are Dedup.exact's hash-keyed phase-1 agg
    // (evaluated once per consumer branch; only the 8-byte key hash is
    // shuffled, the key text rides just the colliding-slice residual).
    "q84_clean_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // each funnel stage materializes ONCE (lazy checkpoint — row
      // order and values untouched): the panel's crossJoined branches
      // otherwise re-execute the per-row quality pass 3x and the
      // langid n-gram pass 2x, the dominant exec cost of this query
      val qual = TextAnalysis.qualityFeatures(docs)
        .filter(col("quality_score") >= 0.5)
        .localCheckpoint(false)
      val en = TextAnalysis.languageId(qual)
        .filter(col("predicted_lang") === "en" && col("lang") === "en")
        .localCheckpoint(false)
      val bowKey = array_join(
        array_sort(array_distinct(split(lower(trim(col("text"))), "\\s+"))),
        " ")
      val keep = Dedup.exact(en.select(col("doc_id"), bowKey.as("text")))
      val kept = en.join(keep.select(col("keep_doc_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(qual.agg(count(lit(1)).as("n_quality")))
        .crossJoin(en.agg(count(lit(1)).as("n_english")))
        .crossJoin(kept.agg(count(lit(1)).as("n_kept"),
          sum(TextAnalysis.tokenCount(col("text"))).as("sum_tokens_kept"),
          round(avg("quality_score"), 6).as("avg_quality_kept")))
    }),

    // ST6 batch analogue: dedup by event_id
    "q46_stream_dedup" -> ((s, dir) => {
      t(s, dir, "events").dropDuplicates("event_id")
        .agg(count(lit(1)).as("n_unique"),
          round(sum("value"), 4).as("sum_value"))
    }),

    // P1 refusal rewrite + P2 first-line truncation
    "q47_postprocess" -> ((s, dir) => {
      val answers = t(s, dir, "documents")
        .select(col("doc_id"), col("text").as("answer"))
      RagPipeline.postProcess(answers)
        .select(col("doc_id"), col("answer"))
    }),

    // A3/P4: ordered per-session history accumulation (the reference's
    // chat-history list, AI.py:168,182) as an ordered string aggregate
    "q48_history_concat" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(
          concat_ws("|",
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))).getField("event_type")).as("history"),
          count(lit(1)).as("n_events"))
    }),

    // A8 via the typed Aggregator/UDAF path (same oracle as q38)
    "q49_centroids_udaf" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .groupBy(col("label").as("centroid_id"))
        .agg(graft.functions.VectorMeanAgg.asColumn(col("embedding"))
          .as("mean_vec"))
        .select(col("centroid_id"),
          posexplode(col("mean_vec")).as(Seq("dim", "mean_v")))
        .select(col("centroid_id"), col("dim"),
          round(col("mean_v"), 6).as("mean_v"))
    }),

    // T2 at scale: exact kNN through the bounded TopKAgg custom aggregate
    // (map-side partial top-k, O(k) shuffle per task per query)
    "q51_knn_topk_agg" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      SimilaritySearch.bruteForceTopKAgg(q, emb, k = 4)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // A9: near-dup cluster assignment (min-label connected components)
    "q53_dedup_clusters" -> ((s, dir) => {
      // fanOut: shingle explode + self-join are CPU-bound and the
      // fixture scan is 1-3 splits (see the helper doc); jaccard is an
      // integer-ratio division, order-insensitive
      val pairs = Dedup.ngramJaccard(fanOut(t(s, dir, "documents")), k = 3,
        threshold = 0.12)
      Dedup.clusters(pairs).select("doc_id", "cluster_id")
    }),

    // A5: approximate distinct (HLL++) — deterministic for a given input,
    // rows-only (the sketch estimate is engine-specific by design)
    "q54_approx_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_suppkey")).as("approx_supps"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"))
    }),

    // §2.10 UDTF surface: the C1 chunker as a SQL Generator
    "q50_chunks_sql" -> ((s, dir) => {
      graft.text.ChunkTextGenerator.register(s)
      t(s, dir, "documents").createOrReplaceTempView("q50_docs")
      s.sql("""SELECT doc_id, c.chunk_index, length(c.chunk) AS chunk_len
              |FROM q50_docs
              |LATERAL VIEW chunk_text(text, 120) c AS chunk_index, chunk
              |""".stripMargin)
    }),

    // O3 via the PLANNER: the user writes the naive exact crossJoin kNN;
    // the session's ANN rewrite rule (graft.plans.LshAnnPlan) recognizes
    // the TopK-over-CrossJoin shape and substitutes the bucketed
    // multi-probe LSH join at its recall-1.0 operating point — same oracle
    // as q35 proves output-identity, PLANS.md proves the CrossJoin is gone.
    "q59_lsh_strategy" -> ((outer, dir) => {
      // the rewrite rule is scoped to a session CLONE: enabling it on the
      // shared session would leave every later query in the session
      // exposed to silent re-planning through the approximate index
      // (newSession shares the SparkContext/catalog but gets its own
      // experimental-methods list, so the outer optimizer is untouched)
      val s = outer.newSession()
      graft.plans.LshAnnPlan.enable(s)
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(desc("score"), asc("vec_id"))
      emb.crossJoin(broadcast(q))
        .withColumn("score",
          graft.functions.VectorOps.cosine(col("embedding"), col("query_vec")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 4)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // O3 rewrite + persisted index combined: the SAME naive crossJoin
    // kNN as q59, but the enabled rule carries persistedSource — the
    // optimizer re-plans the query onto the STORED bucket table
    // (PlanInvariantsSpec asserts the executed plan scans
    // graft_lsh_buckets_* and recomputes no index-side signatures).
    // Hash-matching the exact oracle proves the full lifecycle: build
    // once (ensureLsh), then a user's naive query is answered by the
    // index, output-identically, without mentioning it.
    "q73_rewrite_persisted" -> ((outer, dir) => {
      val s = outer.newSession()
      graft.sources.AnnIndex.ensureLsh(s, dir,
        Tables.load(s, dir, "embeddings").select("vec_id", "embedding"),
        tables = 64, bits = 12)
      graft.plans.LshAnnPlan.enable(s,
        graft.plans.LshAnnPlan.Config(persistedSource = Some(dir)))
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(desc("score"), asc("vec_id"))
      emb.crossJoin(broadcast(q))
        .withColumn("score",
          graft.functions.VectorOps.cosine(col("embedding"), col("query_vec")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 4)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // O3 rewrite on the AGGREGATE kNN formulation (round-4 verdict's top
    // item): the naive bounded-TopKAgg query — the engine's own flagship
    // retrieve shape (RagPipeline.retrieve, q51) — matched at the
    // Aggregate node and re-planned onto the STORED bucket table by the
    // same enabled rule. Hash-matching q51's exact oracle proves
    // output-identity; PlanInvariantsSpec asserts the executed plan
    // scans graft_lsh_buckets_* with no CartesianProduct.
    "q74_rewrite_topk_agg" -> ((outer, dir) => {
      val s = outer.newSession()
      graft.sources.AnnIndex.ensureLsh(s, dir,
        Tables.load(s, dir, "embeddings").select("vec_id", "embedding"),
        tables = 64, bits = 12)
      graft.plans.LshAnnPlan.enable(s,
        graft.plans.LshAnnPlan.Config(persistedSource = Some(dir)))
      import graft.functions.expressions.TopKAgg.top_k
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      emb.crossJoin(broadcast(q))
        .withColumn("score",
          graft.functions.VectorOps.cosine(col("embedding"), col("query_vec")))
        .groupBy("query_id")
        .agg(top_k(col("score"), col("vec_id"), 4).as("topk"))
        .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
        .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
          col("hit.id").as("vec_id"), round(col("hit.score"), 6).as("score"))
    }),

    // O3 rewrite on the GLOBAL-LIMIT kNN formulation (the third naive
    // shape): one query vector, `orderBy(score desc, vec_id asc)
    // .limit(k)` — no window, no aggregate. The rule serves the limit
    // from per-query index top-k re-sorted globally (the global top-k
    // is a subset of the union of per-query top-k). Hash-matching a
    // global-limit exact oracle proves output-identity through the
    // stored bucket table.
    "q75_rewrite_global_limit" -> ((outer, dir) => {
      val s = outer.newSession()
      graft.sources.AnnIndex.ensureLsh(s, dir,
        Tables.load(s, dir, "embeddings").select("vec_id", "embedding"),
        tables = 64, bits = 12)
      graft.plans.LshAnnPlan.enable(s,
        graft.plans.LshAnnPlan.Config(persistedSource = Some(dir)))
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      emb.crossJoin(broadcast(q))
        .withColumn("score",
          graft.functions.VectorOps.cosine(col("embedding"), col("query_vec")))
        .orderBy(desc("score"), asc("vec_id"))
        .limit(4)
        .select(col("query_id"), col("vec_id"),
          round(col("score"), 6).as("score"))
    }),

    // O3 invariant closure for q36/q37: recall@4 of the shipped LSH and
    // IVF operating points against the exact top-k, asserted over floors
    // that must hold at EVERY fixture scale (AnnTune: LSH 0.875 / 0.969 /
    // 0.938 and IVF-64-list/24-probe 0.875 / 0.938 / 0.906 on
    // sf0.001 / 0.01 / 0.1 -> LSH floor 0.85, IVF floor 0.84, raised
    // from round 2's 0.75 by re-tuning the IVF operating point). The
    // IVF floor carries one flipped-neighbor of headroom below the
    // 0.875 sf0.001 measurement (Δ = 1/32 ≈ 0.031): the Lloyd
    // re-average's float summation order is not guaranteed stable
    // across partition schedules, so a near-tie centroid assignment
    // could legitimately flip one hit; LSH is pure integer hashing, so
    // its measured points are schedule-independent and 0.85 is safe.
    // The oracle derives n_queries/n_exact from the table; the floor
    // booleans pin the invariant the ANN paths must keep.
    "q60_ann_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val exact = SimilaritySearch.bruteForceTopK(q, emb, k = 4)
        .select("query_id", "vec_id")
      val lsh = SimilaritySearch.lshTopK(q, emb, k = 4, tables = 64,
        bits = 12, probes = 16).select("query_id", "vec_id")
      val cents = SimilaritySearch.kMeansCentroids(emb, k = 64, iters = 5)
      val ivf = SimilaritySearch.ivfTopK(q, emb, cents, k = 4, nProbe = 24)
        .select("query_id", "vec_id")
      exact.agg(countDistinct("query_id").as("n_queries"),
          count(lit(1)).as("n_exact"))
        .crossJoin(exact.join(lsh, Seq("query_id", "vec_id"), "left_semi")
          .agg(count(lit(1)).as("lsh_hits")))
        .crossJoin(exact.join(ivf, Seq("query_id", "vec_id"), "left_semi")
          .agg(count(lit(1)).as("ivf_hits")))
        .select(col("n_queries"), col("n_exact"),
          (col("lsh_hits") >= col("n_exact") * 0.85).as("lsh_recall_ok"),
          (col("ivf_hits") >= col("n_exact") * 0.84).as("ivf_recall_ok"))
    }),

    // A9 invariant closure for q33: the banded (pigeonhole) simhash pairs
    // must equal the brute-force all-pairs hamming<=3 set — soundness
    // (n_extra=0, banding re-verifies hamming exactly) AND completeness
    // (n_missed=0, guaranteed by maxHamming < pieces). The all-pairs side
    // is the quadratic fixture-scale baseline the banded path replaces.
    "q61_simhash_invariants" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val banded = Dedup.simHashDedup(docs, maxHamming = 3, pieces = 4)
        .select("doc_id_a", "doc_id_b")
      val hashes = docs.select(col("doc_id"), Dedup.simHash(col("text")).as("sh64"))
      val allPairs = hashes
        .select(col("doc_id").as("doc_id_a"), col("sh64").as("h_a"))
        .crossJoin(hashes.select(col("doc_id").as("doc_id_b"), col("sh64").as("h_b")))
        .filter(col("doc_id_a") < col("doc_id_b"))
        .filter(Dedup.hammingDist(col("h_a"), col("h_b")) <= 3)
        .select("doc_id_a", "doc_id_b")
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(allPairs.join(banded, Seq("doc_id_a", "doc_id_b"), "left_anti")
          .agg(count(lit(1)).as("n_missed")))
        .crossJoin(banded.join(allPairs, Seq("doc_id_a", "doc_id_b"), "left_anti")
          .agg(count(lit(1)).as("n_extra")))
    }),

    // A5 invariant closure for q54: HLL++ estimates within 5% of the
    // exact distinct counts at rsd = 0.02 (the default 0.05 rsd is a ONE-
    // sigma bound - at sf0.001 the orderkey estimate lands 6.4% off,
    // within ~1.3 sigma; 0.02 puts 5% at 2.5 sigma and the fixture
    // cardinalities measured well inside it at every scale). The sketches
    // aggregate SEPARATELY from the exact counts: mixing them in one agg
    // drags the wide HLL buffers through the count-distinct Expand and
    // cost 10x on the bench. Exact side fully DuckDB-computed.
    "q62_hll_error" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_suppkey")).as("exact_supps"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
        .crossJoin(li.agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("a_p"),
          approx_count_distinct(col("l_suppkey"), 0.02).as("a_s"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("a_o")))
        .select(col("exact_parts"), col("exact_supps"), col("exact_orders"),
          (abs(col("a_p") - col("exact_parts")) <= col("exact_parts") * 0.05)
            .as("parts_ok"),
          (abs(col("a_s") - col("exact_supps")) <= col("exact_supps") * 0.05)
            .as("supps_ok"),
          (abs(col("a_o") - col("exact_orders")) <= col("exact_orders") * 0.05)
            .as("orders_ok"))
    }),

    // Quantile sketch certification (the q62 discipline for the OTHER
    // mergeable sketch a 100 TB pipeline leans on): percentile_approx
    // (Spark's GK-style QuantileSummaries — mergeable partials, no
    // global sort) against the exact interpolated percentile computed
    // in the same query, with the approx value required to land inside
    // the exact [p−0.005, p+0.005] rank window (5× the sketch's 1/1000
    // rank-error guarantee). The oracle recomputes the exact
    // percentiles non-circularly (quantile_cont) and pins the flags.
    "q107_quantile_sketch" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      // ONE exact-percentile buffer for all six cut points and one
      // approx sketch for both targets (the array form of the same
      // aggregates — identical values by definition, but 6+2 separate
      // TypedImperativeAggregate buffers collapse to 1+1: each exact
      // buffer holds the full per-group value multiset, so the scalar
      // form paid the collect+sort SIX times per group — measured
      // 6.4 s → 1.9 s at sf0.1, outputs row-identical)
      li.groupBy("l_returnflag").agg(
          expr("percentile(l_extendedprice, " +
            "array(0.5D, 0.95D, 0.495D, 0.505D, 0.945D, 0.955D))").as("ex"),
          expr("percentile_approx(l_extendedprice, " +
            "array(0.5D, 0.95D), 1000)").as("ap"))
        .select(col("l_returnflag"),
          round(col("ex").getItem(0), 6).as("exact_p50"),
          round(col("ex").getItem(1), 6).as("exact_p95"),
          (col("ap").getItem(0) >= col("ex").getItem(2) &&
            col("ap").getItem(0) <= col("ex").getItem(3)).as("p50_rank_ok"),
          (col("ap").getItem(1) >= col("ex").getItem(4) &&
            col("ap").getItem(1) <= col("ex").getItem(5)).as("p95_rank_ok"))
    }),

    // S4/§4 bucketed index layout: both sides written bucketBy(vec_id) +
    // sortBy(vec_id) through the catalog, then joined on the bucket key —
    // the executed plan has ZERO exchanges (asserted in BucketedLayoutSpec;
    // snapshot in PLANS.md). One layout write buys every repeated index
    // join for free. Merge hint keeps the demo on the co-located SMJ path
    // (a broadcast would hide the property being demonstrated).
    "q64_bucketed_join" -> ((s, dir) => {
      import graft.sources.IndexStore
      val emb = t(s, dir, "embeddings")
      // layout path + catalog names derived from the scale-factor dir so
      // concurrent runs on different fixtures never race on DROP TABLE /
      // overwrite (same-dir runs share one deterministic location)
      val tag = IndexStore.pathTag(dir)
      val base = s"/tmp/graft_bucketed_$tag"
      IndexStore.writeBucketed(emb.select("vec_id", "embedding"),
        s"graft_emb_vecs_$tag", s"$base/vecs", buckets = 8, key = "vec_id")
      IndexStore.writeBucketed(emb.select("vec_id", "label"),
        s"graft_emb_labels_$tag", s"$base/labels", buckets = 8, key = "vec_id")
      IndexStore.readBucketed(s, s"graft_emb_vecs_$tag").hint("merge")
        .join(IndexStore.readBucketed(s, s"graft_emb_labels_$tag"), Seq("vec_id"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vectors"),
          round(avg(graft.functions.VectorOps.l2Norm(col("embedding"))), 6)
            .as("avg_norm"))
    }),

    // E1/E2 invariant closure for q28/q29: per retrieval query, exactly
    // k=4 hits with contiguous ranks and non-increasing scores; plus the
    // E1 chunk-inventory size cross-checked against the DuckDB recursive
    // chunker at the same chunk size — the non-circular half (the
    // embedder itself stays rows-only: murmur3 is not SQL-expressible).
    "q65_rag_invariants" -> ((s, dir) => {
      val index = RagPipeline.buildIndex(s, t(s, dir, "documents"),
        chunkSize = 200)
      val ret = RagPipeline.retrieve(retrievalQueryDf(s), index, k = 4)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy("rank")
      ret
        .withColumn("prev_score", lag(col("score"), 1).over(w))
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_hits"),
          (min("rank") === 1 && max("rank") === 4 &&
            countDistinct("rank") === 4).as("ranks_ok"),
          min(coalesce(col("score") <= col("prev_score"), lit(true)))
            .as("scores_monotonic"))
        .crossJoin(index.agg(countDistinct("chunk_id").as("n_index_chunks")))
        .select(col("query_id"), col("n_hits"), col("ranks_ok"),
          col("scores_monotonic"), col("n_index_chunks"))
    }),

    // The training-data pipeline END-TO-END: near-dup detection ->
    // transitive clusters -> keep the min-id canonical doc per cluster ->
    // chunk + embed the kept corpus into the index. Every stage count is
    // independently recomputed by the DuckDB oracle (recursive closure +
    // recursive chunker), so the composition is verified, not just the
    // pieces.
    "q66_dedup_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // fanOut on the pair-generation input only (the q53 rationale);
      // the doc-count/join legs keep the plain scan
      val pairs = Dedup.ngramJaccard(fanOut(docs), k = 3, threshold = 0.12)
      val clusters = Dedup.clusters(pairs)
      val drops = clusters.filter(col("doc_id") =!= col("cluster_id"))
        .select("doc_id")
      val kept = docs.join(drops, Seq("doc_id"), "left_anti")
      val index = RagPipeline.buildIndex(s, kept, chunkSize = 200)
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(drops.agg(count(lit(1)).as("n_dropped")))
        .crossJoin(kept.agg(count(lit(1)).as("n_kept")))
        // summing embedding sizes (not count(1)) forces the embed stage
        // to actually execute — column pruning would otherwise skip it
        .crossJoin(index.agg(count(lit(1)).as("n_kept_chunks"),
          sum(size(col("embedding"))).as("n_embed_floats")))
    }),

    // P3 invariant closure for q42: the full-text fingerprint must be
    // collision-free on the corpus (distinct fingerprints = distinct
    // texts) and the min-window fingerprint must be a pure function of
    // the text (no text maps to two values). Both exact sides are
    // DuckDB-computed from `documents`.
    "q63_fingerprint_check" -> ((s, dir) => {
      val fp = TextAnalysis.fingerprint(t(s, dir, "documents"))
      fp.agg(count(lit(1)).as("n_docs"),
          countDistinct(col("text")).as("n_distinct_texts"),
          countDistinct(col("fingerprint_full")).as("n_distinct_full"))
        .crossJoin(fp.groupBy("text")
          .agg(countDistinct(col("fingerprint_min")).as("nm"))
          .filter(col("nm") > 1)
          .agg(count(lit(1)).as("n_min_fp_inconsistent")))
    }))

  /** Shared CTE chain computing exact n-gram Jaccard pairs; reused by the
    * q31 oracle and the q53 connected-components oracle. Mirrors the
    * engine's default shingle doc-frequency cap (`Dedup
    * .DefaultMaxShingleDocFreq`): candidate intersections come from
    * capped shingles while union sizes stay exact — identical to the
    * Scala operator even when the cap binds.
    */
  private val jaccardCtes =
    s"""toks AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    concat_ws(' ', tk[i], tk[i+1], tk[i+2]) AS shingle
      |  FROM toks, unnest(generate_series(1, greatest(1, len(tk)-2))) AS u(i)),
      |shf AS (
      |  SELECT doc_id, shingle FROM sh
      |  WHERE shingle IN (
      |    SELECT shingle FROM sh GROUP BY shingle
      |    HAVING count(*) <= ${Dedup.DefaultMaxShingleDocFreq})),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT x.doc_id AS doc_id_a, y.doc_id AS doc_id_b,
      |    count(*) AS n_inter
      |  FROM sh x JOIN sh y ON x.shingle = y.shingle
      |    AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2),
      |jac AS (
      |  SELECT doc_id_a, doc_id_b,
      |    CAST(n_inter AS DOUBLE) / (a.n_sh + b.n_sh - n_inter) AS jaccard
      |  FROM inter
      |  JOIN sizes a ON a.doc_id = doc_id_a
      |  JOIN sizes b ON b.doc_id = doc_id_b),
      |cands AS (
      |  SELECT DISTINCT x.doc_id AS doc_id_a, y.doc_id AS doc_id_b
      |  FROM shf x JOIN shf y ON x.shingle = y.shingle
      |    AND x.doc_id < y.doc_id),
      |jac_capped AS (
      |  SELECT jac.* FROM jac
      |  JOIN cands USING (doc_id_a, doc_id_b))""".stripMargin

  /** Exact cosine top-4 for the first 8 vectors — shared by q35 (window
    * formulation), q51 (TopKAgg formulation) and q59 (ANN plan rewrite):
    * three physical strategies, one result.
    */
  /** Exact kNN over the FRONT-LOADED fixture (component i scaled by
    * 0.8^i, float-rounded — the deterministic MRL-shaped transform
    * q111/q112 apply): truncated and truncated+quantized serving must
    * be output-identical to this at the certified (d=16, m=32) point.
    */
  private val knnFrontLoadedOracle =
    """WITH fl AS (
      |  SELECT vec_id,
      |    list_transform(range(1, len(embedding) + 1),
      |      i -> CAST(embedding[i] * power(0.8, i - 1) AS FLOAT))
      |      AS embedding
      |  FROM embeddings),
      |scored AS (
      |  SELECT q.vec_id AS query_id, x.vec_id,
      |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
      |                     CAST(x.embedding AS DOUBLE[]))
      |    / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
      |                             CAST(q.embedding AS DOUBLE[])))
      |     * sqrt(list_dot_product(CAST(x.embedding AS DOUBLE[]),
      |                             CAST(x.embedding AS DOUBLE[]))))
      |    AS score
      |  FROM fl q CROSS JOIN fl x
      |  WHERE q.vec_id < 8),
      |ranked AS (
      |  SELECT query_id, vec_id, score,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY score DESC, vec_id ASC) AS INT) AS rank
      |  FROM scored)
      |SELECT query_id, rank, vec_id, round(score, 6) AS score
      |FROM ranked WHERE rank <= 4""".stripMargin

  /** Exact kNN restricted to even-label index vectors — the filtered
    * retrieval ground truth (PRE-filter semantics: ranking within the
    * filtered set) q113/q114 must match.
    */
  private val knnFilteredOracle =
    """WITH scored AS (
      |  SELECT q.vec_id AS query_id, x.vec_id,
      |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
      |                     CAST(x.embedding AS DOUBLE[]))
      |    / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
      |                             CAST(q.embedding AS DOUBLE[])))
      |     * sqrt(list_dot_product(CAST(x.embedding AS DOUBLE[]),
      |                             CAST(x.embedding AS DOUBLE[]))))
      |    AS score
      |  FROM embeddings q CROSS JOIN embeddings x
      |  WHERE q.vec_id < 8 AND x.label % 2 = 0),
      |ranked AS (
      |  SELECT query_id, vec_id, score,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY score DESC, vec_id ASC) AS INT) AS rank
      |  FROM scored)
      |SELECT query_id, rank, vec_id, round(score, 6) AS score
      |FROM ranked WHERE rank <= 4""".stripMargin

  private val knnExactOracle =
    """WITH scored AS (
      |  SELECT q.vec_id AS query_id, x.vec_id,
      |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
      |                     CAST(x.embedding AS DOUBLE[]))
      |    / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
      |                             CAST(q.embedding AS DOUBLE[])))
      |     * sqrt(list_dot_product(CAST(x.embedding AS DOUBLE[]),
      |                             CAST(x.embedding AS DOUBLE[]))))
      |    AS score
      |  FROM embeddings q CROSS JOIN embeddings x
      |  WHERE q.vec_id < 8),
      |ranked AS (
      |  SELECT query_id, vec_id, score,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY score DESC, vec_id ASC) AS INT) AS rank
      |  FROM scored)
      |SELECT query_id, rank, vec_id, round(score, 6) AS score
      |FROM ranked WHERE rank <= 4""".stripMargin

  /** `capped = true` mirrors the engine's candidate-generation cap
    * (jaccard always EXACT, pairs restricted to capped-shingle
    * candidates — the q31/q53 semantics); `capped = false` is the pure
    * exact set, matching paths whose candidates don't come from the
    * capped join (q32's minhash banding).
    */
  private def jaccardOracle(threshold: Double = 0.12, capped: Boolean = true) =
    s"""WITH $jaccardCtes
      |SELECT doc_id_a, doc_id_b,
      |  round(jaccard, 6) AS jaccard
      |FROM ${if (capped) "jac_capped" else "jac"}
      |WHERE jaccard >= $threshold""".stripMargin

  /** q53 oracle: transitive closure over the jaccard pairs via a
    * recursive CTE; cluster id = min reachable node id.
    */
  private val reachCtes =
    s"""pairs AS (SELECT doc_id_a, doc_id_b FROM jac_capped WHERE jaccard >= 0.12),
      |edges AS (
      |  SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
      |  UNION SELECT doc_id_b, doc_id_a FROM pairs),
      |reach AS (
      |  SELECT a, b FROM edges
      |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |    WHERE r.a != e.b)""".stripMargin

  private val clustersOracle =
    s"""WITH RECURSIVE $jaccardCtes,
      |$reachCtes
      |SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS cluster_id
      |FROM reach GROUP BY a""".stripMargin

  /** The retrieval queries as a SQL VALUES literal (same fixed strings
    * the Spark side reads from [[RetrievalQueries]]).
    */
  private val queryValues = RetrievalQueries
    .map { case (id, s) => s"(CAST($id AS BIGINT), '$s')" }
    .mkString(", ")

  /** Shared lexical CTEs: corpus tokens / tf / dl / stats and query
    * terms — the oracle mirror of `KeywordSearch.tokens`/`bm25Postings`
    * (lowercase, split on non-[a-z0-9] runs, empties dropped; counts as
    * doubles since they only feed double math).
    */
  private val lexicalCtes =
    s"""toks AS (
      |  SELECT doc_id, tok
      |  FROM documents,
      |    unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(tok)
      |  WHERE tok <> ''),
      |tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
      |  FROM toks GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
      |  FROM toks GROUP BY 1),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
      |  FROM dl),
      |q AS (SELECT * FROM (VALUES $queryValues) AS v(query_id, qtext)),
      |qt AS (SELECT DISTINCT query_id, tok
      |  FROM q, unnest(string_split_regex(lower(qtext), '[^a-z0-9]+')) AS u(tok)
      |  WHERE tok <> ''),
      |df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf
      |  WHERE tok IN (SELECT DISTINCT tok FROM qt) GROUP BY 1),
      |bm25 AS (
      |  SELECT qt.query_id, tf.doc_id,
      |    sum(ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
      |      * tf.tf * (1.2 + 1)
      |      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)))
      |      AS score
      |  FROM qt
      |  JOIN tf ON qt.tok = tf.tok
      |  JOIN df ON df.tok = qt.tok
      |  JOIN dl ON dl.doc_id = tf.doc_id
      |  CROSS JOIN stats
      |  GROUP BY 1, 2),
      |bm25_ranked AS (
      |  SELECT query_id, doc_id, score,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY round(score, 6) DESC, doc_id ASC) AS INT) AS rank
      |  FROM bm25)""".stripMargin

  /** q84 oracle: the full cleaning funnel in SQL — per-doc quality
    * score (the q40 formula), stopword-voting language-ID with
    * alphabetical-first ties (the q41 CASE-arm construction), exact
    * dedup keep-set, then per-stage counts + kept token mass.
    */
  private val cleanPipelineOracle = {
    val stop = TextAnalysis.Stopwords.map(w => s"'$w'")
      .mkString("[", ", ", "]")
    val markers = TextAnalysis.LangMarkers.toSeq.sortBy(_._1)
    val hitExprs = markers.map { case (lang, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), " +
        s"x -> list_contains($arr, x))) AS hits_$lang"
    }.mkString(",\n    ")
    val langs = markers.map(_._1)
    val caseArms = langs.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"hits_$l >= hits_$o")
        .mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString("\n      ")
    s"""WITH feats AS (
       |  SELECT doc_id, text, lang,
       |    len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
       |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |      x -> list_contains($stop, x))) AS DOUBLE)
       |      / len(string_split_regex(lower(trim(text)), '\\s+'))
       |      AS stopword_ratio,
       |    CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
       |      AS DOUBLE) / length(text) AS punct_ratio
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, text, lang,
       |    round(least(1.0, CAST(n_tokens AS DOUBLE) / 50.0) * 0.4 +
       |      (1.0 - least(1.0, punct_ratio * 5.0)) * 0.3 +
       |      least(1.0, stopword_ratio * 4.0) * 0.3, 6) AS quality_score
       |  FROM feats),
       |qual AS (SELECT * FROM scored WHERE quality_score >= 0.5),
       |lang_scored AS (
       |  SELECT doc_id, text, lang, quality_score,
       |    $hitExprs
       |  FROM qual),
       |en AS (
       |  SELECT doc_id, text, quality_score FROM lang_scored
       |  WHERE CASE
       |      $caseArms
       |    END = 'en' AND lang = 'en'),
       |keep AS (
       |  SELECT min(doc_id) AS doc_id FROM en
       |  GROUP BY list_sort(list_distinct(
       |    string_split_regex(lower(trim(text)), '\\s+')))),
       |kept AS (SELECT en.* FROM en JOIN keep USING (doc_id))
       |SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
       |  (SELECT CAST(count(*) AS BIGINT) FROM qual) AS n_quality,
       |  (SELECT CAST(count(*) AS BIGINT) FROM en) AS n_english,
       |  (SELECT CAST(count(*) AS BIGINT) FROM kept) AS n_kept,
       |  (SELECT CAST(sum(len(string_split_regex(trim(text), '\\s+')))
       |    AS BIGINT) FROM kept) AS sum_tokens_kept,
       |  (SELECT round(avg(quality_score), 6) FROM kept)
       |    AS avg_quality_kept""".stripMargin
  }

  /** q78 oracle: Okapi BM25 top-5 (k1=1.2, b=0.75, textbook idf),
    * ranked on the 6-decimal score with doc_id tiebreak — the same
    * ranking key the Spark side feeds TopKAgg.
    */
  private val bm25Oracle =
    s"""WITH $lexicalCtes
      |SELECT query_id, rank, doc_id, round(score, 6) AS score
      |FROM bm25_ranked WHERE rank <= 5""".stripMargin

  /** q79 oracle: RRF (rrfK=60) over BM25 top-10 and token-set-jaccard
    * top-10, fused top-5.
    */
  private val hybridRrfOracle =
    s"""WITH $lexicalCtes,
      |dt AS (SELECT DISTINCT doc_id, tok FROM toks),
      |nd AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS nd
      |  FROM dt GROUP BY 1),
      |nq AS (SELECT query_id, CAST(count(*) AS DOUBLE) AS nq
      |  FROM qt GROUP BY 1),
      |ji AS (SELECT qt.query_id, dt.doc_id, CAST(count(*) AS DOUBLE) AS ni
      |  FROM qt JOIN dt ON qt.tok = dt.tok GROUP BY 1, 2),
      |jscore AS (
      |  SELECT ji.query_id, ji.doc_id, ni / (nd.nd + nq.nq - ni) AS score
      |  FROM ji
      |  JOIN nd ON nd.doc_id = ji.doc_id
      |  JOIN nq ON nq.query_id = ji.query_id),
      |jac_ranked AS (
      |  SELECT query_id, doc_id,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY round(score, 6) DESC, doc_id ASC) AS INT) AS rank
      |  FROM jscore),
      |contribs AS (
      |  SELECT query_id, doc_id, 1.0 / (60 + rank) AS c
      |  FROM bm25_ranked WHERE rank <= 10
      |  UNION ALL
      |  SELECT query_id, doc_id, 1.0 / (60 + rank) AS c
      |  FROM jac_ranked WHERE rank <= 10),
      |rrf AS (SELECT query_id, doc_id, sum(c) AS rrf
      |  FROM contribs GROUP BY 1, 2),
      |fused AS (
      |  SELECT query_id, doc_id, rrf,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY round(rrf, 6) DESC, doc_id ASC) AS INT) AS rank
      |  FROM rrf)
      |SELECT query_id, rank, doc_id, round(rrf, 6) AS rrf_score
      |FROM fused WHERE rank <= 5""".stripMargin

  /** q66 oracle: the whole dedup-then-index pipeline in SQL — transitive
    * near-dup closure picks the min-id canonical per cluster, dropped =
    * non-canonical members, and the kept corpus is re-chunked by the
    * recursive chunker (size 200) for the index row count.
    */
  private val dedupPipelineOracle =
    s"""WITH RECURSIVE $jaccardCtes,
      |$reachCtes,
      |drops AS (
      |  SELECT a AS doc_id FROM reach GROUP BY a
      |  HAVING least(a, min(b)) != a),
      |${chunkCteBody(200,
          seedWhere = "WHERE doc_id NOT IN (SELECT doc_id FROM drops)")}
      |SELECT
      |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
      |  (SELECT CAST(count(*) AS BIGINT) FROM drops) AS n_dropped,
      |  (SELECT CAST(count(*) AS BIGINT) FROM documents
      |   WHERE doc_id NOT IN (SELECT doc_id FROM drops)) AS n_kept,
      |  (SELECT CAST(count(*) AS BIGINT) FROM st
      |   WHERE chunk IS NOT NULL) AS n_kept_chunks,
      |  (SELECT CAST(64 * count(*) AS BIGINT) FROM st
      |   WHERE chunk IS NOT NULL) AS n_embed_floats"""
      .stripMargin

  /** q57 oracle: per-language trigram profiles inlined as list literals
    * (derived from the SAME LangMarkers the Scala operator uses).
    */
  private val langidNgramOracle = {
    def charTrigrams(s: String): Seq[String] =
      if (s.length < 3) Seq(s)
      else (0 to s.length - 3).map(i => s.substring(i, i + 3)).distinct
    val profiles = TextAnalysis.LangMarkers.toSeq.sortBy(_._1).map {
      case (lang, ws) => lang -> ws.flatMap(w => charTrigrams(" " + w + " ")).distinct
    }
    val hitExprs = profiles.map { case (lang, tris) =>
      val arr = tris.map(t => s"'$t'").mkString("[", ", ", "]")
      s"len(list_intersect(tg, $arr)) AS hits_$lang"
    }.mkString(",\n    ")
    val langs = profiles.map(_._1)
    val caseArms = langs.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"hits_$l >= hits_$o")
        .mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString("\n      ")
    val greatest = langs.map(l => s"hits_$l").mkString("greatest(", ", ", ")")
    s"""WITH toks AS (
       |  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\\s+') AS tk
       |  FROM documents),
       |tri AS (
       |  SELECT doc_id, lang, list_distinct(flatten(list_transform(tk,
       |    t -> CASE WHEN length(' ' || t || ' ') < 3 THEN [' ' || t || ' ']
       |      ELSE list_transform(generate_series(1, length(' ' || t || ' ') - 2),
       |        i -> substr(' ' || t || ' ', i, 3)) END))) AS tg
       |  FROM toks),
       |scored AS (
       |  SELECT doc_id, lang,
       |    $hitExprs
       |  FROM tri),
       |best AS (
       |  SELECT doc_id, lang,
       |    CASE
       |      $caseArms
       |    END AS predicted_lang_ngram,
       |    CAST($greatest AS INT) AS trigram_hits
       |  FROM scored)
       |SELECT lang, predicted_lang_ngram, count(*) AS n_docs,
       |  CAST(sum(trigram_hits) AS BIGINT) AS sum_hits
       |FROM best GROUP BY lang, predicted_lang_ngram""".stripMargin
  }

  /** q163: the q41 marker machinery extended per-doc with the Laplace
    * confidence, the 10-bin reliability table, and the ECE.
    */
  private val langidCalibrationOracle = {
    val markers = TextAnalysis.LangMarkers.toSeq.sortBy(_._1)
    val hitExprs = markers.map { case (lang, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(tk, x -> list_contains($arr, x))) AS hits_$lang"
    }.mkString(",\n    ")
    val langs = markers.map(_._1)
    val caseArms = langs.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"hits_$l >= hits_$o")
        .mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString("\n      ")
    val greatest = langs.map(l => s"hits_$l").mkString("greatest(", ", ", ")")
    val total = langs.map(l => s"hits_$l").mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\\s+') AS tk
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, lang,
       |    $hitExprs
       |  FROM toks),
       |best AS (
       |  SELECT doc_id, lang,
       |    CASE
       |      $caseArms
       |    END AS predicted_lang,
       |    CAST($greatest AS INT) AS marker_hits,
       |    CAST($total AS INT) AS total_hits
       |  FROM scored),
       |conf AS (
       |  SELECT marker_hits, total_hits,
       |    (marker_hits + 1) / (total_hits + ${langs.size}.0) AS lang_conf,
       |    predicted_lang = lang AS correct
       |  FROM best),
       |binned AS (
       |  SELECT least(CAST(floor(lang_conf * 10) AS INT), 9) AS bin,
       |    lang_conf, correct FROM conf),
       |tbl AS (
       |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |    avg(lang_conf) AS conf,
       |    avg(CASE WHEN correct THEN 1.0 ELSE 0.0 END) AS acc
       |  FROM binned GROUP BY bin),
       |e AS (SELECT sum(n * abs(acc - conf)) / sum(n) AS ece FROM tbl)
       |SELECT bin, n, round(conf, 6) AS conf, round(acc, 6) AS acc,
       |  round((SELECT ece FROM e), 6) AS ece
       |FROM tbl ORDER BY bin""".stripMargin
  }

  private val langidOracle = {
    // mirrors TextAnalysis.LangMarkers with first-max (alphabetical) ties
    val markers = TextAnalysis.LangMarkers.toSeq.sortBy(_._1)
    val hitExprs = markers.map { case (lang, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(tk, x -> list_contains($arr, x))) AS hits_$lang"
    }.mkString(",\n    ")
    val langs = markers.map(_._1)
    val caseArms = langs.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"hits_$l >= hits_$o")
        .mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString("\n      ")
    val greatest = langs.map(l => s"hits_$l").mkString("greatest(", ", ", ")")
    s"""WITH toks AS (
       |  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\\s+') AS tk
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, lang,
       |    $hitExprs
       |  FROM toks),
       |best AS (
       |  SELECT doc_id, lang,
       |    CASE
       |      $caseArms
       |    END AS predicted_lang,
       |    CAST($greatest AS INT) AS marker_hits
       |  FROM scored)
       |SELECT lang, predicted_lang, count(*) AS n_docs,
       |  CAST(sum(marker_hits) AS BIGINT) AS sum_hits
       |FROM best GROUP BY lang, predicted_lang""".stripMargin
  }

  /** Recursive-CTE re-derivation of the greedy chunker on single-space
    * text: each chunk breaks at the LAST space within chunkSize+1 chars
    * of the remaining text — exactly the reference splitter's greedy word
    * packing when every word fits (verified chunk-identical vs the Scala
    * chunker). 121 = chunkSize(120) + 1.
    */
  /** `WITH RECURSIVE` prefix computing the C1 chunker's output (`st`,
    * chunk rows where `chunk IS NOT NULL`) at a given chunk size.
    */
  private def chunkCteBody(chunkSize: Int, seedWhere: String = "") = {
    val lim = chunkSize + 1
    s"""st AS (
       |  SELECT doc_id, trim(text) || ' ' AS rest, -1 AS chunk_index,
       |         CAST(NULL AS VARCHAR) AS chunk
       |  FROM documents $seedWhere
       |  UNION ALL
       |  SELECT doc_id,
       |    substr(rest, brk + 2) AS rest,
       |    chunk_index + 1,
       |    substr(rest, 1, brk) AS chunk
       |  FROM (
       |    SELECT doc_id, rest, chunk_index,
       |      CASE WHEN length(rest) <= $lim THEN length(rest) - 1
       |           ELSE $lim - strpos(reverse(substr(rest, 1, $lim)), ' ')
       |      END AS brk
       |    FROM st WHERE length(rest) > 0)
       |  WHERE brk > 0)""".stripMargin
  }

  private def chunkCtePrefix(chunkSize: Int) =
    s"WITH RECURSIVE ${chunkCteBody(chunkSize)}"

  private def chunkCte(select: String, chunkSize: Int = 120) =
    s"""${chunkCtePrefix(chunkSize)}
       |$select
       |FROM st WHERE chunk IS NOT NULL""".stripMargin

  def oracles: Map[String, String] = Map(
    "q26_chunk_reassembly" ->
      """SELECT doc_id, trim(text) AS reassembled,
        |CAST(length(trim(text)) AS INT) AS reassembled_len
        |FROM documents""".stripMargin,
    "q27_chunks" -> chunkCte(
      "SELECT doc_id, chunk_index, CAST(length(chunk) AS INT) AS chunk_len, chunk AS text"),
    "q50_chunks_sql" -> chunkCte(
      "SELECT doc_id, chunk_index, CAST(length(chunk) AS INT) AS chunk_len"),
    "q30_dedup_exact" ->
      """SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,
    "q31_ngram_jaccard" -> jaccardOracle(),
    // n_exact is the same exact-pair count the q34 oracle enumerates;
    // the booleans pin the measured soundness/recall contract
    "q77_cosine_clustered" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_exact,
        |true AS sound_ok, true AS recall_ok
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
        |                       CAST(b.embedding AS DOUBLE[]))
        |  / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
        |                           CAST(a.embedding AS DOUBLE[])))
        |   * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
        |                           CAST(b.embedding AS DOUBLE[]))))
        |  >= 0.35""".stripMargin,
    "q34_embedding_pairs" ->
      """SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
        |round(
        |  list_dot_product(CAST(a.embedding AS DOUBLE[]),
        |                   CAST(b.embedding AS DOUBLE[]))
        |  / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
        |                           CAST(a.embedding AS DOUBLE[])))
        |   * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
        |                           CAST(b.embedding AS DOUBLE[])))), 6)
        |  AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
        |                       CAST(b.embedding AS DOUBLE[]))
        |  / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
        |                           CAST(a.embedding AS DOUBLE[])))
        |   * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
        |                           CAST(b.embedding AS DOUBLE[]))))
        |  >= 0.35""".stripMargin,
    "q35_knn_bruteforce" -> knnExactOracle,
    "q51_knn_topk_agg" -> knnExactOracle,
    // PQ scan + exact re-rank is output-identical to the exact kNN at
    // the certified (numSub=16, ksub=64, m=64) point — same oracle
    "q115_pq_ann" -> knnExactOracle,
    // the persisted-PQ serving path at the same certified point
    "q120_pq_persisted" -> knnExactOracle,
    // compression-signal invariants: bounds + doubling subadditivity
    // hold for every document
    "q122_compression_ratio" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |CAST(0 AS BIGINT) AS n_ratio_out_of_bounds,
        |CAST(0 AS BIGINT) AS n_superadditive
        |FROM documents""".stripMargin,
    // persisted IVF-PQ ≡ persisted float IVF (zero diff) + recall floor
    "q123_ivfpq_persisted" ->
      """SELECT CAST(4 * count(*) AS BIGINT) AS n_composed,
        |CAST(0 AS BIGINT) AS n_diff_ivf,
        |true AS recall_floor_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    // IVF-PQ composition: PQ-inside-lists ≡ float IVF (zero diff) and
    // the q68-style recall floor holds — 8 queries × k=4
    "q121_ivfpq_invariants" ->
      """SELECT CAST(4 * count(*) AS BIGINT) AS n_composed,
        |CAST(0 AS BIGINT) AS n_diff_ivf,
        |true AS recall_floor_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    // MMR invariants: counts derived from the table; the boolean
    // invariants (top-1 identity, candidate-subset, diversity-no-worse)
    // must all hold
    "q117_mmr_invariants" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |CAST(4 * count(*) AS BIGINT) AS n_rows,
        |CAST(0 AS BIGINT) AS top1_misses,
        |CAST(0 AS BIGINT) AS n_outside,
        |true AS diversity_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    // threshold retrieval: rank within top-10 BEFORE the score filter,
    // exactly the reference stack's filter-a-scored-list semantics
    "q118_threshold_retrieval" -> thresholdKnnOracle,
    // the quantized-served threshold mode returns the identical output
    // at the certified m ≥ k margin — same oracle as q118
    "q196_threshold_sq8" -> thresholdKnnOracle,
    // quantized-fetch MMR ≡ float-path MMR at the RAG surface: 5
    // queries × k=4 hits, zero symmetric difference
    "q195_mmr_quantized" ->
      """SELECT CAST(20 AS BIGINT) AS n_float,
        |CAST(0 AS BIGINT) AS n_diff""".stripMargin,
    // the identical md5-keyed permutation, replayed relationally
    "q119_global_shuffle" ->
      """SELECT doc_id, n_chars,
        |  CAST(row_number() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || '42'),
        |      doc_id) - 1 AS BIGINT) AS shuffle_pos
        |FROM documents""".stripMargin,
    // the persisted-LSH path at the recall-1.0 point is output-identical
    // to the exact scan — same oracle as q35/q51/q59
    "q67_lsh_persisted" -> knnExactOracle,
    "q68_ivf_persisted" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |CAST(4 * count(*) AS BIGINT) AS n_exact,
        |true AS lsh_persisted_ok, true AS ivf_persisted_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    // upsert ≡ rebuild at the recall-1.0 point: the post-upsert index
    // answers identically to an exact scan of the full vector set
    "q71_lsh_upsert" -> knnExactOracle,
    // naive query → optimizer → persisted index, still output-identical
    "q73_rewrite_persisted" -> knnExactOracle,
    // the aggregate-shape naive query re-planned onto the stored index
    // is still output-identical to the exact scan
    "q74_rewrite_topk_agg" -> knnExactOracle,
    // global-limit shape: exact top-4 pairs for the single query vector
    "q75_rewrite_global_limit" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, x.vec_id,
        |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                     CAST(x.embedding AS DOUBLE[]))
        |    / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                             CAST(q.embedding AS DOUBLE[])))
        |     * sqrt(list_dot_product(CAST(x.embedding AS DOUBLE[]),
        |                             CAST(x.embedding AS DOUBLE[]))))
        |    AS score
        |  FROM embeddings q CROSS JOIN embeddings x
        |  WHERE q.vec_id = 0)
        |SELECT query_id, vec_id, round(score, 6) AS score
        |FROM scored ORDER BY score DESC, vec_id ASC LIMIT 4""".stripMargin,
    "q72_ivf_upsert" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_vecs,
        |CAST(count(*) AS BIGINT) AS n_indexed,
        |true AS upsert_assign_complete, true AS upsert_assign_sound
        |FROM embeddings""".stripMargin,
    // q59's plan goes through the LSH ANN rewrite; hash-matching the SAME
    // exact-kNN oracle proves the rewrite is output-identical (recall 1.0)
    "q59_lsh_strategy" -> knnExactOracle,
    // q32's LSH pairs are exact-verified (soundness) and, in the
    // near-dup regime the banding is built for, complete with miss
    // probability ~1e-7 — the full exact-Jaccard oracle hash-matching
    // the LSH output proves both directions at once
    "q32_minhash_lsh" -> jaccardOracle(threshold = 0.5, capped = false),
    "q60_ann_recall" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |CAST(4 * count(*) AS BIGINT) AS n_exact,
        |true AS lsh_recall_ok, true AS ivf_recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    "q61_simhash_invariants" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |CAST(0 AS BIGINT) AS n_missed, CAST(0 AS BIGINT) AS n_extra
        |FROM documents""".stripMargin,
    // the exact-pair count is recomputed by DuckDB (non-circular); the
    // zero miss/extra counts assert LSH-mode == exact at threshold 0.9
    "q69_cosine_lsh_invariants" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_vecs,
        |(SELECT CAST(count(*) AS BIGINT)
        | FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        | WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
        |                        CAST(b.embedding AS DOUBLE[]))
        |   / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
        |                            CAST(a.embedding AS DOUBLE[])))
        |    * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
        |                            CAST(b.embedding AS DOUBLE[]))))
        |   >= 0.9) AS n_exact_pairs,
        |CAST(0 AS BIGINT) AS n_missed, CAST(0 AS BIGINT) AS n_extra
        |FROM embeddings""".stripMargin,
    "q62_hll_error" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        |count(DISTINCT l_suppkey) AS exact_supps,
        |count(DISTINCT l_orderkey) AS exact_orders,
        |true AS parts_ok, true AS supps_ok, true AS orders_ok
        |FROM lineitem""".stripMargin,
    // exact percentiles recomputed non-circularly; the rank-window
    // flags are the engine-side certification
    "q107_quantile_sketch" ->
      """SELECT l_returnflag,
        |round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_p50,
        |round(quantile_cont(l_extendedprice, 0.95), 6) AS exact_p95,
        |true AS p50_rank_ok, true AS p95_rank_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q64_bucketed_join" ->
      """SELECT label, count(*) AS n_vectors,
        |round(avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                                CAST(embedding AS DOUBLE[])))), 6)
        |  AS avg_norm
        |FROM embeddings GROUP BY label""".stripMargin,
    "q65_rag_invariants" ->
      s"""${chunkCtePrefix(200)}
        |SELECT CAST(q.query_id AS BIGINT) AS query_id,
        |  CAST(4 AS BIGINT) AS n_hits,
        |  true AS ranks_ok, true AS scores_monotonic,
        |  (SELECT CAST(count(*) AS BIGINT)
        |   FROM st WHERE chunk IS NOT NULL) AS n_index_chunks
        |FROM (VALUES (1), (2), (3), (4), (5)) AS q(query_id)""".stripMargin,
    "q66_dedup_pipeline" -> dedupPipelineOracle,
    "q63_fingerprint_check" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |count(DISTINCT text) AS n_distinct_texts,
        |count(DISTINCT text) AS n_distinct_full,
        |CAST(0 AS BIGINT) AS n_min_fp_inconsistent
        |FROM documents""".stripMargin,
    "q38_centroids" ->
      """SELECT label AS centroid_id, CAST(i - 1 AS INT) AS dim,
        |round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS mean_v
        |FROM embeddings, unnest(generate_series(1, 64)) AS u(i)
        |GROUP BY centroid_id, dim""".stripMargin,
    "q39_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |  AS sum_tokens,
        |round(avg(n_chars), 6) AS avg_chars,
        |CAST(sum(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END)
        |  AS BIGINT) AS n_len_mismatch
        |FROM documents GROUP BY lang""".stripMargin,
    "q40_quality" -> {
      val stop = TextAnalysis.Stopwords.map(w => s"'$w'")
        .mkString("[", ", ", "]")
      s"""WITH feats AS (
         |  SELECT source,
         |    len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
         |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |      x -> list_contains($stop, x))) AS DOUBLE)
         |      / len(string_split_regex(lower(trim(text)), '\\s+'))
         |      AS stopword_ratio,
         |    CAST(list_sum(list_transform(
         |      string_split_regex(lower(trim(text)), '\\s+'),
         |      x -> length(x))) AS DOUBLE)
         |      / len(string_split_regex(lower(trim(text)), '\\s+'))
         |      AS mean_tok_len,
         |    CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
         |      AS DOUBLE) / length(text) AS punct_ratio
         |  FROM documents),
         |scored AS (
         |  SELECT source, stopword_ratio, mean_tok_len,
         |    round(
         |      least(1.0, CAST(n_tokens AS DOUBLE) / 50.0) * 0.4 +
         |      (1.0 - least(1.0, punct_ratio * 5.0)) * 0.3 +
         |      least(1.0, stopword_ratio * 4.0) * 0.3, 6) AS quality_score
         |  FROM feats)
         |SELECT source, count(*) AS n_docs,
         |  round(avg(quality_score), 6) AS avg_quality,
         |  round(avg(stopword_ratio), 6) AS avg_stopword_ratio,
         |  round(avg(mean_tok_len), 6) AS avg_tok_len
         |FROM scored GROUP BY source""".stripMargin
    },
    "q41_langid" -> langidOracle,
    "q43_bpe_tokens" ->
      """SELECT lang,
        |CAST(sum(bpe) AS BIGINT) AS sum_bpe_tokens,
        |round(avg(bpe), 6) AS avg_bpe_tokens FROM (
        |  SELECT lang, list_sum(list_transform(
        |    string_split_regex(trim(text), '\s+'),
        |    x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS bpe
        |  FROM documents)
        |GROUP BY lang""".stripMargin,
    "q44_multimodal_meta" ->
      """SELECT doc_id AS media_id,
        |CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |substr(text, 1, 8) AS head8
        |FROM documents""".stripMargin,
    "q45_multimodal_decode" ->
      """SELECT doc_id AS media_id,
        |['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
        |CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |CAST(64 + octet_length(encode(text)) % 512 AS INT) AS width,
        |CAST(64 + (octet_length(encode(text)) // 7) % 512 AS INT) AS height,
        |CAST(CASE WHEN doc_id % 3 = 2
        |  THEN 1 + octet_length(encode(text)) % 30 ELSE 1 END AS INT)
        |  AS n_frames
        |FROM documents""".stripMargin,
    // closed-form ramp checksum: sum over (x, y) of (start + x + y) =
    // w·h·start + h·w(w−1)/2 + w·h(h−1)/2, ×3 channels; the per-byte
    // mean collapses to (2·start + w + h − 2)/2. Valid because
    // start + x + y < 256 at fixture dims (start ≤ 199, w ≤ 16, h ≤ 9).
    "q76_bmp_decode" ->
      """WITH dims AS (
        |  SELECT doc_id AS media_id,
        |    CAST(4 + length(text) % 13 AS INT) AS width,
        |    CAST(3 + length(text) % 7 AS INT) AS height,
        |    doc_id % 200 AS start
        |  FROM documents)
        |SELECT media_id, width, height,
        |  CAST(3 * (width * height * start
        |    + height * (width * (width - 1) // 2)
        |    + width * (height * (height - 1) // 2)) AS BIGINT) AS pixel_sum,
        |  round((2 * start + width + height - 2) / 2.0, 6) AS px_mean
        |FROM dims""".stripMargin,
    // PNG is lossless, so the q76 closed-form ramp oracle holds verbatim
    "q88_png_decode" ->
      """WITH dims AS (
        |  SELECT doc_id AS media_id,
        |    CAST(4 + length(text) % 13 AS INT) AS width,
        |    CAST(3 + length(text) % 7 AS INT) AS height,
        |    doc_id % 200 AS start
        |  FROM documents)
        |SELECT media_id, width, height,
        |  CAST(3 * (width * height * start
        |    + height * (width * (width - 1) // 2)
        |    + width * (height * (height - 1) // 2)) AS BIGINT) AS pixel_sum,
        |  round((2 * start + width + height - 2) / 2.0, 6) AS px_mean
        |FROM dims""".stripMargin,
    // closed-form ramp-waveform identities: per (frame f, channel c) the
    // sample is start+f+c, so sum = ch·(n·start + n(n−1)/2) + n·ch(ch−1)/2
    // and peak = start + n − 1 + ch − 1 (monotone ramp, no clipping)
    "q90_wav_decode" ->
      """WITH dims AS (
        |  SELECT doc_id AS media_id,
        |    CAST(1 + doc_id % 2 AS INT) AS channels,
        |    CAST(20 + length(text) % 50 AS BIGINT) AS n,
        |    doc_id % 50 AS start
        |  FROM documents)
        |SELECT media_id, channels, CAST(8000 AS INT) AS sample_rate,
        |  n AS n_samples,
        |  CAST(channels * (n * start + n * (n - 1) // 2)
        |    + n * (channels * (channels - 1) // 2) AS BIGINT) AS sample_sum,
        |  CAST(start + n - 1 + channels - 1 AS INT) AS peak,
        |  round(n / 8000.0, 6) AS duration_sec
        |FROM dims""".stripMargin,
    // closed-form container identities: every decoded field derives from
    // (doc_id, len) by the same arithmetic the encoder used
    "q98_mp4_decode" ->
      """WITH dims AS (
        |  SELECT doc_id AS media_id,
        |    (20 + length(text) % 50) * 60 AS units,
        |    CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END AS nv,
        |    CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END AS na,
        |    doc_id % 8 AS w8, doc_id % 6 AS h6
        |  FROM documents)
        |SELECT media_id, 'isom' AS brand, CAST(600 AS INT) AS timescale,
        |  CAST(nv + na AS INT) AS n_tracks, CAST(nv AS INT) AS n_video,
        |  CAST(na AS INT) AS n_audio,
        |  CAST(CASE WHEN nv = 1 THEN 160 + w8 * 16 ELSE 0 END AS INT)
        |    AS width,
        |  CAST(CASE WHEN nv = 1 THEN 120 + h6 * 16 ELSE 0 END AS INT)
        |    AS height,
        |  CAST(units * 1000 // 600 AS BIGINT) AS duration_ms
        |FROM dims""".stripMargin,
    // the oracle recomputes the repetition stats relationally (explode +
    // two-level aggregate) — an independent formulation of the per-row
    // sorted-fold the engine uses
    "q91_repetition_signals" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS ord
        |  FROM documents),
        |bi AS (
        |  SELECT a.doc_id, a.tok || ' ' || b.tok AS bigram
        |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1),
        |bstat AS (
        |  SELECT doc_id, count(*) AS n_bi,
        |         count(DISTINCT bigram) AS n_bi_distinct
        |  FROM bi GROUP BY doc_id),
        |wstat AS (
        |  SELECT doc_id, sum(c) AS n_tok, max(c) AS top_word_count FROM (
        |    SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
        |  ) GROUP BY doc_id)
        |SELECT w.doc_id, CAST(w.n_tok AS BIGINT) AS n_tok,
        |  round(w.top_word_count / w.n_tok, 6) AS top_word_frac,
        |  round(COALESCE(1.0 - b.n_bi_distinct / b.n_bi, 0.0), 6)
        |    AS dup_bigram_frac
        |FROM wstat w LEFT JOIN bstat b USING (doc_id)""".stripMargin,
    // the whole funnel replayed: NFC+regex normalize, the top-2-gram
    // coverage gate (rounded before the threshold, like the engine),
    // percentile trim over the SURVIVING population, min-id dedup
    "q140_curation_funnel" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |      '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', ' ', 'g'),
        |      '[ \t\n\r]+', ' ', 'g')) AS text
        |  FROM documents),
        |d AS (SELECT doc_id, text, string_split(text, ' ') AS l FROM n),
        |idx AS (
        |  SELECT doc_id, l, unnest(range(1, greatest(len(l) - 1, 0) + 1))
        |    AS i
        |  FROM d),
        |t2 AS (
        |  SELECT doc_id, max(c * length(g)) AS cov FROM (
        |    SELECT doc_id, array_to_string(l[i:i+1], ' ') AS g,
        |      count(*) AS c
        |    FROM idx GROUP BY doc_id, g)
        |  GROUP BY doc_id),
        |s1 AS (
        |  SELECT d.doc_id, d.text, len(d.l) AS n_tok
        |  FROM d LEFT JOIN t2 USING (doc_id)
        |  WHERE round(COALESCE(t2.cov, 0) / length(d.text), 6) <= 0.12),
        |q AS (SELECT quantile_cont(CAST(n_tok AS DOUBLE), 0.05) AS lo,
        |  quantile_cont(CAST(n_tok AS DOUBLE), 0.95) AS hi FROM s1),
        |s2 AS (SELECT s1.* FROM s1 CROSS JOIN q
        |  WHERE n_tok >= lo AND n_tok <= hi),
        |s3 AS (SELECT min(doc_id) AS doc_id, min(n_tok) AS n_tok
        |  FROM s2 GROUP BY text)
        |SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_in,
        |  CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_after_gopher,
        |  CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_after_trim,
        |  CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_after_dedup,
        |  CAST((SELECT sum(n_tok) FROM s3) AS BIGINT) AS kept_tokens""".stripMargin,
    // identical bucketing (clamped equal-width), identical Laplace
    // smoothing, identical PSI formula
    "q138_psi_drift" ->
      """WITH ref AS (
        |  SELECT least(15, greatest(0,
        |    CAST(floor(CAST(n_chars AS DOUBLE) / 40.0) AS INT)))
        |    AS bucket
        |  FROM documents WHERE doc_id % 2 = 0),
        |cur AS (
        |  SELECT least(15, greatest(0,
        |    CAST(floor(CAST(CAST(floor(n_chars * 1.2) AS BIGINT) AS DOUBLE)
        |      / 40.0) AS INT))) AS bucket
        |  FROM documents WHERE doc_id % 2 <> 0),
        |b AS (SELECT unnest(range(0, 16)) AS bucket),
        |rc AS (SELECT bucket, count(*) AS n_ref FROM ref GROUP BY 1),
        |cc AS (SELECT bucket, count(*) AS n_cur FROM cur GROUP BY 1),
        |j AS (
        |  SELECT b.bucket, COALESCE(rc.n_ref, 0) AS n_ref,
        |    COALESCE(cc.n_cur, 0) AS n_cur
        |  FROM b LEFT JOIN rc USING (bucket) LEFT JOIN cc USING (bucket)),
        |t AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM j),
        |sm AS (
        |  SELECT j.bucket, j.n_ref, j.n_cur,
        |    (j.n_ref + 0.5) / (t.t_ref + 8.0) AS p_ref,
        |    (j.n_cur + 0.5) / (t.t_cur + 8.0) AS p_cur
        |  FROM j CROSS JOIN t),
        |c AS (
        |  SELECT bucket, n_ref, n_cur, p_ref, p_cur,
        |    (p_cur - p_ref) * ln(p_cur / p_ref) AS contrib
        |  FROM sm),
        |tot AS (SELECT sum(contrib) AS psi_total FROM c)
        |SELECT c.bucket, CAST(c.n_ref AS BIGINT) AS n_ref,
        |  CAST(c.n_cur AS BIGINT) AS n_cur,
        |  round(c.p_ref, 6) AS p_ref, round(c.p_cur, 6) AS p_cur,
        |  round(c.contrib, 6) AS contrib,
        |  round(tot.psi_total, 6) AS psi
        |FROM c CROSS JOIN tot""".stripMargin,
    // plain per-group exact top-k, the certification's ground truth
    "q139_group_heavy_hitters" ->
      """WITH docs AS (
        |  SELECT lang, string_split(text, ' ') AS l FROM documents),
        |idx AS (
        |  SELECT lang, l, unnest(range(1, greatest(len(l) - 1, 0) + 1))
        |    AS i
        |  FROM docs),
        |cnt AS (
        |  SELECT lang, array_to_string(l[i:i+1], ' ') AS g,
        |    count(*) AS c
        |  FROM idx GROUP BY 1, 2),
        |r AS (
        |  SELECT lang, g, c,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY c DESC, g ASC) AS rank
        |  FROM cnt)
        |SELECT lang, CAST(rank AS INT) AS rank, g AS ngram,
        |  CAST(c AS BIGINT) AS cnt
        |FROM r WHERE rank <= 5""".stripMargin,
    "q136_length_trim" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok
        |  FROM documents),
        |q AS (SELECT quantile_cont(n_tok, 0.05) AS lo,
        |  quantile_cont(n_tok, 0.95) AS hi FROM m)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        |  round(lo, 6) AS p_lo, round(hi, 6) AS p_hi
        |FROM m CROSS JOIN q
        |WHERE n_tok >= lo AND n_tok <= hi""".stripMargin,
    // identical augmentation (combining acute = chr(769), angstrom
    // sign = chr(8491), BEL = chr(7)), NFC via nfc_normalize, same
    // regex steps in the shared Java-and-RE2 subset
    "q137_normalize_text" ->
      """WITH aug AS (
        |  SELECT doc_id, text || '  cafe' || chr(769) || '  ' ||
        |    chr(8491) || chr(7) || ' end' AS text
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |      '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', ' ', 'g'),
        |      '[ \t\n\r]+', ' ', 'g')) AS norm
        |  FROM aug)
        |SELECT doc_id, CAST(length(text) AS INT) AS n_raw,
        |  CAST(length(norm) AS INT) AS n_norm, md5(norm) AS norm_md5
        |FROM n""".stripMargin,
    // the q100 replay machinery with "duplicated" = "in the benchmark
    // shingle set" (q92's benchmark), minSpanTokens = n = 8
    "q135_decontaminate_spans" ->
      """WITH docs AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS l
        |  FROM documents),
        |bdocs AS (SELECT l[1:12] AS bl FROM docs WHERE doc_id % 97 = 0),
        |bidx AS (
        |  SELECT bl, unnest(range(1, greatest(len(bl) - 7, 0) + 1)) AS i
        |  FROM bdocs),
        |bench AS (
        |  SELECT DISTINCT array_to_string(bl[i:i+7], ' ') AS s
        |  FROM bidx),
        |sidx AS (
        |  SELECT doc_id, l,
        |         unnest(range(1, greatest(len(l) - 7, 0) + 1)) AS i
        |  FROM docs),
        |sh AS (
        |  SELECT doc_id, i, array_to_string(l[i:i+7], ' ') AS s
        |  FROM sidx),
        |ds AS (SELECT sh.doc_id, sh.i FROM sh JOIN bench USING (s)),
        |isl AS (
        |  SELECT doc_id, i,
        |         i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
        |           AS g
        |  FROM ds),
        |spans AS (
        |  SELECT doc_id, min(i) AS a, max(i) + 7 AS e
        |  FROM isl GROUP BY doc_id, g
        |  HAVING max(i) + 8 - min(i) >= 8),
        |cov AS (
        |  SELECT DISTINCT doc_id, unnest(range(a, e + 1)) AS pos
        |  FROM spans),
        |toks AS (
        |  SELECT doc_id, unnest(l) AS tok,
        |         generate_subscripts(l, 1) AS pos
        |  FROM docs),
        |reb AS (
        |  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos)
        |           AS cleaned,
        |         count(*) AS n_kept
        |  FROM toks t LEFT JOIN cov c
        |    ON t.doc_id = c.doc_id AND t.pos = c.pos
        |  WHERE c.pos IS NULL
        |  GROUP BY t.doc_id)
        |SELECT d.doc_id, COALESCE(r.cleaned, '') AS cleaned_text,
        |  CAST(len(d.l) AS BIGINT) AS n_tok,
        |  CAST(len(d.l) - COALESCE(r.n_kept, 0) AS BIGINT)
        |    AS n_removed_tok,
        |  CAST(length(d.text) - length(COALESCE(r.cleaned, ''))
        |    AS BIGINT) AS n_removed_chars
        |FROM docs d LEFT JOIN reb r USING (doc_id)""".stripMargin,
    // invariant closure (minhash not SQL-expressible): replayable doc
    // count + the three engine-verified flags
    "q134_incremental_neardup" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  true AS kept_le_in, true AS cross_clean, true AS replay_ok
        |FROM documents""".stripMargin,
    // digit-for-digit replay: 13 hex digits of md5(doc_id ":42") as a
    // 52-bit integer (exact in a double), ln(u)/w priority, top-50
    "q133_weighted_sample" ->
      """WITH h AS (
        |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
        |    md5(CAST(doc_id AS VARCHAR) || ':42') AS hx
        |  FROM documents WHERE n_chars > 0),
        |d AS (SELECT doc_id, w, hx, unnest(range(1, 14)) AS i FROM h),
        |v AS (
        |  SELECT doc_id, any_value(w) AS w,
        |    sum(CAST(strpos('0123456789abcdef', substr(hx, i, 1)) - 1
        |      AS BIGINT) * CAST(power(16, 13 - i) AS BIGINT)) AS hv
        |  FROM d GROUP BY doc_id),
        |p AS (
        |  SELECT doc_id,
        |    ln((hv + 0.5) / 4503599627370496.0) / w AS logpri
        |  FROM v),
        |sel AS (
        |  SELECT doc_id, logpri,
        |    row_number() OVER (ORDER BY logpri DESC, doc_id ASC) AS rank
        |  FROM p)
        |SELECT CAST(rank AS INT) AS rank, doc_id, round(logpri, 6)
        |  AS logpri
        |FROM sel WHERE rank <= 50""".stripMargin,
    // independent formulation on raw text (the engine hashes — the
    // q30 trade): per text, keep the min id of the earliest batch
    "q132_incremental_dedup" ->
      """WITH b AS (
        |  SELECT doc_id, text,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS batch
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, batch,
        |    row_number() OVER (PARTITION BY text ORDER BY batch, doc_id)
        |      AS rn
        |  FROM b)
        |SELECT doc_id, CAST(batch AS INT) AS batch FROM r
        |WHERE rn = 1""".stripMargin,
    // graph build + all 10 iterations replayed relationally; every CTE
    // MATERIALIZED (each iteration reads the previous one twice —
    // inlined CTEs would expand the chain exponentially)
    "q131_source_pagerank" -> {
      val head =
        """WITH docs AS (
          |  SELECT doc_id, source, string_split(text, ' ') AS l
          |  FROM documents),
          |idx AS (
          |  SELECT doc_id, source, l,
          |         unnest(range(1, greatest(len(l) - 7, 0) + 1)) AS i
          |  FROM docs),
          |sh AS (SELECT DISTINCT source, array_to_string(l[i:i+7], ' ') AS g
          |  FROM idx),
          |e AS MATERIALIZED (
          |  SELECT a.source AS src, b.source AS dst,
          |    CAST(count(*) AS DOUBLE) AS w
          |  FROM sh a JOIN sh b USING (g) WHERE a.source <> b.source
          |  GROUP BY 1, 2),
          |nodes AS MATERIALIZED (SELECT DISTINCT source FROM documents),
          |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n
          |  FROM nodes),
          |outw AS MATERIALIZED (SELECT src, sum(w) AS ow FROM e
          |  GROUP BY 1),
          |r0 AS MATERIALIZED (SELECT source, 1.0 / n AS r
          |  FROM nodes CROSS JOIN nn)""".stripMargin
      val its = (1 to 10).map { k =>
        s""",
           |r$k AS MATERIALIZED (
           |  SELECT n0.source,
           |    0.15 / nn.n + 0.85 * (COALESCE(c.contrib, 0) + dang.dm / nn.n)
           |      AS r
           |  FROM nodes n0
           |  CROSS JOIN nn
           |  CROSS JOIN (SELECT COALESCE(sum(p.r), 0) AS dm FROM r${k - 1} p
           |    LEFT JOIN outw o ON p.source = o.src WHERE o.src IS NULL) dang
           |  LEFT JOIN (SELECT e.dst AS source, sum(p.r * e.w / o.ow)
           |      AS contrib
           |    FROM r${k - 1} p JOIN e ON e.src = p.source
           |    JOIN outw o ON o.src = e.src
           |    GROUP BY 1) c ON c.source = n0.source)""".stripMargin
      }.mkString
      head + its + "\nSELECT source, round(r, 6) AS rank FROM r10"
    },
    // full relational replay: the q78 BM25 CTEs provide the run; qrels,
    // recall/MRR/DCG/ideal-DCG all recomputed in SQL
    "q128_ranking_metrics" ->
      s"""WITH $lexicalCtes,
        |dt AS (SELECT DISTINCT doc_id, tok FROM toks),
        |qrels AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS rel
        |  FROM qt JOIN dt USING (tok) GROUP BY 1, 2
        |  HAVING count(*) >= 2),
        |run AS (SELECT query_id, doc_id, rank FROM bm25_ranked
        |  WHERE rank <= 5),
        |hits AS (SELECT r.query_id, r.rank, COALESCE(q.rel, 0) AS rel
        |  FROM run r LEFT JOIN qrels q
        |    ON r.query_id = q.query_id AND r.doc_id = q.doc_id),
        |nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
        |  FROM qrels GROUP BY 1),
        |ideal AS (
        |  SELECT query_id, sum((pow(2, rel) - 1) / log2(irank + 1))
        |    AS idcg
        |  FROM (
        |    SELECT query_id, rel, row_number() OVER (PARTITION BY query_id
        |      ORDER BY rel DESC, doc_id ASC) AS irank
        |    FROM qrels)
        |  WHERE irank <= 5 GROUP BY 1),
        |allq AS (SELECT DISTINCT query_id FROM run
        |  UNION SELECT DISTINCT query_id FROM qrels),
        |per0 AS (SELECT query_id,
        |    sum(CASE WHEN rel > 0 THEN 1.0 ELSE 0 END) AS n_hit,
        |    max(CASE WHEN rel > 0 THEN 1.0 / rank ELSE 0 END) AS rr,
        |    sum(CASE WHEN rel > 0 THEN (pow(2, rel) - 1) / log2(rank + 1)
        |      ELSE 0 END) AS dcg
        |  FROM hits GROUP BY 1),
        |per AS (SELECT a.query_id, COALESCE(p.n_hit, 0) AS n_hit,
        |    COALESCE(p.rr, 0) AS rr, COALESCE(p.dcg, 0) AS dcg
        |  FROM allq a LEFT JOIN per0 p USING (query_id))
        |SELECT p.query_id, COALESCE(n.n_rel, 0) AS n_rel,
        |  round(CASE WHEN COALESCE(n.n_rel, 0) = 0 THEN 0
        |    ELSE p.n_hit / n.n_rel END, 6) AS recall_at_k,
        |  round(p.rr, 6) AS rr,
        |  round(CASE WHEN COALESCE(i.idcg, 0) = 0 THEN 0
        |    ELSE p.dcg / i.idcg END, 6) AS ndcg
        |FROM per p LEFT JOIN nrel n USING (query_id)
        |  LEFT JOIN ideal i USING (query_id)""".stripMargin,
    // invariant closure: the replayable halves (doc and positive-label
    // counts) computed exactly; the learning halves pinned as literals
    // (accuracy/loss bars the engine must clear or mismatch)
    "q127_quality_classifier" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN contains(' ' || text || ' ', ' table ')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  true AS acc_ok, true AS loss_ok
        |FROM documents""".stripMargin,
    // bit-exact Morton replay: same IEEE-double quantization, same
    // 32-term interleave (part key owns the odd/MSB bit positions)
    "q126_zorder_key" -> {
      val terms = (0 until 16).map(i =>
        s"(((qa >> $i) & 1) << ${2 * i + 1}) + (((qb >> $i) & 1) << ${2 * i})")
        .mkString(" + ")
      s"""WITH st AS (
         |  SELECT min(l_partkey) AS mnp, max(l_partkey) AS mxp,
         |         min(l_suppkey) AS mns, max(l_suppkey) AS mxs
         |  FROM lineitem),
         |q AS (
         |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |    CASE WHEN mxp = mnp THEN 0 ELSE CAST(floor(
         |      (l_partkey - mnp) * 65535.0 / (mxp - mnp)) AS BIGINT)
         |      END AS qa,
         |    CASE WHEN mxs = mns THEN 0 ELSE CAST(floor(
         |      (l_suppkey - mns) * 65535.0 / (mxs - mns)) AS BIGINT)
         |      END AS qb
         |  FROM lineitem CROSS JOIN st)
         |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |  CAST($terms AS BIGINT) AS zval
         |FROM q""".stripMargin
    },
    // the oracle is the naive exact top-k the sketch-pruned plan
    // certifiably equals: count EVERY trigram occurrence, rank by
    // (count desc, gram asc)
    "q125_heavy_hitters" ->
      """WITH docs AS (
        |  SELECT string_split(text, ' ') AS l FROM documents),
        |idx AS (
        |  SELECT l, unnest(range(1, greatest(len(l) - 1, 0) + 1)) AS i
        |  FROM docs),
        |cnt AS (
        |  SELECT array_to_string(l[i:i+1], ' ') AS g, count(*) AS c
        |  FROM idx GROUP BY g)
        |SELECT CAST(row_number() OVER (ORDER BY c DESC, g ASC) AS INT)
        |    AS rank,
        |  g AS ngram, CAST(c AS BIGINT) AS cnt
        |FROM cnt ORDER BY c DESC, g ASC LIMIT 20""".stripMargin,
    // the Zipf-stream twin: the oracle replays the harmonic-bucketing
    // token construction and counts every token exactly; the operator
    // must return the identical exact top-10 AND have certified it
    // against a NONZERO sketch delta (delta_has_teeth)
    "q147_heavy_hitters_zipf" ->
      """WITH toks AS (
        |  SELECT 'z' || CAST(4999 // ((d.doc_id * 16 + r.i) % 4999 + 1)
        |    AS VARCHAR) AS g
        |  FROM documents d
        |  CROSS JOIN (SELECT unnest(range(0, 16)) AS i) r),
        |cnt AS (SELECT g, count(*) AS c FROM toks GROUP BY g)
        |SELECT CAST(row_number() OVER (ORDER BY c DESC, g ASC) AS INT)
        |    AS rank,
        |  g AS ngram, CAST(c AS BIGINT) AS cnt, TRUE AS delta_has_teeth
        |FROM cnt ORDER BY c DESC, g ASC LIMIT 10""".stripMargin,
    // leakage-safe split: replay the exact-dup grouping (min doc_id
    // per text — the engine's hash two-phase is semantics-identical),
    // the md5 cumulative ladder (0.8 -> 'cccd', 0.9 -> 'e666'), and
    // the per-split counts; n_straddle = 0 is recomputed, not assumed
    "q148_group_split" ->
      """WITH grpd AS (
        |  SELECT d.doc_id, m.grp FROM documents d
        |  JOIN (SELECT text, min(doc_id) AS grp FROM documents
        |        GROUP BY text) m USING (text)),
        |asg AS (
        |  SELECT grp, CASE
        |    WHEN substring(md5(CAST(grp AS VARCHAR) || ':7'), 1, 4)
        |      < 'cccd' THEN 'train'
        |    WHEN substring(md5(CAST(grp AS VARCHAR) || ':7'), 1, 4)
        |      < 'e666' THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM grpd),
        |straddle AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_straddle FROM (
        |    SELECT grp FROM asg GROUP BY grp
        |    HAVING count(DISTINCT split) > 1))
        |SELECT split, CAST(count(DISTINCT grp) AS BIGINT) AS n_groups,
        |  CAST(count(*) AS BIGINT) AS n_rows, s.n_straddle
        |FROM asg CROSS JOIN straddle s
        |GROUP BY split, s.n_straddle""".stripMargin,
    // DSIR: both unigram LMs over the shared raw vocabulary, the
    // length-normalized log ratio, exp -> A-Res priority (the q133
    // 13-hex-digit md5 parse), top-25
    "q149_dsir_sample" ->
      """WITH toks AS (
        |  SELECT doc_id, tok FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents) WHERE tok <> ''),
        |tgt AS (
        |  SELECT t.doc_id, t.tok FROM toks t
        |  JOIN documents d USING (doc_id) WHERE d.lang = 'en'),
        |uniR AS (SELECT tok, count(*) AS cr FROM toks GROUP BY tok),
        |totR AS (SELECT sum(cr) AS nr, count(*) AS v FROM uniR),
        |uniT AS (SELECT tok, count(*) AS ct FROM tgt GROUP BY tok),
        |totT AS (SELECT sum(ct) AS nt FROM uniT),
        |lw AS (
        |  SELECT t.doc_id, round(avg(
        |    ln((coalesce(ut.ct, 0) + 0.1) / (tt.nt + 0.1 * tr.v))
        |    - ln((ur.cr + 0.1) / (tr.nr + 0.1 * tr.v))), 6) AS log_w
        |  FROM toks t
        |  JOIN uniR ur USING (tok)
        |  LEFT JOIN uniT ut USING (tok)
        |  CROSS JOIN totR tr CROSS JOIN totT tt
        |  GROUP BY t.doc_id),
        |h AS (
        |  SELECT doc_id, log_w, exp(log_w) AS w,
        |    md5(CAST(doc_id AS VARCHAR) || ':11') AS hx
        |  FROM lw),
        |dg AS (SELECT doc_id, unnest(range(1, 14)) AS i FROM h),
        |v AS (
        |  SELECT doc_id,
        |    sum(CAST(strpos('0123456789abcdef', substr(h.hx, dg.i, 1))
        |      - 1 AS BIGINT) * CAST(power(16, 13 - dg.i) AS BIGINT))
        |      AS hv
        |  FROM dg JOIN h USING (doc_id) GROUP BY doc_id),
        |p AS (
        |  SELECT h.doc_id, h.log_w,
        |    ln((v.hv + 0.5) / 4503599627370496.0) / h.w AS logpri
        |  FROM h JOIN v USING (doc_id) WHERE h.w > 0),
        |sel AS (
        |  SELECT doc_id, log_w,
        |    row_number() OVER (ORDER BY logpri DESC, doc_id ASC) AS rank
        |  FROM p)
        |SELECT CAST(rank AS INT) AS rank, doc_id, log_w
        |FROM sel WHERE rank <= 25""".stripMargin,
    // CCNet buckets: the q104 LM replay + per-language exact tercile
    // boundaries (quantile_cont == Spark's interpolated percentile,
    // the q136-proven equivalence) + the value-based bucket CASE
    "q150_ppl_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, tok, ord FROM (
        |    SELECT doc_id,
        |           unnest(string_split(text, ' ')) AS tok,
        |           generate_subscripts(string_split(text, ' '), 1) AS ord
        |    FROM documents) WHERE tok <> ''),
        |seq AS (
        |  SELECT doc_id, ord, tok,
        |         lag(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS prev
        |  FROM toks),
        |uni AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY tok),
        |tot AS (SELECT sum(c1) AS n_total, count(*) AS v_size FROM uni),
        |bi AS (SELECT prev, tok, count(*) AS c2 FROM seq
        |       WHERE prev IS NOT NULL GROUP BY prev, tok),
        |scored AS (
        |  SELECT s.doc_id,
        |    CASE WHEN s.prev IS NULL
        |      THEN (u.c1 + 0.1) / (t.n_total + 0.1 * t.v_size)
        |      ELSE 0.7 * ((b.c2 + 0.1) / (up.c1 + 0.1 * t.v_size))
        |         + 0.3 * ((u.c1 + 0.1) / (t.n_total + 0.1 * t.v_size))
        |    END AS p
        |  FROM seq s
        |  JOIN uni u ON s.tok = u.tok
        |  LEFT JOIN uni up ON s.prev = up.tok
        |  LEFT JOIN bi b ON s.prev = b.prev AND s.tok = b.tok
        |  CROSS JOIN tot t),
        |lm AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |    round(exp(-avg(ln(p))), 4) AS ppl
        |  FROM scored GROUP BY doc_id),
        |lang AS (
        |  SELECT l.doc_id, d.lang, l.n_tok, l.ppl
        |  FROM lm l JOIN documents d USING (doc_id)),
        |bounds AS (
        |  SELECT lang, quantile_cont(ppl, 1.0/3) AS p33,
        |    quantile_cont(ppl, 2.0/3) AS p66
        |  FROM lang GROUP BY lang)
        |SELECT g.doc_id, g.lang, g.n_tok, g.ppl,
        |  CASE WHEN g.ppl <= b.p33 THEN 'head'
        |       WHEN g.ppl <= b.p66 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM lang g JOIN bounds b USING (lang)
        |ORDER BY doc_id""".stripMargin,
    // the oracle recomputes the Gopher stats relationally: the same
    // span-degraded corpus, then a 9-way positional n-gram explode with
    // per-(doc, n, gram) counts — top coverage as max(count × chars),
    // duplicated coverage as distinct covered positions
    "q124_gopher_signals" ->
      """WITH docs0 AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS l0 FROM documents),
        |aug AS (
        |  SELECT doc_id, CASE WHEN doc_id % 3 = 0
        |    THEN text || ' ' || array_to_string(l0[1:8], ' ')
        |             || ' ' || array_to_string(l0[1:8], ' ')
        |    ELSE text END AS text FROM docs0),
        |docs AS (SELECT doc_id, text, string_split(text, ' ') AS l FROM aug),
        |ns AS (SELECT * FROM (VALUES (2),(3),(4),(5),(6),(7),(8),(9),(10))
        |  AS t(n)),
        |idx AS (
        |  SELECT doc_id, n, l,
        |         unnest(range(1, greatest(len(l) - n + 1, 0) + 1)) AS i
        |  FROM docs CROSS JOIN ns),
        |wins AS (
        |  SELECT doc_id, n, i, array_to_string(l[i:i+n-1], ' ') AS g
        |  FROM idx),
        |tops AS (
        |  SELECT doc_id, n, max(c * length(g)) AS cov FROM (
        |    SELECT doc_id, n, g, count(*) AS c FROM wins WHERE n <= 4
        |    GROUP BY doc_id, n, g)
        |  GROUP BY doc_id, n),
        |duppos AS (
        |  SELECT doc_id, n, unnest(range(i, i + n)) AS pos FROM (
        |    SELECT doc_id, n, i,
        |           count(*) OVER (PARTITION BY doc_id, n, g) AS c
        |    FROM wins WHERE n >= 5)
        |  WHERE c >= 2),
        |cover AS (
        |  SELECT doc_id, n, count(DISTINCT pos) AS cov FROM duppos
        |  GROUP BY doc_id, n),
        |base AS (SELECT doc_id, length(text) AS nc, len(l) AS nt FROM docs)
        |SELECT b.doc_id, CAST(b.nt AS BIGINT) AS n_tok,
        |  round(COALESCE(max(CASE WHEN t.n = 2 THEN t.cov END), 0) / b.nc, 6)
        |    AS top2_frac,
        |  round(COALESCE(max(CASE WHEN t.n = 3 THEN t.cov END), 0) / b.nc, 6)
        |    AS top3_frac,
        |  round(COALESCE(max(CASE WHEN t.n = 4 THEN t.cov END), 0) / b.nc, 6)
        |    AS top4_frac,
        |  round(COALESCE(max(CASE WHEN c.n = 5 THEN c.cov END), 0) / b.nt, 6)
        |    AS dup5_frac,
        |  round(COALESCE(max(CASE WHEN c.n = 6 THEN c.cov END), 0) / b.nt, 6)
        |    AS dup6_frac,
        |  round(COALESCE(max(CASE WHEN c.n = 7 THEN c.cov END), 0) / b.nt, 6)
        |    AS dup7_frac,
        |  round(COALESCE(max(CASE WHEN c.n = 8 THEN c.cov END), 0) / b.nt, 6)
        |    AS dup8_frac,
        |  round(COALESCE(max(CASE WHEN c.n = 9 THEN c.cov END), 0) / b.nt, 6)
        |    AS dup9_frac,
        |  round(COALESCE(max(CASE WHEN c.n = 10 THEN c.cov END), 0) / b.nt, 6)
        |    AS dup10_frac
        |FROM base b LEFT JOIN tops t USING (doc_id)
        |  LEFT JOIN cover c ON b.doc_id = c.doc_id
        |GROUP BY b.doc_id, b.nc, b.nt""".stripMargin,
    "q92_decontamination" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |idx AS (
        |  SELECT doc_id, l,
        |         unnest(range(1, greatest(len(l) - 7, 0) + 1)) AS i
        |  FROM docs),
        |sh AS (
        |  SELECT doc_id, array_to_string(l[i:i+7], ' ') AS shingle FROM idx),
        |bdocs AS (
        |  SELECT array_to_string(l[1:12], ' ') AS btext FROM docs
        |  WHERE doc_id % 97 = 0),
        |bl AS (SELECT string_split(btext, ' ') AS l FROM bdocs),
        |bidx AS (
        |  SELECT l, unnest(range(1, greatest(len(l) - 7, 0) + 1)) AS i
        |  FROM bl),
        |bench AS (
        |  SELECT DISTINCT array_to_string(l[i:i+7], ' ') AS shingle
        |  FROM bidx)
        |SELECT s.doc_id, count(DISTINCT s.shingle) AS n_hit
        |FROM sh s JOIN bench b USING (shingle)
        |GROUP BY s.doc_id""".stripMargin,
    // the PII patterns live in the Java∩RE2 regex subset, so the oracle
    // replays the identical redaction and md5-pins the exact output
    "q93_pii_redaction" ->
      """WITH pii AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or call 555-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' AS raw
        |  FROM documents),
        |red AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(raw,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
        |      AS n_emails,
        |    CAST(len(regexp_extract_all(raw, '\b555-\d{4}\b')) AS INT)
        |      AS n_phones,
        |    regexp_replace(regexp_replace(raw,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
        |      'g'), '\b555-\d{4}\b', '<PHONE>', 'g') AS redacted
        |  FROM pii)
        |SELECT doc_id, n_emails, n_phones,
        |  CAST(length(redacted) AS INT) AS red_len,
        |  md5(redacted) AS red_md5
        |FROM red""".stripMargin,
    // identical decision function: keep iff the first 4 hex digits of
    // md5(doc_id:text) sort below the stratum threshold
    "q94_stratified_sample" ->
      """WITH rates AS (
        |  SELECT * FROM (VALUES ('en', '2000'), ('es', '4000'),
        |    ('de', '8000'), ('fr', 'c000'), ('zh', 'zzzz')) AS t(lang, thresh))
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN rates r USING (lang)
        |WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || d.text), 1, 4)
        |  < r.thresh""".stripMargin,
    "q95_sequence_packing" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |packed AS (
        |  SELECT doc_id, source, n_tok,
        |    COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS start_off
        |  FROM toks)
        |SELECT doc_id, source, n_tok, CAST(start_off AS BIGINT) AS start_off,
        |  CAST(start_off // 512 AS BIGINT) AS first_seq,
        |  CAST((start_off + n_tok - 1) // 512 AS BIGINT) AS last_seq
        |FROM packed""".stripMargin,
    // independent formulation on the raw shingle STRINGS (the engine
    // hashes first — exchanges carry 8 bytes, not text; agreement up to
    // a ≈2⁻⁶⁴-per-pair xxhash64 collision, same trade as q30)
    "q99_dup_shingles" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |idx AS (
        |  SELECT doc_id, l,
        |         unnest(range(1, greatest(len(l) - 7, 0) + 1)) AS i
        |  FROM docs),
        |sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(l[i:i+7], ' ') AS s
        |  FROM idx),
        |dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
        |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  round(avg(CASE WHEN dfreq.df >= 2 THEN 1.0 ELSE 0.0 END), 6)
        |    AS dup_frac
        |FROM sh JOIN dfreq USING (s)
        |GROUP BY sh.doc_id""".stripMargin,
    // resize+crop closed form: the source ramp is linear per channel
    // (r=x+off, g=y+off, b=x+y+off), bilinear of a linear image is the
    // image at the mapped source point, and the 16x12→8x6 half-scale
    // mapping lands every sample at sx=2dx+0.5 / sy=2dy+0.5 (dyadic —
    // float-exact); after the (2,1)-offset 4x4 center crop the output
    // pixel (cx,cy) is exactly (2cx+5+off, 2cy+3+off, 2cx+2cy+7+off)
    "q102_image_preprocess" ->
      """WITH px AS (
        |  SELECT d.doc_id, CAST(d.doc_id % 100 AS INT) AS off,
        |         u1.cx, u2.cy
        |  FROM documents d,
        |       unnest(generate_series(0, 3)) AS u1(cx),
        |       unnest(generate_series(0, 3)) AS u2(cy))
        |SELECT doc_id AS media_id, 4 AS width, 4 AS height,
        |  CAST(sum((2 * cx + 5 + off) + (2 * cy + 3 + off)
        |    + (2 * cx + 2 * cy + 7 + off)) AS BIGINT) AS pixel_sum,
        |  round(CAST(sum((2 * cx + 5 + off) + (2 * cy + 3 + off)
        |    + (2 * cx + 2 * cy + 7 + off)) AS DOUBLE) / 48.0, 6)
        |    AS px_mean
        |FROM px GROUP BY doc_id""".stripMargin,
    // BPE training replay: the SAME 12 deterministic rounds, unrolled
    // as chained CTEs (pair count -> argmax with the identical
    // (cnt desc, lhs, rhs) tie-break -> sentinel-string replace);
    // generated by bpeOracle below
    "q101_bpe_merges" -> bpeOracle(12),
    // encode = the same unrolled training chain, final vocab joined
    // back to every doc's words
    "q106_bpe_encode" -> bpeEncodeOracle(12),
    // token sequences + decode round trip, same replayed merge chain
    "q169_bpe_tokens" -> bpeTokensOracle(12),
    // interleave order: both uniforms + the source-partitioned rank
    "q170_interleave_order" ->
      """WITH u AS (
        |  SELECT doc_id, source,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)
        |      || ':9'), 1, 13)) AS BIGINT) / 4503599627370496.0 AS u1
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY u1, doc_id) AS INT) AS rank_in_source
        |  FROM u)
        |SELECT doc_id, source, rank_in_source,
        |  round(CAST(concat('0x', substr(md5(source || ':' ||
        |    CAST(rank_in_source AS VARCHAR) || ':9'), 1, 13)) AS BIGINT)
        |    / 4503599627370496.0, 6) AS interleave_u
        |FROM r ORDER BY doc_id""".stripMargin,
    // KMV sketch replay: the k smallest distinct md5-52bit 3-gram
    // hashes per source ARE the sketch (pure function of the set);
    // estimator and honesty panel are plain arithmetic on top
    "q171_kmv_distinct" ->
      """WITH docs AS (
        |  SELECT source,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS l
        |  FROM documents),
        |g AS (
        |  SELECT source, array_to_string(l[i.i:i.i+2], ' ') AS gram
        |  FROM docs, unnest(range(1, len(l) - 1)) AS i(i)
        |  WHERE len(l) >= 3),
        |hd AS (
        |  SELECT DISTINCT source,
        |    CAST(concat('0x', substr(md5(gram || ':11'), 1, 13))
        |      AS BIGINT) AS h
        |  FROM g),
        |r AS (SELECT source, h,
        |  row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        |  FROM hd),
        |sk AS (SELECT source, CAST(count(*) AS INT) AS sk_size,
        |  max(h) AS h_max FROM r WHERE rn <= 128 GROUP BY source),
        |ex AS (SELECT source,
        |  CAST(count(DISTINCT gram) AS BIGINT) AS exact_distinct
        |  FROM g GROUP BY source),
        |e AS (SELECT source, sk_size, h_max,
        |  CASE WHEN sk_size < 128 THEN CAST(sk_size AS DOUBLE)
        |    ELSE 127.0 / (h_max / 4503599627370496.0) END AS est
        |  FROM sk)
        |SELECT e.source, sk_size, h_max, round(est, 6) AS est_distinct,
        |  exact_distinct,
        |  round(abs(est - exact_distinct) / exact_distinct, 6) AS rel_err
        |FROM e JOIN ex ON e.source = ex.source
        |ORDER BY e.source""".stripMargin,
    // KMV pair algebra replay: union sketch = k smallest of the merged
    // per-source sketches; Jaccard = shared fraction of the union
    // sketch; intersection = jaccard x union estimate
    "q172_kmv_overlap" ->
      """WITH docs AS (
        |  SELECT source,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS l
        |  FROM documents),
        |g AS (
        |  SELECT source, array_to_string(l[i.i:i.i+2], ' ') AS gram
        |  FROM docs, unnest(range(1, len(l) - 1)) AS i(i)
        |  WHERE len(l) >= 3),
        |hd AS (
        |  SELECT DISTINCT source,
        |    CAST(concat('0x', substr(md5(gram || ':11'), 1, 13))
        |      AS BIGINT) AS h
        |  FROM g),
        |r AS (SELECT source, h,
        |  row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        |  FROM hd),
        |sk AS (SELECT source, h FROM r WHERE rn <= 128),
        |szs AS (SELECT source, count(*) AS sz, max(h) AS hmax
        |  FROM sk GROUP BY source),
        |pairs AS (SELECT a.source AS sa, b.source AS sb
        |  FROM szs a JOIN szs b ON a.source < b.source),
        |u AS (SELECT p.sa, p.sb, s.h FROM pairs p
        |  JOIN sk s ON s.source IN (p.sa, p.sb)
        |  GROUP BY p.sa, p.sb, s.h),
        |ur AS (SELECT sa, sb, h,
        |  row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
        |  FROM u),
        |uk AS (SELECT sa, sb, h FROM ur WHERE rn <= 128),
        |uks AS (SELECT sa, sb, count(*) AS usz, max(h) AS uhmax
        |  FROM uk GROUP BY sa, sb),
        |inter AS (SELECT uk.sa, uk.sb, count(*) AS ic FROM uk
        |  JOIN sk x ON x.source = uk.sa AND x.h = uk.h
        |  JOIN sk y ON y.source = uk.sb AND y.h = uk.h
        |  GROUP BY uk.sa, uk.sb),
        |e AS (SELECT p.sa, p.sb,
        |  CASE WHEN a.sz < 128 THEN CAST(a.sz AS DOUBLE)
        |    ELSE 127.0 / (a.hmax / 4503599627370496.0) END AS est_a,
        |  CASE WHEN b.sz < 128 THEN CAST(b.sz AS DOUBLE)
        |    ELSE 127.0 / (b.hmax / 4503599627370496.0) END AS est_b,
        |  CASE WHEN u.usz < 128 THEN CAST(u.usz AS DOUBLE)
        |    ELSE 127.0 / (u.uhmax / 4503599627370496.0) END AS est_u,
        |  u.usz, coalesce(i.ic, 0) AS ic
        |  FROM pairs p
        |  JOIN szs a ON a.source = p.sa
        |  JOIN szs b ON b.source = p.sb
        |  JOIN uks u ON u.sa = p.sa AND u.sb = p.sb
        |  LEFT JOIN inter i ON i.sa = p.sa AND i.sb = p.sb)
        |SELECT sa AS grp_a, sb AS grp_b, CAST(usz AS INT) AS union_k,
        |  round(est_a, 6) AS est_a, round(est_b, 6) AS est_b,
        |  round(est_u, 6) AS est_union,
        |  round(ic / usz, 6) AS jaccard_est,
        |  round(ic / usz * est_u, 6) AS est_inter
        |FROM e ORDER BY grp_a, grp_b""".stripMargin,
    // PMI replay: same counts, one ln per distinct surviving bigram
    "q187_pmi_collocations" ->
      """WITH docs AS (SELECT list_filter(string_split(text, ' '),
        |    t -> t <> '') AS l FROM documents),
        |toks AS (SELECT u.tok FROM docs, unnest(l) AS u(tok)),
        |uni AS (SELECT tok, count(*) AS cu FROM toks GROUP BY tok),
        |nu AS (SELECT count(*) AS n_uni FROM toks),
        |bgs AS (SELECT array_to_string(l[i.i:i.i+1], ' ') AS bg
        |  FROM docs, unnest(range(1, len(l))) AS i(i)
        |  WHERE len(l) >= 2),
        |bgc AS (SELECT bg, count(*) AS c_ab FROM bgs GROUP BY bg
        |  HAVING count(*) >= 5),
        |nb AS (SELECT count(*) AS n_big FROM bgs),
        |j AS (SELECT b.bg, b.c_ab, ua.cu AS c_a, ub.cu AS c_b,
        |    round(ln((b.c_ab / nb.n_big)
        |      / ((ua.cu / nu.n_uni) * (ub.cu / nu.n_uni))), 6) AS pmi
        |  FROM bgc b
        |  JOIN uni ua ON ua.tok = string_split(b.bg, ' ')[1]
        |  JOIN uni ub ON ub.tok = string_split(b.bg, ' ')[2]
        |  CROSS JOIN nu CROSS JOIN nb)
        |SELECT bg, c_ab, c_a, c_b, pmi FROM j
        |ORDER BY pmi DESC, bg LIMIT 20""".stripMargin,
    // anomaly replay: identical cells, trailing sums, single-op moments
    "q188_anomaly_zscore" ->
      """WITH cells AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |j AS (SELECT a.event_type, a.d, a.c, count(*) AS nh,
        |    sum(b.c) AS sh, sum(b.c * b.c) AS sq
        |  FROM cells a JOIN cells b ON a.event_type = b.event_type
        |    AND date_diff('day', b.d, a.d) BETWEEN 1 AND 7
        |  GROUP BY 1, 2, 3 HAVING count(*) = 7),
        |z AS (SELECT event_type, d, c, sh / 7.0 AS mean,
        |    sqrt((sq - sh * sh / 7.0) / 6.0) AS sd
        |  FROM j)
        |SELECT event_type, strftime(d, '%Y-%m-%d') AS d, c,
        |  round(mean, 6) AS mean, round(sd, 6) AS sd,
        |  round(CASE WHEN sd > 0 THEN (c - mean) / sd ELSE 0.0 END, 6)
        |    AS z,
        |  (sd > 0 AND abs(CASE WHEN sd > 0 THEN (c - mean) / sd
        |    ELSE 0.0 END) > 2) AS flagged
        |FROM z ORDER BY event_type, d""".stripMargin,
    // k-anonymity replay: class sizes + the risk shares
    "q189_k_anonymity" ->
      """WITH cls AS (SELECT source, lang,
        |    CAST(floor(n_chars / 200.0) AS BIGINT) AS len_bucket,
        |    count(*) AS n
        |  FROM documents GROUP BY 1, 2, 3),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
        |    CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT)
        |      AS risk_rows
        |  FROM cls)
        |SELECT source, lang, len_bucket, n, n < 10 AS below_k,
        |  round(n / CAST(total AS DOUBLE), 6) AS share,
        |  round(risk_rows / CAST(total AS DOUBLE), 6)
        |    AS corpus_risk_share
        |FROM cls, tot ORDER BY source, lang, len_bucket""".stripMargin,
    // equi-depth replay: exact boundary ranks via row_number()
    "q185_equidepth_hist" ->
      s"""WITH $histSql
         |SELECT bucket, lo, hi, n_rows FROM hist ORDER BY bucket"""
        .stripMargin,
    // selectivity replay: same seeded thresholds, same integer
    // micro-row interpolation, exact counts
    "q186_range_selectivity" ->
      s"""WITH $histSql,
         |mnmx AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
         |  FROM orders),
         |preds AS (SELECT j.j AS pred_id,
         |    mn + (j.j * 37 % 64) * (mx - mn) / 64.0 AS x
         |  FROM unnest(range(12)) AS j(j), mnmx),
         |contrib AS (SELECT pred_id, x,
         |    CAST(floor(n_rows * CASE WHEN x >= hi THEN 1.0
         |      WHEN x < lo THEN 0.0
         |      WHEN hi > lo THEN (x - lo) / (hi - lo)
         |      ELSE 1.0 END * 1000000 + 0.5) AS BIGINT) AS cm
         |  FROM preds, hist),
         |e AS (SELECT pred_id, x, CAST(sum(cm) AS BIGINT) AS est_micro
         |  FROM contrib GROUP BY 1, 2),
         |act AS (SELECT pred_id,
         |    count(CASE WHEN o_totalprice <= x THEN 1 END) AS actual_rows
         |  FROM preds CROSS JOIN orders GROUP BY 1)
         |SELECT e.pred_id, round(e.x, 6) AS x, est_micro,
         |  round(est_micro / 1000000.0, 6) AS est_rows, actual_rows,
         |  round(abs(est_micro / 1000000.0 - actual_rows)
         |    / greatest(actual_rows, 1), 6) AS rel_err
         |FROM e JOIN act ON e.pred_id = act.pred_id
         |ORDER BY e.pred_id""".stripMargin,
    // join-planner replay: per side the same KMV NDV, the same
    // estimate formula from UNROUNDED ndv, exact join counts
    "q183_join_planner" -> Seq(
      ("customer_orders", "customer", "c_custkey", "orders", "o_custkey"),
      ("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
      ("part_lineitem", "part", "p_partkey", "lineitem", "l_partkey"))
      .map { case (n, ta, ka, tb, kb) => joinPlanOracle(n, ta, ka, tb, kb) }
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY join_name"),
    // snapshot-diff replay: the same mutation, change detection by
    // actual column comparison (IS DISTINCT FROM over every non-key
    // column) instead of fingerprints — a conflating hash would
    // mismatch here
    "q182_snapshot_diff" ->
      """WITH v2 AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
        |      ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
        |    o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 101 = 0),
        |d AS (SELECT
        |    coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |    CASE WHEN a.o_orderkey IS NULL THEN 'insert'
        |      WHEN b.o_orderkey IS NULL THEN 'delete'
        |      WHEN a.o_custkey IS DISTINCT FROM b.o_custkey
        |        OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |        OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |        OR a.o_orderdate IS DISTINCT FROM b.o_orderdate
        |        OR a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
        |      THEN 'update' ELSE 'unchanged' END AS op
        |  FROM orders a FULL OUTER JOIN v2 b
        |    ON a.o_orderkey = b.o_orderkey)
        |SELECT o_orderkey, op FROM d
        |WHERE op <> 'unchanged'
        |ORDER BY o_orderkey""".stripMargin,
    // IVM replay: the view recomputed DIRECTLY from v2 (the theorem
    // the incremental path must reproduce), deltas re-derived from the
    // classified change feed
    "q184_incremental_agg" ->
      """WITH v2 AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 31 = 0 THEN 'Z'
        |      ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
        |      ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
        |    o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 101 = 0),
        |direct AS (SELECT o_orderstatus, count(*) AS n_rows,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS sum_cents
        |  FROM v2 GROUP BY 1),
        |cls AS (SELECT
        |    coalesce(a.o_orderkey, b.o_orderkey) AS k1,
        |    CASE WHEN a.o_orderkey IS NULL THEN 'insert'
        |      WHEN b.o_orderkey IS NULL THEN 'delete'
        |      WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |        OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |      THEN 'update' ELSE 'unchanged' END AS op
        |  FROM orders a FULL OUTER JOIN v2 b
        |    ON a.o_orderkey = b.o_orderkey),
        |chg AS (SELECT k1, op FROM cls WHERE op <> 'unchanged'),
        |sgn AS (
        |  SELECT o.o_orderstatus, -1 AS sign, o.o_totalprice
        |  FROM orders o JOIN chg c ON o.o_orderkey = c.k1
        |    AND c.op IN ('delete', 'update')
        |  UNION ALL
        |  SELECT v.o_orderstatus, 1, v.o_totalprice
        |  FROM v2 v JOIN chg c ON v.o_orderkey = c.k1
        |    AND c.op IN ('insert', 'update')),
        |deltas AS (SELECT o_orderstatus,
        |    CAST(sum(sign) AS BIGINT) AS d_rows,
        |    CAST(sum(sign * CAST(floor(o_totalprice * 100 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS d_cents
        |  FROM sgn GROUP BY 1)
        |SELECT dd.o_orderstatus, n_rows, sum_cents,
        |  coalesce(d_rows, 0) AS d_rows, coalesce(d_cents, 0) AS d_cents
        |FROM direct dd LEFT JOIN deltas d
        |  ON dd.o_orderstatus = d.o_orderstatus
        |ORDER BY dd.o_orderstatus""".stripMargin,
    // decayed-mass replay: identical cells, identical integer weights
    "q181_decayed_counts" ->
      """WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS d FROM events),
        |mx AS (SELECT max(d) AS mxd FROM ev),
        |cells AS (SELECT event_type, date_diff('day', d, mxd) AS age,
        |    count(*) AS cnt
        |  FROM ev, mx GROUP BY 1, 2),
        |w AS (SELECT event_type, cnt,
        |    CAST(floor(pow(0.9, age) * 1000000) AS BIGINT) AS w09,
        |    CAST(floor(pow(0.5, age / 7.0) * 1000000) AS BIGINT) AS w05
        |  FROM cells),
        |agg AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_events,
        |    CAST(sum(cnt * w09) AS BIGINT) AS decayed_09_micro,
        |    CAST(sum(cnt * w05) AS BIGINT) AS decayed_w05_micro
        |  FROM w GROUP BY 1),
        |tot AS (SELECT sum(decayed_09_micro) AS t09 FROM agg)
        |SELECT event_type, n_events, decayed_09_micro, decayed_w05_micro,
        |  round(decayed_09_micro / CAST(t09 AS DOUBLE), 6) AS share_09
        |FROM agg, tot ORDER BY event_type""".stripMargin,
    // store replay: the DIRECT full-corpus sketch (q171's form, no
    // exact panel) — incremental batched ingest must reproduce it
    "q180_kmv_store" ->
      """WITH docs AS (
        |  SELECT source,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS l
        |  FROM documents),
        |g AS (
        |  SELECT source, array_to_string(l[i.i:i.i+2], ' ') AS gram
        |  FROM docs, unnest(range(1, len(l) - 1)) AS i(i)
        |  WHERE len(l) >= 3),
        |hd AS (
        |  SELECT DISTINCT source,
        |    CAST(concat('0x', substr(md5(gram || ':11'), 1, 13))
        |      AS BIGINT) AS h
        |  FROM g),
        |r AS (SELECT source, h,
        |  row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        |  FROM hd),
        |sk AS (SELECT source, CAST(count(*) AS INT) AS sk_size,
        |  max(h) AS h_max FROM r WHERE rn <= 128 GROUP BY source)
        |SELECT source, sk_size, h_max,
        |  round(CASE WHEN sk_size < 128 THEN CAST(sk_size AS DOUBLE)
        |    ELSE 127.0 / (h_max / 4503599627370496.0) END, 6)
        |    AS est_distinct
        |FROM sk ORDER BY source""".stripMargin,
    // A-not-B replay: per-source, rest-of-corpus, and global sketches
    // rebuilt from raw grams; membership arithmetic on the global
    // sketch; exact novelty = grams seen in exactly one source
    "q179_kmv_novelty" ->
      """WITH docs AS (
        |  SELECT source,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS l
        |  FROM documents),
        |g AS (
        |  SELECT source, array_to_string(l[i.i:i.i+4], ' ') AS gram
        |  FROM docs, unnest(range(1, len(l) - 3)) AS i(i)
        |  WHERE len(l) >= 5),
        |hd AS (
        |  SELECT DISTINCT source,
        |    CAST(concat('0x', substr(md5(gram || ':11'), 1, 13))
        |      AS BIGINT) AS h
        |  FROM g),
        |r AS (SELECT source, h,
        |  row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        |  FROM hd),
        |sk AS (SELECT source, h FROM r WHERE rn <= 128),
        |ar AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
        |  FROM (SELECT DISTINCT h FROM hd)),
        |ka AS (SELECT h FROM ar WHERE rn <= 128),
        |kstats AS (SELECT count(*) AS sz, max(h) AS hmax FROM ka),
        |srcs AS (SELECT DISTINCT source FROM hd),
        |resth AS (SELECT s.source AS grp, x.h FROM srcs s
        |  JOIN sk x ON x.source <> s.source GROUP BY 1, 2),
        |rr AS (SELECT grp, h,
        |  row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        |  FROM resth),
        |kr AS (SELECT grp, h FROM rr WHERE rn <= 128),
        |m AS (SELECT s.source, a.h,
        |    CASE WHEN x.h IS NOT NULL THEN 1 ELSE 0 END AS in_g,
        |    CASE WHEN y.h IS NOT NULL THEN 1 ELSE 0 END AS in_r
        |  FROM srcs s CROSS JOIN ka a
        |  LEFT JOIN sk x ON x.source = s.source AND x.h = a.h
        |  LEFT JOIN kr y ON y.grp = s.source AND y.h = a.h),
        |nov AS (SELECT source,
        |    count(CASE WHEN in_g = 1 AND in_r = 0 THEN 1 END)
        |      AS novel_in_k
        |  FROM m GROUP BY source),
        |est AS (SELECT sz, CASE WHEN sz < 128 THEN CAST(sz AS DOUBLE)
        |    ELSE 127.0 / (hmax / 4503599627370496.0) END AS est_all
        |  FROM kstats),
        |ex AS (SELECT src AS source, count(*) AS novel_exact FROM (
        |    SELECT gram, min(source) AS src
        |    FROM (SELECT DISTINCT source, gram FROM g)
        |    GROUP BY gram HAVING count(*) = 1)
        |  GROUP BY 1)
        |SELECT n.source, CAST(novel_in_k AS INT) AS novel_in_k,
        |  round(novel_in_k / CAST(sz AS DOUBLE) * est_all, 6)
        |    AS novel_est,
        |  coalesce(novel_exact, 0) AS novel_exact
        |FROM nov n LEFT JOIN ex ON n.source = ex.source CROSS JOIN est
        |ORDER BY n.source""".stripMargin,
    // CMS replay: every occupied cell rebuilt by the same md5 buckets,
    // probes take min over the d rows (absent cell = 0)
    "q177_cms_freq" ->
      """WITH docs AS (SELECT list_filter(string_split(text, ' '),
        |    t -> t <> '') AS l FROM documents),
        |toks AS (SELECT u.tok FROM docs, unnest(l) AS u(tok)),
        |tc AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        |top AS (SELECT tok, c FROM tc ORDER BY c DESC, tok LIMIT 20),
        |cells AS (SELECT j.j AS j,
        |    CAST(concat('0x', substr(md5(tok || ':' ||
        |      CAST(19 + j.j AS VARCHAR)), 1, 13)) AS BIGINT) % 64 AS b,
        |    count(*) AS cnt
        |  FROM toks, unnest(range(4)) AS j(j) GROUP BY 1, 2),
        |pr AS (SELECT t.tok, t.c, j.j AS j,
        |    CAST(concat('0x', substr(md5(t.tok || ':' ||
        |      CAST(19 + j.j AS VARCHAR)), 1, 13)) AS BIGINT) % 64 AS b
        |  FROM top t, unnest(range(4)) AS j(j)),
        |pe AS (SELECT tok, c, min(coalesce(cells.cnt, 0)) AS est
        |  FROM pr LEFT JOIN cells ON pr.j = cells.j AND pr.b = cells.b
        |  GROUP BY tok, c),
        |n AS (SELECT count(*) AS n_total FROM toks)
        |SELECT tok, c AS exact_cnt, est AS est_cnt, est >= c AS ge_ok,
        |  round(CAST(est - c AS DOUBLE) / n_total, 6) AS overshoot
        |FROM pe, n ORDER BY tok""".stripMargin,
    // CMS join-size replay: per-pair per-row cell inner products, min
    // over rows; exact panel from the vocabulary count frames
    "q178_cms_join_size" ->
      """WITH docs AS (SELECT source, list_filter(string_split(text, ' '),
        |    t -> t <> '') AS l FROM documents),
        |toks AS (SELECT source AS grp, u.tok FROM docs, unnest(l) AS u(tok)),
        |cells AS (SELECT grp, j.j AS j,
        |    CAST(concat('0x', substr(md5(tok || ':' ||
        |      CAST(23 + j.j AS VARCHAR)), 1, 13)) AS BIGINT) % 16 AS b,
        |    count(*) AS cnt
        |  FROM toks, unnest(range(4)) AS j(j) GROUP BY 1, 2, 3),
        |ip AS (SELECT a.grp AS grp_a, b2.grp AS grp_b, a.j,
        |    sum(a.cnt * b2.cnt) AS ip
        |  FROM cells a JOIN cells b2 ON a.j = b2.j AND a.b = b2.b
        |    AND a.grp < b2.grp
        |  GROUP BY 1, 2, 3),
        |estj AS (SELECT grp_a, grp_b, CAST(min(ip) AS BIGINT) AS est_join
        |  FROM ip GROUP BY 1, 2),
        |tc AS (SELECT grp, tok, count(*) AS c FROM toks GROUP BY 1, 2),
        |ex AS (SELECT a.grp AS grp_a, b2.grp AS grp_b,
        |    CAST(sum(a.c * b2.c) AS BIGINT) AS exact_join
        |  FROM tc a JOIN tc b2 ON a.tok = b2.tok AND a.grp < b2.grp
        |  GROUP BY 1, 2)
        |SELECT e.grp_a, e.grp_b, est_join, exact_join,
        |  est_join >= exact_join AS ge_ok,
        |  round(CAST(est_join - exact_join AS DOUBLE) / exact_join, 6)
        |    AS rel_overshoot
        |FROM estj e JOIN ex ON e.grp_a = ex.grp_a AND e.grp_b = ex.grp_b
        |ORDER BY e.grp_a, e.grp_b""".stripMargin,
    // zone-map replay: identical quantize → unrolled bit-interleave →
    // fixed-width bucket → min/max/count arithmetic
    "q175_zorder_zonemaps" -> zoneMapOracle(withPanel = false),
    // pruning-panel replay: the same seeded rectangles intersected
    // against the replayed zone maps + the exact hit counts
    "q176_zonemap_pruning" -> zoneMapOracle(withPanel = true),
    // sliding-distinct replay: the window sketch computed DIRECTLY
    // from raw rows (k smallest distinct hashes in the 7-day range) —
    // equality with Spark's pane-merge IS the mergeability certificate
    "q174_sliding_distinct" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS d, user_id FROM events),
        |days AS (SELECT DISTINCT d FROM ev),
        |h AS (SELECT DISTINCT d, CAST(concat('0x',
        |    substr(md5(CAST(user_id AS VARCHAR) || ':17'), 1, 13))
        |    AS BIGINT) AS h FROM ev),
        |win AS (SELECT w.d AS win_end, h.h FROM days w
        |  JOIN h ON h.d BETWEEN w.d - 6 AND w.d GROUP BY w.d, h.h),
        |r AS (SELECT win_end, h,
        |  row_number() OVER (PARTITION BY win_end ORDER BY h) AS rn
        |  FROM win),
        |sk AS (SELECT win_end, CAST(count(*) AS INT) AS sk_size,
        |  max(h) AS h_max FROM r WHERE rn <= 128 GROUP BY win_end),
        |ex AS (SELECT w.d AS win_end,
        |  count(DISTINCT e.user_id) AS exact_distinct,
        |  count(DISTINCT e.d) AS days_in_win
        |  FROM days w JOIN ev e ON e.d BETWEEN w.d - 6 AND w.d
        |  GROUP BY w.d),
        |e AS (SELECT s.win_end, sk_size, h_max,
        |  CASE WHEN sk_size < 128 THEN CAST(sk_size AS DOUBLE)
        |    ELSE 127.0 / (h_max / 4503599627370496.0) END AS est
        |  FROM sk s)
        |SELECT strftime(e.win_end, '%Y-%m-%d') AS win_end, days_in_win,
        |  sk_size, h_max, round(est, 6) AS est_distinct, exact_distinct,
        |  round(abs(est - exact_distinct) / exact_distinct, 6) AS rel_err
        |FROM e JOIN ex ON e.win_end = ex.win_end
        |ORDER BY win_end""".stripMargin,
    // per-column stats replay through the same canonical encodings
    "q173_column_stats" -> columnStatsOracle("lineitem", Seq(
      "l_orderkey" -> canonInt, "l_linenumber" -> canonInt,
      "l_quantity" -> canonDouble, "l_extendedprice" -> canonDouble,
      "l_returnflag" -> canonStr, "l_linestatus" -> canonStr,
      "l_shipdate" -> canonTs), 128, 13L),
    // fertility = the encode chain aggregated per language
    "q153_tokenizer_fertility" -> fertilityOracle(12),
    // the driver-side counts-formulation trainer replays the identical
    // greedy run — same oracle as q101
    "q110_bpe_local" -> bpeOracle(12),
    // truncated-dim serving on the front-loaded fixture is output-
    // identical to the exact kNN over the same transformed vectors
    "q111_mrl_frontloaded" -> knnFrontLoadedOracle,
    // ...and so is the truncate-then-quantize composition
    "q112_mrl_sq8" -> knnFrontLoadedOracle,
    // 1536-dim persisted PQ ≡ exact kNN over the group-structured
    // tiled fixture (the same float-rounded construction, replayed
    // verbatim: base = embedding of vec_id % (n/8), dim-0 perturbed by
    // (vec_id / (n/8))·0.03, tiles 1-23 decayed 0.9^j)
    "q146_pq1536_persisted" ->
      """WITH params AS (
        |  SELECT CAST(count(*) // 8 AS BIGINT) AS g FROM embeddings),
        |based AS (
        |  SELECT e.vec_id, e.vec_id // p.g AS p, r.embedding AS bemb
        |  FROM embeddings e CROSS JOIN params p
        |  JOIN embeddings r ON r.vec_id = e.vec_id % p.g),
        |tiled AS (
        |  SELECT vec_id,
        |    [CAST(bemb[1] + p * 0.03 AS FLOAT)]
        |    || list_transform(bemb[2:64], x -> CAST(x AS FLOAT))
        |    || flatten(list_transform(range(1, 24),
        |      j -> list_transform(bemb,
        |        x -> CAST(x * power(0.9, j) AS FLOAT)))) AS embedding
        |  FROM based),
        |scored AS (
        |  SELECT q.vec_id AS query_id, x.vec_id,
        |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                     CAST(x.embedding AS DOUBLE[]))
        |    / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                             CAST(q.embedding AS DOUBLE[])))
        |     * sqrt(list_dot_product(CAST(x.embedding AS DOUBLE[]),
        |                             CAST(x.embedding AS DOUBLE[]))))
        |    AS score
        |  FROM tiled q CROSS JOIN tiled x
        |  WHERE q.vec_id < 8),
        |ranked AS (
        |  SELECT query_id, vec_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, vec_id ASC) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, vec_id, round(score, 6) AS score
        |FROM ranked WHERE rank <= 4""".stripMargin,
    // langid calibration: marker hits, argmax, Laplace confidence,
    // 10-bin reliability table, and the ECE replayed end to end
    "q163_langid_calibration" -> langidCalibrationOracle,
    // composed IVF-BQ: identity to the float-IVF path (n_diff = 0) and
    // the exact-recall floor, engine-verified; counts are the panel's
    // replayable half (8 queries × k=4)
    "q168_ivfbq_composed" ->
      """SELECT CAST(32 AS BIGINT) AS n_bq,
        |CAST(0 AS BIGINT) AS n_diff_float, true AS recall_ok"""
        .stripMargin,
    // incremental line dedup: both batches' df arithmetic (own-only
    // for batch 1, accumulated for batch 2) + every rewrite replayed
    "q167_line_dedup_store" ->
      """WITH d0 AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS t
        |  FROM documents),
        |aug AS (
        |  SELECT doc_id, list_prepend(
        |      '== site banner :: ' || source || ' ==',
        |      list_transform(
        |        range(0, CAST(floor((len(t) - 1) / 8.0) AS INT) + 1),
        |        i -> array_to_string(t[i*8+1:i*8+8], ' '))) AS lines
        |  FROM d0),
        |ln AS (
        |  SELECT doc_id, unnest(lines) AS line,
        |         generate_subscripts(lines, 1) AS pos
        |  FROM aug),
        |df1 AS (
        |  SELECT line, count(DISTINCT doc_id) AS df FROM ln
        |  WHERE trim(line) <> '' AND doc_id % 2 = 0 GROUP BY line),
        |df2 AS (
        |  SELECT line, count(DISTINCT doc_id) AS df FROM ln
        |  WHERE trim(line) <> '' AND doc_id % 2 = 1 GROUP BY line),
        |mark AS (
        |  SELECT ln.doc_id, ln.pos, ln.line,
        |    CASE WHEN trim(ln.line) = '' THEN false
        |         WHEN ln.doc_id % 2 = 0 THEN COALESCE(f1.df, 0) > 4
        |         ELSE COALESCE(f1.df, 0) + COALESCE(f2.df, 0) > 4
        |    END AS is_cut
        |  FROM ln LEFT JOIN df1 f1 ON ln.line = f1.line
        |          LEFT JOIN df2 f2 ON ln.line = f2.line)
        |SELECT CAST(doc_id % 2 + 1 AS INT) AS batch, doc_id,
        |  COALESCE(string_agg(CASE WHEN NOT is_cut THEN line END,
        |    chr(10) ORDER BY pos), '') AS text,
        |  CAST(sum(CASE WHEN trim(line) <> '' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN is_cut THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_cut
        |FROM mark GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // rotated search: the PLAIN exact kNN — matching proves the
    // eigenbasis rotation an exact isometry (no rotated replay needed)
    "q164_rotated_knn" -> knnExactOracle,
    // bootstrap CI: the q128 metric CTEs + Poisson weights from the
    // shared inverse-CDF thresholds + nearest-rank selection replayed
    "q166_bootstrap_ci" -> {
      val cs = graft.operators.Evaluation.PoissonCum
      val caseArms = cs.zipWithIndex
        .map { case (t, k) => s"WHEN u < $t THEN $k" }
        .mkString("\n      ")
      s"""WITH $lexicalCtes,
        |dt AS (SELECT DISTINCT doc_id, tok FROM toks),
        |qrels AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS rel
        |  FROM qt JOIN dt USING (tok) GROUP BY 1, 2
        |  HAVING count(*) >= 2),
        |run AS (SELECT query_id, doc_id, rank FROM bm25_ranked
        |  WHERE rank <= 5),
        |hits AS (SELECT r.query_id, r.rank, COALESCE(q.rel, 0) AS rel
        |  FROM run r LEFT JOIN qrels q
        |    ON r.query_id = q.query_id AND r.doc_id = q.doc_id),
        |nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
        |  FROM qrels GROUP BY 1),
        |allq AS (SELECT DISTINCT query_id FROM run
        |  UNION SELECT DISTINCT query_id FROM qrels),
        |per0 AS (SELECT query_id,
        |    sum(CASE WHEN rel > 0 THEN 1.0 ELSE 0 END) AS n_hit
        |  FROM hits GROUP BY 1),
        |metrics AS (SELECT a.query_id,
        |    round(CASE WHEN COALESCE(n.n_rel, 0) = 0 THEN 0
        |      ELSE COALESCE(p.n_hit, 0) / n.n_rel END, 6) AS m
        |  FROM allq a LEFT JOIN per0 p USING (query_id)
        |    LEFT JOIN nrel n USING (query_id)),
        |reps AS (
        |  SELECT query_id, m, unnest(range(0, 200)) AS rep
        |  FROM metrics),
        |uu AS (
        |  SELECT rep, m,
        |    CAST(concat('0x', substr(md5(CAST(query_id AS VARCHAR)
        |      || ':' || CAST(rep AS VARCHAR) || ':7'), 1, 13))
        |      AS BIGINT) / 4503599627370496.0 AS u
        |  FROM reps),
        |ww AS (SELECT rep, m,
        |    CASE
        |      $caseArms
        |      ELSE ${cs.length} END AS w
        |  FROM uu),
        |ests AS (SELECT rep, round(sum(w * m) / sum(w), 9) AS est
        |  FROM ww GROUP BY rep HAVING sum(w) > 0),
        |rk AS (SELECT est, rep,
        |    row_number() OVER (ORDER BY est, rep) AS r,
        |    count(*) OVER () AS b_eff
        |  FROM ests),
        |sel AS (SELECT b_eff, min(est) AS lo, max(est) AS hi FROM rk
        |  WHERE r = greatest(1, CAST(ceil(0.025 * b_eff) AS BIGINT))
        |     OR r = CAST(ceil(0.975 * b_eff) AS BIGINT)
        |  GROUP BY b_eff),
        |pt AS (SELECT avg(m) AS point FROM metrics)
        |SELECT round(pt.point, 6) AS point, round(sel.lo, 6) AS ci_lo,
        |  round(sel.hi, 6) AS ci_hi, CAST(sel.b_eff AS BIGINT) AS b_eff
        |FROM sel CROSS JOIN pt""".stripMargin
    },
    // OPQ recovery: exact kNN over the front-loaded (0.8^i) vectors —
    // the mix and the recovered rotation are both isometries, so the
    // truncated search in the recovered basis must reproduce it
    "q165_opq_recovery" ->
      """WITH fl AS (
        |  SELECT vec_id,
        |    list_transform(range(1, len(embedding) + 1), i ->
        |      CAST(embedding[i] * power(0.8, i - 1) AS FLOAT))
        |      AS embedding
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, x.vec_id,
        |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                     CAST(x.embedding AS DOUBLE[]))
        |    / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                             CAST(q.embedding AS DOUBLE[])))
        |     * sqrt(list_dot_product(CAST(x.embedding AS DOUBLE[]),
        |                             CAST(x.embedding AS DOUBLE[]))))
        |    AS score
        |  FROM fl q CROSS JOIN fl x
        |  WHERE q.vec_id < 8),
        |ranked AS (
        |  SELECT query_id, vec_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, vec_id ASC) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, vec_id, round(score, 6) AS score
        |FROM ranked WHERE rank <= 4""".stripMargin,
    // filtered retrieval: exact top-4 among even-label vectors only
    "q113_filtered_knn" -> knnFilteredOracle,
    // the filtered SQ8-served path returns the identical output
    "q114_filtered_sq8" -> knnFilteredOracle,
    // the SQ8 scan + exact re-rank is output-identical to the exact
    // scan at the shipped (k=4, m=32) point — same oracle as q35/q67
    "q103_sq8_ann" -> knnExactOracle,
    // the persisted SQ8 path serves the identical output
    "q105_sq8_persisted" -> knnExactOracle,
    // delete semantics: exact kNN over the index MINUS the tombstoned
    // ids (the 8 query vectors) — every surviving hit re-ranked
    "q116_sq8_delete" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, x.vec_id,
        |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                     CAST(x.embedding AS DOUBLE[]))
        |    / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                             CAST(q.embedding AS DOUBLE[])))
        |     * sqrt(list_dot_product(CAST(x.embedding AS DOUBLE[]),
        |                             CAST(x.embedding AS DOUBLE[]))))
        |    AS score
        |  FROM embeddings q CROSS JOIN embeddings x
        |  WHERE q.vec_id < 8 AND x.vec_id >= 8),
        |ranked AS (
        |  SELECT query_id, vec_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, vec_id ASC) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, vec_id, round(score, 6) AS score
        |FROM ranked WHERE rank <= 4""".stripMargin,
    // composed IVF-SQ8: SQ8-inside-lists ≡ float IVF (zero diff) and
    // the q68 recall floor holds — 8 queries × k=4
    "q109_ivfsq8_persisted" ->
      """SELECT CAST(4 * count(*) AS BIGINT) AS n_composed,
        |CAST(0 AS BIGINT) AS n_diff_ivf,
        |true AS recall_floor_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    // DELETE on the composed layouts: tombstone-filtered composed ≡
    // float IVF over the survivors (zero diff), no deleted id served,
    // recall floor vs the exact kNN over survivors — 8 queries × k=4
    "q141_ivfsq8_delete" ->
      """SELECT CAST(4 * count(*) AS BIGINT) AS n_composed,
        |CAST(0 AS BIGINT) AS n_diff_ivf,
        |CAST(0 AS BIGINT) AS n_deleted_hits,
        |true AS recall_floor_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    "q142_ivfpq_delete" ->
      """SELECT CAST(4 * count(*) AS BIGINT) AS n_composed,
        |CAST(0 AS BIGINT) AS n_diff_ivf,
        |CAST(0 AS BIGINT) AS n_deleted_hits,
        |true AS recall_floor_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    // FILTERED search on the composed layouts: pre-filter composed ≡
    // float IVF over the same filtered lists (zero diff), every hit
    // inside the filter, recall floor vs the filtered exact kNN
    "q143_ivfsq8_filtered" ->
      """SELECT CAST(4 * count(*) AS BIGINT) AS n_composed,
        |CAST(0 AS BIGINT) AS n_diff_ivf,
        |CAST(0 AS BIGINT) AS n_outside_filter,
        |true AS recall_floor_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    "q144_ivfpq_filtered" ->
      """SELECT CAST(4 * count(*) AS BIGINT) AS n_composed,
        |CAST(0 AS BIGINT) AS n_diff_ivf,
        |CAST(0 AS BIGINT) AS n_outside_filter,
        |true AS recall_floor_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    // LM retraining replay: identical add-α interpolated bigram model
    // (α=0.1, λ=0.7) trained and scored relationally — unigram/bigram
    // count CTEs, lag() for the previous token, the same first-token
    // unigram-only rule
    "q104_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, tok, ord FROM (
        |    SELECT doc_id,
        |           unnest(string_split(text, ' ')) AS tok,
        |           generate_subscripts(string_split(text, ' '), 1) AS ord
        |    FROM documents) WHERE tok <> ''),
        |seq AS (
        |  SELECT doc_id, ord, tok,
        |         lag(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS prev
        |  FROM toks),
        |uni AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY tok),
        |tot AS (SELECT sum(c1) AS n_total, count(*) AS v_size FROM uni),
        |bi AS (SELECT prev, tok, count(*) AS c2 FROM seq
        |       WHERE prev IS NOT NULL GROUP BY prev, tok),
        |scored AS (
        |  SELECT s.doc_id,
        |    CASE WHEN s.prev IS NULL
        |      THEN (u.c1 + 0.1) / (t.n_total + 0.1 * t.v_size)
        |      ELSE 0.7 * ((b.c2 + 0.1) / (up.c1 + 0.1 * t.v_size))
        |         + 0.3 * ((u.c1 + 0.1) / (t.n_total + 0.1 * t.v_size))
        |    END AS p
        |  FROM seq s
        |  JOIN uni u ON s.tok = u.tok
        |  LEFT JOIN uni up ON s.prev = up.tok
        |  LEFT JOIN bi b ON s.prev = b.prev AND s.tok = b.tok
        |  CROSS JOIN tot t)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |  round(-avg(ln(p)), 6) AS cross_entropy,
        |  round(exp(-avg(ln(p))), 4) AS ppl
        |FROM scored GROUP BY doc_id""".stripMargin,
    // span-removal oracle on the raw shingle STRINGS (q99 discipline):
    // replays the gaps-and-islands run grouping, the >=16-token span
    // filter, the coverage cut, and the ordered rebuild relationally
    "q100_dup_span_removal" ->
      """WITH docs AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS l
        |  FROM documents),
        |sidx AS (
        |  SELECT doc_id, l,
        |         unnest(range(1, greatest(len(l) - 7, 0) + 1)) AS i
        |  FROM docs),
        |sh AS (
        |  SELECT doc_id, i, array_to_string(l[i:i+7], ' ') AS s
        |  FROM sidx),
        |dup AS (
        |  SELECT s FROM (SELECT DISTINCT doc_id, s FROM sh)
        |  GROUP BY s HAVING count(*) >= 2),
        |ds AS (SELECT sh.doc_id, sh.i FROM sh JOIN dup USING (s)),
        |isl AS (
        |  SELECT doc_id, i,
        |         i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
        |           AS g
        |  FROM ds),
        |spans AS (
        |  SELECT doc_id, min(i) AS a, max(i) + 7 AS e
        |  FROM isl GROUP BY doc_id, g
        |  HAVING max(i) + 8 - min(i) >= 16),
        |cov AS (
        |  SELECT DISTINCT doc_id, unnest(range(a, e + 1)) AS pos
        |  FROM spans),
        |toks AS (
        |  SELECT doc_id, unnest(l) AS tok,
        |         generate_subscripts(l, 1) AS pos
        |  FROM docs),
        |reb AS (
        |  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos)
        |           AS cleaned,
        |         count(*) AS n_kept
        |  FROM toks t LEFT JOIN cov c
        |    ON t.doc_id = c.doc_id AND t.pos = c.pos
        |  WHERE c.pos IS NULL
        |  GROUP BY t.doc_id)
        |SELECT d.doc_id, COALESCE(r.cleaned, '') AS cleaned_text,
        |  CAST(len(d.l) AS BIGINT) AS n_tok,
        |  CAST(len(d.l) - COALESCE(r.n_kept, 0) AS BIGINT)
        |    AS n_removed_tok,
        |  CAST(length(d.text) - length(COALESCE(r.cleaned, ''))
        |    AS BIGINT) AS n_removed_chars
        |FROM docs d LEFT JOIN reb r USING (doc_id)""".stripMargin,
    // identical arithmetic: T* = min(n_tok/share) over the joined frame,
    // rate = round(min(1, share·T*/n_tok), 6), exp_tok from the ROUNDED
    // rate — double math matches Spark's
    "q96_mixture_plan" ->
      """WITH stats AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
        |  FROM documents GROUP BY lang),
        |shares AS (
        |  SELECT * FROM (VALUES ('en', 0.4), ('es', 0.15), ('de', 0.15),
        |    ('fr', 0.15), ('zh', 0.15)) AS t(lang, target_share)),
        |j AS (SELECT * FROM stats JOIN shares USING (lang)),
        |ts AS (SELECT min(n_tok / target_share) AS t_star FROM j)
        |SELECT lang, n_docs, n_tok, target_share,
        |  round(least(1.0, target_share * ts.t_star / n_tok), 6) AS rate,
        |  CAST(round(round(least(1.0, target_share * ts.t_star / n_tok), 6)
        |    * n_tok, 0) AS BIGINT) AS exp_tok
        |FROM j, ts""".stripMargin,
    "q97_vocab_coverage" ->
      """WITH words AS (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |counts AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
        |  FROM words GROUP BY word),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_tok FROM counts),
        |top AS (SELECT word, cnt FROM counts
        |        ORDER BY cnt DESC, word ASC LIMIT 100)
        |SELECT
        |  CAST(row_number() OVER (ORDER BY cnt DESC, word ASC) AS INT)
        |    AS rank,
        |  word, cnt,
        |  round(CAST(sum(cnt) OVER (ORDER BY cnt DESC, word ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / t.total_tok, 6) AS cum_frac
        |FROM top, tot t""".stripMargin,
    "q53_dedup_clusters" -> clustersOracle,
    // the alternating-CC path must be output-identical to the
    // propagation path — same oracle as q53
    "q80_cc_logrounds" -> clustersOracle,
    // leakage-free split: the closure's min-id rep, then the rep's
    // md5-52bit integer bucket mod 10 (<8 train, =8 val, =9 test) —
    // every arithmetic step replayed
    "q211_leakage_free_split" ->
      s"""WITH RECURSIVE $jaccardCtes,
        |$reachCtes,
        |lab AS (SELECT a AS doc_id, least(a, min(b)) AS rep
        |  FROM reach GROUP BY a),
        |r AS (SELECT d.doc_id,
        |    CAST(coalesce(lab.rep, d.doc_id) AS BIGINT) AS rep_id
        |  FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id),
        |hx AS (SELECT doc_id, rep_id,
        |    md5(CAST(rep_id AS VARCHAR) || ':77') AS h FROM r),
        |dg AS (SELECT doc_id, rep_id, h, unnest(range(1, 14)) AS i
        |  FROM hx),
        |hv AS (SELECT doc_id, any_value(rep_id) AS rep_id,
        |    sum(CAST(strpos('0123456789abcdef', substr(h, i, 1)) - 1
        |      AS BIGINT) * CAST(power(16, 13 - i) AS BIGINT)) AS hv
        |  FROM dg GROUP BY doc_id)
        |SELECT doc_id, rep_id,
        |  CASE WHEN hv % 10 < 8 THEN 'train'
        |       WHEN hv % 10 = 8 THEN 'val' ELSE 'test' END AS split
        |FROM hv ORDER BY doc_id""".stripMargin,
    "q78_bm25_topk" -> bm25Oracle,
    // block-max WAND is output-identical to exhaustive BM25 — the
    // STRONGEST possible gate: the same oracle hashes the pruned rows
    "q240_bm25_wand" -> bm25Oracle,
    // WAND soundness: exhaustive-aggregate input rows replayed exactly;
    // the θ lower-bound and identity claims pinned at zero violations
    "q241_wand_soundness" ->
      s"""WITH $lexicalCtes
        |SELECT
        |  (SELECT CAST(count(DISTINCT query_id) AS BIGINT) FROM qt
        |   WHERE tok IN (SELECT DISTINCT tok FROM tf)) AS n_queries,
        |  (SELECT CAST(count(*) AS BIGINT)
        |   FROM qt JOIN tf ON qt.tok = tf.tok) AS n_exhaustive_pairs,
        |  CAST(0 AS BIGINT) AS n_theta_violations,
        |  CAST(0 AS BIGINT) AS n_diff""".stripMargin,
    // persisted-postings and upserted-postings paths are row-identical
    // to the direct BM25 — same oracle
    "q81_bm25_persisted" -> bm25Oracle,
    "q82_bm25_upsert" -> bm25Oracle,
    "q79_hybrid_rrf" -> hybridRrfOracle,
    // fusion over the persisted postings is row-identical to the direct
    // fusion — same oracle
    "q86_hybrid_persisted" -> hybridRrfOracle,
    // persisted-pair hybrid ≡ direct hybrid, by construction at the
    // recall-1.0 operating point: 5 queries × k=4 hits, zero diff
    "q87_hybrid_persisted_identity" ->
      """SELECT CAST(20 AS BIGINT) AS n_direct,
        |CAST(0 AS BIGINT) AS n_diff""".stripMargin,
    // SQ8-served retrieval ≡ direct dense retrieval: 5 queries × k=4
    "q108_sq8_retrieval_identity" ->
      """SELECT CAST(20 AS BIGINT) AS n_direct,
        |CAST(0 AS BIGINT) AS n_diff""".stripMargin,
    // quantized hybrid ≡ direct hybrid ≡ LSH-persisted hybrid at the
    // certified m=64 margin: 5 queries × k=4 hits, zero diff each way
    "q145_hybrid_quantized" ->
      """SELECT CAST(20 AS BIGINT) AS n_direct,
        |CAST(0 AS BIGINT) AS n_diff_direct,
        |CAST(0 AS BIGINT) AS n_diff_persisted""".stripMargin,
    // robust outliers: exact medians + MAD + the flag rule replayed
    "q159_robust_outliers" ->
      """WITH d AS (
        |  SELECT lang, CAST(n_chars AS DOUBLE) AS x FROM documents),
        |m AS (SELECT lang, quantile_cont(x, 0.5) AS med
        |      FROM d GROUP BY lang),
        |md AS (
        |  SELECT d.lang, quantile_cont(abs(d.x - m.med), 0.5) AS mad
        |  FROM d JOIN m USING (lang) GROUP BY d.lang),
        |f AS (
        |  SELECT d.lang, d.x, m.med, md.mad,
        |    CASE WHEN md.mad = 0
        |      THEN abs(d.x - m.med) > 0
        |      ELSE abs(d.x - m.med) > 3.5 * md.mad END AS is_outlier
        |  FROM d JOIN m USING (lang) JOIN md USING (lang))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  round(any_value(med), 6) AS med, round(any_value(mad), 6) AS mad
        |FROM f GROUP BY lang""".stripMargin,
    // per-group sample: the md5-uniform draw and the (uniform asc,
    // key asc) ranking replayed digit for digit
    "q160_sample_per_group" ->
      """WITH h AS (
        |  SELECT lang, doc_id,
        |    CAST(concat('0x',
        |      substr(md5(CAST(doc_id AS VARCHAR) || ':5'), 1, 13))
        |      AS BIGINT) AS hv
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY hv ASC, doc_id ASC) AS INT) AS rank
        |  FROM h)
        |SELECT lang, rank, doc_id AS key FROM r WHERE rank <= 10"""
        .stripMargin,
    // line dedup: the banner+8-token-line construction, the per-line
    // document frequency, the df>4 cut, and the reassembly replayed
    "q161_line_dedup" ->
      """WITH d0 AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS t
        |  FROM documents),
        |aug AS (
        |  SELECT doc_id, list_prepend(
        |      '== site banner :: ' || source || ' ==',
        |      list_transform(
        |        range(0, CAST(floor((len(t) - 1) / 8.0) AS INT) + 1),
        |        i -> array_to_string(t[i*8+1:i*8+8], ' '))) AS lines
        |  FROM d0),
        |ln AS (
        |  SELECT doc_id, unnest(lines) AS line,
        |         generate_subscripts(lines, 1) AS pos
        |  FROM aug),
        |dfc AS (
        |  SELECT line, count(DISTINCT doc_id) AS line_df
        |  FROM ln WHERE trim(line) <> '' GROUP BY line),
        |mark AS (
        |  SELECT ln.doc_id, ln.pos, ln.line,
        |    COALESCE(dfc.line_df > 4, false) AND trim(ln.line) <> ''
        |      AS is_cut
        |  FROM ln LEFT JOIN dfc ON ln.line = dfc.line)
        |SELECT doc_id,
        |  COALESCE(string_agg(CASE WHEN NOT is_cut THEN line END,
        |    chr(10) ORDER BY pos), '') AS text,
        |  CAST(sum(CASE WHEN trim(line) <> '' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN is_cut THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_cut
        |FROM mark GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // binary-quantized ANN: the md5-jitter 1536-dim fixture replayed
    // component for component, then plain exact kNN — hash-matching
    // proves the Hamming shortlist + re-rank output-lossless at
    // (k=4, m=128)
    "q162_binary_ann_1536" -> tiledBqKnnOracle("q.vec_id < 8"),
    // the persisted BQ layout serves the identical output (the q105
    // discipline for the 1-bit family)
    "q190_bq_persisted" -> tiledBqKnnOracle("q.vec_id < 8"),
    // BQ delete semantics: exact kNN over the tiled index MINUS the
    // tombstoned ids (the 8 query vectors)
    "q191_bq_delete" ->
      tiledBqKnnOracle("q.vec_id < 8 AND x.vec_id >= 8"),
    // filtered BQ serving: pre-filter semantics — exact kNN over the
    // even-id tiled survivors
    "q203_bq_filtered" ->
      tiledBqKnnOracle("q.vec_id < 8 AND x.vec_id % 2 = 0"),
    // LSH delete at the recall-1.0 point: exact kNN over the index
    // MINUS the tombstoned ids — the same survivor oracle as q116
    "q204_lsh_delete" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, x.vec_id,
        |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                     CAST(x.embedding AS DOUBLE[]))
        |    / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                             CAST(q.embedding AS DOUBLE[])))
        |     * sqrt(list_dot_product(CAST(x.embedding AS DOUBLE[]),
        |                             CAST(x.embedding AS DOUBLE[]))))
        |    AS score
        |  FROM embeddings q CROSS JOIN embeddings x
        |  WHERE q.vec_id < 8 AND x.vec_id >= 8),
        |ranked AS (
        |  SELECT query_id, vec_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, vec_id ASC) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, vec_id, round(score, 6) AS score
        |FROM ranked WHERE rank <= 4""".stripMargin,
    // delete + rewrite: the naive raw-source kNN, re-planned through
    // the TOMBSTONED index, equals exact kNN over the survivors
    // (vec_id % 10 = 9 deleted through the index)
    "q207_rewrite_tombstoned" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, x.vec_id,
        |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                     CAST(x.embedding AS DOUBLE[]))
        |    / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                             CAST(q.embedding AS DOUBLE[])))
        |     * sqrt(list_dot_product(CAST(x.embedding AS DOUBLE[]),
        |                             CAST(x.embedding AS DOUBLE[]))))
        |    AS score
        |  FROM embeddings q CROSS JOIN embeddings x
        |  WHERE q.vec_id < 8 AND x.vec_id % 10 <> 9),
        |ranked AS (
        |  SELECT query_id, vec_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, vec_id ASC) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, vec_id, round(score, 6) AS score
        |FROM ranked WHERE rank <= 4""".stripMargin,
    // float-LSH filtered search at the recall-1.0 point: exact kNN
    // over the even-label set
    "q213_lsh_filtered" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, x.vec_id,
        |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                     CAST(x.embedding AS DOUBLE[]))
        |    / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                             CAST(q.embedding AS DOUBLE[])))
        |     * sqrt(list_dot_product(CAST(x.embedding AS DOUBLE[]),
        |                             CAST(x.embedding AS DOUBLE[]))))
        |    AS score
        |  FROM embeddings q CROSS JOIN embeddings x
        |  WHERE q.vec_id < 8 AND x.label % 2 = 0),
        |ranked AS (
        |  SELECT query_id, vec_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, vec_id ASC) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, vec_id, round(score, 6) AS score
        |FROM ranked WHERE rank <= 4""".stripMargin,
    // float-IVF filtered search: identity to pre-filtered-lists IVF,
    // nothing outside the filter, exact-recall floor (q143 discipline)
    "q214_ivf_filtered" ->
      """SELECT CAST(4 * count(*) AS BIGINT) AS n_served,
        |CAST(0 AS BIGINT) AS n_diff_direct,
        |CAST(0 AS BIGINT) AS n_outside_filter,
        |true AS recall_floor_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    // IVF delete: served ≡ float IVF over the survivors at the same
    // stored centroids (8 queries × k=4), zero tombstoned hits
    "q205_ivf_delete" ->
      """SELECT CAST(32 AS BIGINT) AS n_served,
        |CAST(0 AS BIGINT) AS n_diff_float,
        |CAST(0 AS BIGINT) AS n_tombstoned_served""".stripMargin,
    // persisted composed IVF-BQ: identity to the float-IVF path and
    // the exact-recall floor, engine-verified; counts are the panel's
    // replayable half (8 queries × k=4)
    "q192_ivfbq_persisted" ->
      """SELECT CAST(32 AS BIGINT) AS n_bq,
        |CAST(0 AS BIGINT) AS n_diff_float, true AS recall_ok"""
        .stripMargin,
    // 1536-dim end-to-end canary: persisted ≡ in-memory through the
    // disk round trip, the exact-recall floor, the 192-byte code width
    "q193_ivfbq_1536_e2e" ->
      """SELECT CAST(32 AS BIGINT) AS n_bq,
        |CAST(0 AS BIGINT) AS n_diff_mem, true AS recall_ok,
        |CAST(192 AS BIGINT) AS code_bytes""".stripMargin,
    // hybrid delete: served-after-delete ≡ direct hybrid over the
    // surviving chunks (5 queries × k=4), zero tombstoned hits
    "q194_hybrid_delete" ->
      """SELECT CAST(20 AS BIGINT) AS n_served,
        |CAST(0 AS BIGINT) AS n_diff_survivor_direct,
        |CAST(0 AS BIGINT) AS n_tombstoned_served""".stripMargin,
    // dataset manifest: the identical md5-52bit row-hash sums per
    // table, DECIMAL(38,0)-exact, rendered as text
    "q202_dataset_manifest" ->
      """WITH h AS (
        |  SELECT 'customer' AS t, count(*) AS n,
        |    sum(CAST(CAST(concat('0x', substr(md5(
        |      CAST(c_custkey AS VARCHAR) || ':' || c_name), 1, 13))
        |      AS BIGINT) AS DECIMAL(38,0))) AS cs
        |  FROM customer
        |  UNION ALL SELECT 'documents', count(*),
        |    sum(CAST(CAST(concat('0x', substr(md5(
        |      CAST(doc_id AS VARCHAR) || ':' || text), 1, 13))
        |      AS BIGINT) AS DECIMAL(38,0)))
        |  FROM documents
        |  UNION ALL SELECT 'events', count(*),
        |    sum(CAST(CAST(concat('0x', substr(md5(
        |      CAST(event_id AS VARCHAR) || ':' || event_type), 1, 13))
        |      AS BIGINT) AS DECIMAL(38,0)))
        |  FROM events
        |  UNION ALL SELECT 'lineitem', count(*),
        |    sum(CAST(CAST(concat('0x', substr(md5(
        |      CAST(l_orderkey AS VARCHAR) || ':' ||
        |      CAST(l_linenumber AS VARCHAR) || ':' ||
        |      CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR)),
        |      1, 13)) AS BIGINT) AS DECIMAL(38,0)))
        |  FROM lineitem
        |  UNION ALL SELECT 'orders', count(*),
        |    sum(CAST(CAST(concat('0x', substr(md5(
        |      CAST(o_orderkey AS VARCHAR) || ':' || o_orderstatus ||
        |      ':' || CAST(o_orderdate AS VARCHAR)), 1, 13))
        |      AS BIGINT) AS DECIMAL(38,0)))
        |  FROM orders)
        |SELECT t AS table_name, CAST(n AS BIGINT) AS n_rows,
        |  CAST(coalesce(cs, 0) AS VARCHAR) AS checksum
        |FROM h ORDER BY table_name""".stripMargin,
    // last-touch attribution: per purchase the max click ts at-or-
    // before it, exact integer-cents rollup per user
    "q201_attribution" ->
      """WITH p AS (SELECT user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |m AS (SELECT p.user_id, p.value,
        |    (SELECT max(c.ts) FROM c
        |     WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS click_ts
        |  FROM p)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(count(click_ts) AS BIGINT) AS n_attributed,
        |  CAST(sum(CASE WHEN click_ts IS NOT NULL
        |    THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS attributed_cents,
        |  CAST(sum(CASE WHEN click_ts IS NULL
        |    THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS unattributed_cents
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,
    // semantic dedup on the group-structured fixture: every vector's
    // representative is its group's min id — the exact expected
    // outcome of the cluster → pair → CC → keep-min composition
    "q197_semantic_dedup" ->
      """WITH params AS (
        |  SELECT CAST(count(*) // 8 AS BIGINT) AS g FROM embeddings)
        |SELECT e.vec_id, e.vec_id % p.g AS rep_id
        |FROM embeddings e CROSS JOIN params p
        |ORDER BY e.vec_id""".stripMargin,
    // the deployment path (persisted centroids, zero in-query k-means)
    // recovers the identical survivor set
    "q209_semantic_dedup_served" ->
      """WITH params AS (
        |  SELECT CAST(count(*) // 8 AS BIGINT) AS g FROM embeddings)
        |SELECT e.vec_id, e.vec_id % p.g AS rep_id
        |FROM embeddings e CROSS JOIN params p
        |ORDER BY e.vec_id""".stripMargin,
    // Fellegi-Sunter scored pairs: the agreement flags and the
    // log-odds weighted sum replayed verbatim (same IEEE doubles —
    // same divisions, ln/ln(2), left-assoc sum — rounded at 6)
    "q210_er_scored" ->
      """WITH p AS (SELECT p_partkey AS id, p_name, p_type, p_size,
        |    split_part(p_name, ' ', 1) || '|' || p_brand AS blk
        |  FROM part),
        |pr AS (SELECT a.id AS id_a, b.id AS id_b,
        |    coalesce(levenshtein(a.p_name, b.p_name) <= 2, false)
        |      AS agree_p_name,
        |    coalesce(a.p_type = b.p_type, false) AS agree_p_type,
        |    coalesce(a.p_size = b.p_size, false) AS agree_p_size
        |  FROM p a JOIN p b ON a.blk = b.blk AND a.id < b.id),
        |sc AS (SELECT *,
        |    (CASE WHEN agree_p_name THEN ln(0.9/0.1)/ln(2.0)
        |          ELSE ln((1.0-0.9)/(1.0-0.1))/ln(2.0) END
        |   + CASE WHEN agree_p_type THEN ln(0.8/0.3)/ln(2.0)
        |          ELSE ln((1.0-0.8)/(1.0-0.3))/ln(2.0) END
        |   + CASE WHEN agree_p_size THEN ln(0.7/0.2)/ln(2.0)
        |          ELSE ln((1.0-0.7)/(1.0-0.2))/ln(2.0) END) AS score
        |  FROM pr)
        |SELECT id_a, id_b, agree_p_name, agree_p_type, agree_p_size,
        |  round(score, 6) AS score
        |FROM sc WHERE score >= 3.0 ORDER BY id_a, id_b""".stripMargin,
    // entity resolution: blocked levenshtein pairs + recursive-CTE
    // transitive closure, canonical entity = min partkey
    "q198_entity_resolution" ->
      """WITH RECURSIVE
        |p AS (SELECT p_partkey AS id, p_name AS name,
        |    split_part(p_name, ' ', 1) || '|' || p_brand AS blk
        |  FROM part),
        |pr AS (SELECT a.id AS ia, b.id AS ib FROM p a JOIN p b
        |    ON a.blk = b.blk AND a.id < b.id
        |  WHERE levenshtein(a.name, b.name) <= 2),
        |edges AS (SELECT ia AS a, ib AS b FROM pr
        |  UNION SELECT ib, ia FROM pr),
        |reach AS (SELECT a, b FROM edges
        |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        |    WHERE r.a != e.b),
        |lab AS (SELECT a AS id, least(a, min(b)) AS ent
        |  FROM reach GROUP BY a)
        |SELECT p.id AS p_partkey,
        |  CAST(coalesce(lab.ent, p.id) AS BIGINT) AS entity_id
        |FROM p LEFT JOIN lab ON p.id = lab.id
        |ORDER BY p_partkey""".stripMargin,
    // SCD2: the identical lag/lead window arithmetic, half-open
    // intervals, is_current on each key's open row
    "q199_scd2_intervals" ->
      """WITH e AS (SELECT user_id, ts, event_type FROM events
        |  WHERE user_id % 5 = 0),
        |m AS (SELECT user_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_type) AS p
        |  FROM e),
        |o AS (SELECT user_id, event_type, ts AS valid_from FROM m
        |  WHERE p IS NULL OR p <> event_type),
        |iv AS (SELECT user_id, event_type, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id
        |      ORDER BY valid_from, event_type) AS valid_to
        |  FROM o)
        |SELECT user_id, event_type,
        |  epoch_us(valid_from) AS valid_from_us,
        |  epoch_us(valid_to) AS valid_to_us,
        |  valid_to IS NULL AS is_current
        |FROM iv
        |ORDER BY user_id, valid_from_us, event_type""".stripMargin,
    // persisted SCD2 store: batch-merged dimension ≡ fromChanges over
    // the concatenated feed — the SAME window arithmetic as q199
    "q208_scd2_store" ->
      """WITH e AS (SELECT user_id, ts, event_type FROM events
        |  WHERE user_id % 5 = 0),
        |m AS (SELECT user_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_type) AS p
        |  FROM e),
        |o AS (SELECT user_id, event_type, ts AS valid_from FROM m
        |  WHERE p IS NULL OR p <> event_type),
        |iv AS (SELECT user_id, event_type, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id
        |      ORDER BY valid_from, event_type) AS valid_to
        |  FROM o)
        |SELECT user_id, event_type,
        |  epoch_us(valid_from) AS valid_from_us,
        |  epoch_us(valid_to) AS valid_to_us,
        |  valid_to IS NULL AS is_current
        |FROM iv
        |ORDER BY user_id, valid_from_us, event_type""".stripMargin,
    // SCD2 point-in-time lookup: each purchase reads the interval that
    // covered its instant (half-open [from, to)), nulls before a
    // user's first interval
    "q206_scd2_lookup" ->
      """WITH e AS (SELECT user_id, ts, event_type, event_id FROM events
        |  WHERE user_id % 5 = 0),
        |m AS (SELECT user_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_type) AS p
        |  FROM e),
        |o AS (SELECT user_id, event_type, ts AS valid_from FROM m
        |  WHERE p IS NULL OR p <> event_type),
        |iv AS (SELECT user_id, event_type, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id
        |      ORDER BY valid_from, event_type) AS valid_to
        |  FROM o),
        |pr AS (SELECT user_id, ts, event_id FROM e
        |  WHERE event_type = 'purchase')
        |SELECT pr.user_id, pr.event_id, epoch_us(pr.ts) AS ts_us,
        |  iv.event_type AS tier,
        |  epoch_us(iv.valid_from) AS valid_from_us
        |FROM pr LEFT JOIN iv
        |  ON pr.user_id = iv.user_id AND pr.ts >= iv.valid_from
        |  AND (iv.valid_to IS NULL OR pr.ts < iv.valid_to)
        |ORDER BY pr.user_id, pr.event_id""".stripMargin,
    // incremental split store: every count replayed — full coverage,
    // batch-1 stability, zero straddling pairs
    "q217_split_store" ->
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_total,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |     WHERE doc_id % 2 = 0) AS n_batch1,
        |  CAST(0 AS BIGINT) AS n_changed,
        |  CAST(0 AS BIGINT) AS n_straddle""".stripMargin,
    // line-store erasure: surviving units = the survivors' distinct
    // (doc, line) pairs exactly; parity vs the fresh survivor store
    "q225_line_purge" ->
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM (
        |     SELECT DISTINCT doc_id, line FROM (
        |       SELECT doc_id, unnest(string_split(text, chr(10)))
        |         AS line
        |       FROM documents WHERE doc_id >= 6) w
        |     WHERE trim(line) <> '') x) AS n_units_after,
        |  CAST(0 AS BIGINT) AS n_parity_diff""".stripMargin,
    // composed OPQ-IVF-PQ: identity to the float IVF path + recall
    // floor — 8 queries x k=4
    "q224_opq_ivfpq" ->
      """SELECT CAST(32 AS BIGINT) AS n_served,
        |CAST(0 AS BIGINT) AS n_diff_float,
        |true AS recall_ok""".stripMargin,
    // logged purge: trail counts are fixed by the scope shape (2
    // stores x 2 batches; lsh serves 2 tables + dedup 1 per audit);
    // the dedup rewrite proof replays; zeros are the served-nowhere
    // constants
    "q223_purge_logged" ->
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings
        |     WHERE vec_id < 6) AS n_roster,
        |  CAST(4 AS BIGINT) AS n_receipt,
        |  CAST(6 AS BIGINT) AS n_audit,
        |  CAST(0 AS BIGINT) AS served_total,
        |  (SELECT CAST(count(*) AS BIGINT) FROM
        |     (SELECT min(doc_id) AS keeper FROM documents
        |        GROUP BY text) g
        |   WHERE keeper >= 6) AS n_seen_after,
        |  CAST(0 AS BIGINT) AS n_lsh_purged_served""".stripMargin,
    // pretraining export: gate arithmetic = q140's, split buckets =
    // q211's, BPE chain = q169's, packing/interleave = q95/q170's —
    // one statement replays the whole funnel at the token level
    // (names g*/k*/t* chosen clear of the bpe chain's w/v_i/s_i/p_i/b_i)
    "q222_pretraining_export" ->
      s"""WITH ${bpeChain(12)},
        |nrm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |      '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', ' ', 'g'),
        |      '[ \\t\\n\\r]+', ' ', 'g')) AS text
        |  FROM documents),
        |dd AS (SELECT doc_id, text, string_split(text, ' ') AS l
        |  FROM nrm),
        |ix AS (
        |  SELECT doc_id, l, unnest(range(1, greatest(len(l) - 1, 0) + 1))
        |    AS i
        |  FROM dd),
        |cv AS (
        |  SELECT doc_id, max(c * length(g)) AS cov FROM (
        |    SELECT doc_id, array_to_string(l[i:i+1], ' ') AS g,
        |      count(*) AS c
        |    FROM ix GROUP BY doc_id, g)
        |  GROUP BY doc_id),
        |ga AS (
        |  SELECT dd.doc_id, dd.text
        |  FROM dd LEFT JOIN cv USING (doc_id)
        |  WHERE round(COALESCE(cv.cov, 0) / length(dd.text), 6) <= 0.12),
        |ke AS (SELECT text, min(doc_id) AS doc_id FROM ga
        |  GROUP BY text),
        |spp AS (SELECT doc_id, text,
        |    min(doc_id) OVER (PARTITION BY substr(text, 1, 40))
        |      AS rep_id
        |  FROM ke),
        |dg2 AS (SELECT doc_id, text,
        |    md5(CAST(rep_id AS VARCHAR) || ':77') AS h,
        |    unnest(range(1, 14)) AS i
        |  FROM spp),
        |hv2 AS (SELECT doc_id, any_value(text) AS text,
        |    sum(CAST(strpos('0123456789abcdef', substr(h, i, 1)) - 1
        |      AS BIGINT) * CAST(power(16, 13 - i) AS BIGINT)) AS hv
        |  FROM dg2 GROUP BY doc_id),
        |tr AS (SELECT doc_id, text FROM hv2 WHERE hv % 10 < 8),
        |enc AS (
        |  SELECT word,
        |    list_filter(string_split(replace(rep, chr(2), ''), chr(1)),
        |      x -> x <> '') AS syms
        |  FROM v12),
        |tw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM tr),
        |dt AS (SELECT t.doc_id, CAST(sum(len(e.syms)) AS BIGINT)
        |    AS n_tok
        |  FROM tw t JOIN enc e USING (word) WHERE t.word <> ''
        |  GROUP BY t.doc_id),
        |ds AS (SELECT dt.doc_id, dt.n_tok, doc.source
        |  FROM dt JOIN documents doc USING (doc_id)),
        |pk AS (SELECT doc_id, source, n_tok,
        |    coalesce(sum(n_tok) OVER (PARTITION BY source
        |      ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS start_off
        |  FROM ds),
        |pq2 AS (SELECT *,
        |    CAST(floor(start_off / 512.0) AS BIGINT) AS first_seq,
        |    CAST(floor((start_off + n_tok - 1) / 512.0) AS BIGINT)
        |      AS last_seq
        |  FROM pk),
        |nsq AS (SELECT source, max(last_seq) + 1 AS ns FROM pq2
        |  GROUP BY source),
        |ic AS (SELECT doc.source, count(*) AS c
        |  FROM tr JOIN documents doc USING (doc_id)
        |  GROUP BY doc.source)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_in,
        |  (SELECT CAST(count(*) AS BIGINT) FROM ga) AS n_after_gate,
        |  (SELECT CAST(count(*) AS BIGINT) FROM ke) AS n_after_dedup,
        |  (SELECT CAST(count(*) AS BIGINT) FROM tr) AS n_train,
        |  (SELECT CAST(sum(n_tok) AS BIGINT) FROM pq2) AS train_tokens,
        |  (SELECT CAST(sum(CASE WHEN first_seq <> last_seq THEN 1
        |     ELSE 0 END) AS BIGINT) FROM pq2) AS n_straddlers,
        |  (SELECT CAST(sum(ns) AS BIGINT) FROM nsq) AS n_sequences,
        |  (SELECT CAST(sum(c) AS BIGINT) FROM ic) AS n_interleaved,
        |  (SELECT CAST(sum(c * (c + 1) / 2) AS BIGINT) FROM ic)
        |    AS rank_sum""".stripMargin,
    // persisted OPQ: exact kNN scored in the UNSCRAMBLED space —
    // rotations preserve cosine, so the q165 oracle certifies the
    // whole stored-rotation serve chain
    "q221_opq_persisted" ->
      """WITH fl AS (
        |  SELECT vec_id,
        |    list_transform(range(1, len(embedding) + 1), i ->
        |      CAST(embedding[i] * power(0.8, i - 1) AS FLOAT))
        |      AS embedding
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, x.vec_id,
        |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                     CAST(x.embedding AS DOUBLE[]))
        |    / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                             CAST(q.embedding AS DOUBLE[])))
        |     * sqrt(list_dot_product(CAST(x.embedding AS DOUBLE[]),
        |                             CAST(x.embedding AS DOUBLE[]))))
        |    AS score
        |  FROM fl q CROSS JOIN fl x
        |  WHERE q.vec_id < 8),
        |ranked AS (
        |  SELECT query_id, vec_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, vec_id ASC) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, vec_id, round(score, 6) AS score
        |FROM ranked WHERE rank <= 4""".stripMargin,
    // unigram seed: the trainer's round-0 statistics table, verbatim
    "q219_unigram_seed" ->
      """WITH wc AS (SELECT word, count(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word
        |    FROM documents) w
        |  WHERE word <> '' GROUP BY word),
        |subs AS (SELECT substr(wc.word, i.i, l.l) AS piece,
        |    sum(wc.freq) AS cnt
        |  FROM wc,
        |    LATERAL (SELECT unnest(generate_series(1,
        |      length(wc.word))) AS i) i,
        |    LATERAL (SELECT unnest(generate_series(1, 3)) AS l) l
        |  WHERE i.i + l.l - 1 <= length(wc.word)
        |  GROUP BY 1)
        |SELECT piece, CAST(cnt AS BIGINT) AS cnt FROM subs
        |ORDER BY cnt DESC, piece LIMIT 40""".stripMargin,
    // unigram train+encode: totals replayed, every invariant a
    // constant (zero roundtrip failures, zero coverage misses,
    // bounded normalized vocab)
    "q220_unigram_encode" ->
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents)
        |    AS n_docs,
        |  CAST(0 AS BIGINT) AS n_rt_fail,
        |  (SELECT CAST(count(*) AS BIGINT) FROM (
        |     SELECT unnest(string_split(text, ' ')) AS word
        |     FROM documents) w WHERE word <> '') AS n_words_total,
        |  CAST(0 AS BIGINT) AS n_tokens_lt_words,
        |  CAST(0 AS BIGINT) AS n_missing_chars,
        |  true AS vocab_bounded,
        |  true AS prob_sum_ok""".stripMargin,
    // MaxSim invariants: the q65 panel shape + the single-token
    // reduction law's zero diff; chunk count replayed by the
    // recursive-chunker CTE
    "q228_maxsim" ->
      s"""${chunkCtePrefix(200)}
        |SELECT CAST(q.query_id AS BIGINT) AS query_id,
        |  CAST(4 AS BIGINT) AS n_hits,
        |  true AS ranks_ok, true AS scores_monotonic,
        |  (SELECT CAST(count(*) AS BIGINT)
        |   FROM st WHERE chunk IS NOT NULL) AS n_index_chunks,
        |  CAST(0 AS BIGINT) AS n_diff_single
        |FROM (VALUES (1), (2), (3), (4), (5)) AS q(query_id)""".stripMargin,
    // two-stage MaxSim serving ≡ full scan at the certified fetch depth
    "q229_maxsim_rerank" ->
      """SELECT CAST(20 AS BIGINT) AS n_full,
        |CAST(5 AS BIGINT) AS n_queries,
        |CAST(0 AS BIGINT) AS n_diff""".stripMargin,
    // PLAID-clustered serving ≡ full scan at the certified
    // (nProbe, mDocs) margin
    "q242_plaid_maxsim" ->
      """SELECT CAST(20 AS BIGINT) AS n_full,
        |CAST(5 AS BIGINT) AS n_queries,
        |CAST(0 AS BIGINT) AS n_diff""".stripMargin,
    // WAND skew point: exhaustive BM25 over the DERIVED skewed corpus
    // (DuckDB rebuilds the same deterministic texts), Σ_t df_t replayed
    // exactly, pruning_bites pinned true
    "q246_wand_skew" ->
      """WITH docs2 AS (
        |  SELECT doc_id,
        |    concat('common filler w', CAST(doc_id % 7 AS VARCHAR), ' w',
        |      CAST(doc_id % 13 AS VARCHAR),
        |      CASE WHEN doc_id % 40 = 3
        |        THEN concat(' special token', CAST(doc_id AS VARCHAR))
        |        ELSE '' END) AS text
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, tok
        |  FROM docs2,
        |    unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(tok)
        |  WHERE tok <> ''),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
        |  FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
        |  FROM toks GROUP BY 1),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
        |  FROM dl),
        |q AS (SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'special common'))
        |  AS v(query_id, qtext)),
        |qt AS (SELECT DISTINCT query_id, tok
        |  FROM q, unnest(string_split_regex(lower(qtext), '[^a-z0-9]+')) AS u(tok)
        |  WHERE tok <> ''),
        |df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf
        |  WHERE tok IN (SELECT DISTINCT tok FROM qt) GROUP BY 1),
        |bm25 AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    sum(ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
        |      * tf.tf * (1.2 + 1)
        |      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)))
        |      AS score
        |  FROM qt
        |  JOIN tf ON qt.tok = tf.tok
        |  JOIN df ON df.tok = qt.tok
        |  JOIN dl ON dl.doc_id = tf.doc_id
        |  CROSS JOIN stats
        |  GROUP BY 1, 2),
        |bm25_ranked AS (
        |  SELECT query_id, doc_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY round(score, 6) DESC, doc_id ASC) AS INT) AS rank
        |  FROM bm25),
        |pairs AS (SELECT CAST(sum(df) AS BIGINT) AS n_exhaustive_pairs
        |  FROM df)
        |SELECT query_id, rank, doc_id, round(score, 6) AS score,
        |  n_exhaustive_pairs, true AS pruning_bites
        |FROM bm25_ranked CROSS JOIN pairs
        |WHERE rank <= 5""".stripMargin,

    // PLAID incremental upsert ≡ rebuild ≡ full scan at the certified
    // margin (both symmetric differences empty)
    "q245_plaid_upsert" ->
      """SELECT CAST(20 AS BIGINT) AS n_full,
        |CAST(5 AS BIGINT) AS n_queries,
        |CAST(0 AS BIGINT) AS n_diff_rebuild,
        |CAST(0 AS BIGINT) AS n_diff_fullscan""".stripMargin,
    // quantized PLAID serving ≡ full scan at the certified margin
    "q247_plaidq_maxsim" ->
      """SELECT CAST(20 AS BIGINT) AS n_full,
        |CAST(5 AS BIGINT) AS n_queries,
        |CAST(0 AS BIGINT) AS n_diff""".stripMargin,
    // filtered PLAID ≡ full scan over the allowed docs; nothing
    // disallowed served
    "q248_plaid_filtered" ->
      """SELECT CAST(20 AS BIGINT) AS n_full,
        |CAST(5 AS BIGINT) AS n_queries,
        |CAST(0 AS BIGINT) AS n_diff,
        |CAST(0 AS BIGINT) AS n_disallowed_served""".stripMargin,
    // filtered QUANTIZED PLAID ≡ full scan over the allowed docs;
    // nothing disallowed served (the round-15 composition closure)
    "q250_plaidq_filtered" ->
      """SELECT CAST(20 AS BIGINT) AS n_full,
        |CAST(5 AS BIGINT) AS n_queries,
        |CAST(0 AS BIGINT) AS n_diff,
        |CAST(0 AS BIGINT) AS n_disallowed_served""".stripMargin,
    // impact staleness lifecycle: fresh twins not stale, an upserted
    // postings twin marks the banded layout stale (never poisoned —
    // it keeps serving), the re-band clears it; tail count replayed
    "q252_impact_staleness" ->
      """SELECT CAST(0 AS BIGINT) AS stale_fresh,
        |CAST(0 AS BIGINT) AS poisoned_fresh,
        |CAST(1 AS BIGINT) AS stale_after_upsert,
        |CAST(0 AS BIGINT) AS poisoned_after_upsert,
        |CAST(0 AS BIGINT) AS stale_after_reband,
        |CAST(0 AS BIGINT) AS poisoned_after_reband,
        |CAST(1 AS BIGINT) AS served_while_stale,
        |(SELECT count(*) FROM documents WHERE doc_id % 10 = 7)
        |  AS n_tail""".stripMargin,
    // round-15 maintain legs: three layouts examined, nothing compacts
    // on the second below-floor run, answers identical on all three
    // surfaces; group/query/input counts replayed from the fixtures
    "q251_maintain_r15" ->
      """SELECT CAST(3 AS BIGINT) AS n_layouts,
        |CAST(0 AS BIGINT) AS n_second_run_compactions,
        |CAST(0 AS BIGINT) AS n_diff_sketch,
        |CAST(0 AS BIGINT) AS n_diff_opq,
        |CAST(0 AS BIGINT) AS n_diff_near,
        |(SELECT count(DISTINCT doc_id % 3) FROM documents)
        |  AS n_sketch_groups,
        |(SELECT CAST(count(DISTINCT vec_id) * 4 AS BIGINT)
        |  FROM embeddings WHERE vec_id < 8) AS n_opq_answers,
        |(SELECT count(*) FROM documents WHERE doc_id % 2 = 1)
        |  AS n_near_input""".stripMargin,
    // round-14 maintain legs: both layouts examined, nothing compacts
    // on the second below-floor run (auto-floor), answers identical on
    // both surfaces; the line-store row count replayed from documents
    "q249_maintain_r14" ->
      """SELECT CAST(2 AS BIGINT) AS n_layouts,
        |CAST(0 AS BIGINT) AS n_second_run_compactions,
        |CAST(0 AS BIGINT) AS n_diff_plaid,
        |CAST(0 AS BIGINT) AS n_diff_lines,
        |CAST(20 AS BIGINT) AS n_plaid_rows,
        |(SELECT CAST(count(*) AS BIGINT) FROM documents
        | WHERE doc_id % 2 = 1) AS n_line_docs""".stripMargin,
    // round-13 purge parity: leg/audit counts pinned; victims from the
    // deterministic modulus replayed by DuckDB
    "q244_r13_purge" ->
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |   WHERE doc_id % 25 = 3) AS n_victims,
        |  CAST(1 AS BIGINT) AS n_tombstoned_legs,
        |  CAST(1 AS BIGINT) AS n_poisoned_legs,
        |  CAST(3 AS BIGINT) AS n_audit_rows,
        |  CAST(0 AS BIGINT) AS served_total,
        |  CAST(0 AS BIGINT) AS n_victims_served_plaid,
        |  true AS plaid_serves_survivors,
        |  true AS wand_refuses""".stripMargin,

    // maintenance changes no served answer; counts end at the bound;
    // an immediate second run compacts nothing
    "q243_maintenance" ->
      """SELECT CAST(2 AS BIGINT) AS n_layouts,
        |CAST(0 AS BIGINT) AS n_over_bound_after,
        |CAST(0 AS BIGINT) AS n_second_run_compactions,
        |CAST(0 AS BIGINT) AS n_diff_lsh,
        |CAST(0 AS BIGINT) AS n_diff_bm25,
        |CAST(25 AS BIGINT) AS n_bm25_rows""".stripMargin,
    // NN-Descent recall: counts replayed (n·k exact edges), the 0.90
    // floor measured with margin in KnnTune (deterministic — no RNG)
    "q226_knn_descent" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |CAST(count(*) FILTER (doc_id % 5 = 0) AS BIGINT) AS n_sampled,
        |CAST(8 * count(*) FILTER (doc_id % 5 = 0) AS BIGINT) AS n_exact,
        |true AS recall_ok
        |FROM documents""".stripMargin,
    // graph-ANN beam search: counts replayed, the 0.95 floor measured
    // with margin on the held-out protocol (deterministic)
    "q230_graph_search" ->
      """SELECT CAST(count(*) FILTER (doc_id % 25 = 0) AS BIGINT)
        |  AS n_queries,
        |CAST(4 * count(*) FILTER (doc_id % 25 = 0) AS BIGINT)
        |  AS n_exact,
        |true AS recall_ok
        |FROM documents""".stripMargin,
    // centrality: the q227 graph CTEs + the q131 PageRank ladder,
    // everything recomputed relationally
    "q234_doc_centrality" -> {
      val head =
        """WITH ev AS (SELECT vec_id,
          |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |sc AS (SELECT a.vec_id AS src, b.vec_id AS dst,
          |    CASE WHEN sqrt(list_dot_product(a.v, a.v))
          |           * sqrt(list_dot_product(b.v, b.v)) = 0 THEN 0
          |      ELSE list_dot_product(a.v, b.v)
          |        / (sqrt(list_dot_product(a.v, a.v))
          |           * sqrt(list_dot_product(b.v, b.v))) END AS score
          |  FROM ev a JOIN ev b ON a.vec_id <> b.vec_id),
          |gr AS (SELECT src, dst, score, row_number() OVER (
          |    PARTITION BY src ORDER BY score DESC, dst) AS rnk FROM sc),
          |knn AS (SELECT src, dst, score FROM gr WHERE rnk <= 6),
          |mut AS (SELECT x.src AS a0, x.dst AS b0 FROM knn x
          |  JOIN knn y ON x.src = y.dst AND x.dst = y.src
          |  WHERE x.src < x.dst AND x.score >= 0.25),
          |e AS MATERIALIZED (SELECT a0 AS src, b0 AS dst, 1.0 AS w
          |  FROM mut UNION ALL SELECT b0, a0, 1.0 FROM mut),
          |nodes AS MATERIALIZED (SELECT vec_id AS node FROM embeddings),
          |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n
          |  FROM nodes),
          |outw AS MATERIALIZED (SELECT src, sum(w) AS ow FROM e
          |  GROUP BY 1),
          |r0 AS MATERIALIZED (SELECT node, 1.0 / n AS r
          |  FROM nodes CROSS JOIN nn)""".stripMargin
      val its = (1 to 10).map { k =>
        s""",
           |r$k AS MATERIALIZED (
           |  SELECT n0.node,
           |    0.15 / nn.n + 0.85 * (COALESCE(c.contrib, 0) + dang.dm / nn.n)
           |      AS r
           |  FROM nodes n0
           |  CROSS JOIN nn
           |  CROSS JOIN (SELECT COALESCE(sum(p.r), 0) AS dm FROM r${k - 1} p
           |    LEFT JOIN outw o ON p.node = o.src WHERE o.src IS NULL) dang
           |  LEFT JOIN (SELECT e.dst AS node, sum(p.r * e.w / o.ow)
           |      AS contrib
           |    FROM r${k - 1} p JOIN e ON e.src = p.node
           |    JOIN outw o ON o.src = e.src
           |    GROUP BY 1) c ON c.node = n0.node)""".stripMargin
      }.mkString
      head + its + "\nSELECT node AS doc_id, round(r, 6) AS rank FROM r10"
    },
    // Rocchio PRF: both kNN passes, the per-dimension centroid, and
    // the expansion arithmetic replayed relationally
    "q235_rocchio_prf" ->
      """WITH ev AS (SELECT vec_id,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |qv AS (SELECT vec_id AS query_id, v AS q FROM ev
        |  WHERE vec_id < 8),
        |s1 AS (SELECT qv.query_id, ev.vec_id,
        |    CASE WHEN sqrt(list_dot_product(qv.q, qv.q))
        |           * sqrt(list_dot_product(ev.v, ev.v)) = 0 THEN 0
        |      ELSE list_dot_product(qv.q, ev.v)
        |        / (sqrt(list_dot_product(qv.q, qv.q))
        |           * sqrt(list_dot_product(ev.v, ev.v))) END AS score
        |  FROM qv CROSS JOIN ev),
        |f AS (SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
        |    FROM s1) WHERE rnk <= 8),
        |cd AS (SELECT f.query_id, i.i AS i, avg(ev.v[i.i]) AS m
        |  FROM f JOIN ev ON ev.vec_id = f.vec_id,
        |    LATERAL (SELECT unnest(range(1, 65)) AS i) i
        |  GROUP BY 1, 2),
        |q2 AS (SELECT c.query_id,
        |    array_agg(qv.q[c.i] * 1.0 + c.m * 0.5 ORDER BY c.i) AS v
        |  FROM cd c JOIN qv ON qv.query_id = c.query_id GROUP BY 1),
        |s2 AS (SELECT q2.query_id, ev.vec_id,
        |    CASE WHEN sqrt(list_dot_product(q2.v, q2.v))
        |           * sqrt(list_dot_product(ev.v, ev.v)) = 0 THEN 0
        |      ELSE list_dot_product(q2.v, ev.v)
        |        / (sqrt(list_dot_product(q2.v, q2.v))
        |           * sqrt(list_dot_product(ev.v, ev.v))) END AS score
        |  FROM q2 CROSS JOIN ev)
        |SELECT query_id, CAST(rnk AS INT) AS rank, vec_id,
        |  round(score, 6) AS score
        |FROM (SELECT query_id, vec_id, score, row_number() OVER (
        |    PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
        |  FROM s2) WHERE rnk <= 4""".stripMargin,
    // graph-served RAG: chunk count replayed by the recursive-chunker
    // CTE; the 0.90 floor measured (deterministic) per fixture
    "q239_graph_rag" ->
      s"""${chunkCtePrefix(200)}
        |SELECT CAST(5 AS BIGINT) AS n_queries,
        |  CAST(20 AS BIGINT) AS n_exact,
        |  (SELECT CAST(count(*) AS BIGINT)
        |   FROM st WHERE chunk IS NOT NULL) AS n_chunks,
        |  true AS recall_ok""".stripMargin,
    // embedding drift: centroids, projections, buckets, smoothing and
    // the PSI sum all recomputed relationally
    "q238_embedding_drift" ->
      """WITH ev AS (SELECT label,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |r AS (SELECT v FROM ev WHERE label <> 0),
        |c AS (SELECT v FROM ev WHERE label = 0),
        |cref AS (SELECT i.i AS i, avg(r.v[i.i]) AS m
        |  FROM r, LATERAL (SELECT unnest(range(1, 65)) AS i) i
        |  GROUP BY 1),
        |ccur AS (SELECT i.i AS i, avg(c.v[i.i]) AS m
        |  FROM c, LATERAL (SELECT unnest(range(1, 65)) AS i) i
        |  GROUP BY 1),
        |cc AS (SELECT sum(a.m * b.m)
        |    / (sqrt((SELECT sum(m * m) FROM cref))
        |       * sqrt((SELECT sum(m * m) FROM ccur))) AS v
        |  FROM cref a JOIN ccur b USING (i)),
        |refv AS (SELECT array_agg(m ORDER BY i) AS cv FROM cref),
        |mr AS (SELECT list_dot_product(r.v, refv.cv)
        |    / (sqrt(list_dot_product(r.v, r.v))
        |       * sqrt(list_dot_product(refv.cv, refv.cv))) AS m
        |  FROM r CROSS JOIN refv),
        |mc AS (SELECT list_dot_product(c.v, refv.cv)
        |    / (sqrt(list_dot_product(c.v, c.v))
        |       * sqrt(list_dot_product(refv.cv, refv.cv))) AS m
        |  FROM c CROSS JOIN refv),
        |bk AS (SELECT unnest(range(0, 10)) AS bucket),
        |br AS (SELECT least(9, greatest(0,
        |    CAST(floor((m + 1.0) / 0.2) AS INT))) AS bucket,
        |    count(*) AS n_ref FROM mr GROUP BY 1),
        |bc AS (SELECT least(9, greatest(0,
        |    CAST(floor((m + 1.0) / 0.2) AS INT))) AS bucket,
        |    count(*) AS n_cur FROM mc GROUP BY 1),
        |j AS (SELECT bk.bucket, COALESCE(br.n_ref, 0) AS n_ref,
        |    COALESCE(bc.n_cur, 0) AS n_cur
        |  FROM bk LEFT JOIN br USING (bucket) LEFT JOIN bc USING (bucket)),
        |tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j),
        |sm AS (SELECT (n_ref + 0.5) / (tr + 5.0) AS p_ref,
        |    (n_cur + 0.5) / (tc + 5.0) AS p_cur
        |  FROM j CROSS JOIN tot),
        |ps AS (SELECT sum((p_cur - p_ref) * ln(p_cur / p_ref)) AS psi
        |  FROM sm)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM r) AS n_ref,
        |  (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_cur,
        |  round((SELECT v FROM cc), 6) AS centroid_cos,
        |  (SELECT round(avg(sqrt(list_dot_product(v, v))), 6) FROM r)
        |    AS ref_norm_avg,
        |  (SELECT round(avg(sqrt(list_dot_product(v, v))), 6) FROM c)
        |    AS cur_norm_avg,
        |  round((SELECT psi FROM ps), 6) AS psi""".stripMargin,
    // quantized two-stage MaxSim ≡ full scan at the certified shortlist
    "q237_maxsim_quantized" ->
      """SELECT CAST(20 AS BIGINT) AS n_full,
        |CAST(5 AS BIGINT) AS n_queries,
        |CAST(0 AS BIGINT) AS n_diff""".stripMargin,
    // graph erasure flagship: victim counts replayed; audit zeros
    // (3 surface tables: vecs + both edge endpoints); survivors serve
    "q236_graph_purge" ->
      """SELECT CAST(3 AS BIGINT) AS n_audit_rows,
        |CAST(0 AS BIGINT) AS served_total,
        |CAST(0 AS BIGINT) AS served_replay,
        |CAST(count(*) FILTER (vec_id % 50 = 7) AS BIGINT) AS n_victims,
        |CAST(0 AS BIGINT) AS n_victims_served,
        |CAST(count(*) FILTER (vec_id % 50 <> 7) AS BIGINT)
        |  AS n_vecs_served
        |FROM embeddings""".stripMargin,
    // persisted graph index: q230's oracle shape (held-out protocol)
    "q231_graph_persisted" ->
      """SELECT CAST(count(*) FILTER (doc_id % 25 = 0) AS BIGINT)
        |  AS n_queries,
        |CAST(4 * count(*) FILTER (doc_id % 25 = 0) AS BIGINT)
        |  AS n_exact,
        |true AS recall_ok
        |FROM documents""".stripMargin,
    // upsert: served vec count replayed (base + tail, replay no-op)
    "q232_graph_upsert" ->
      """SELECT CAST(count(*) FILTER (doc_id % 25 = 0) AS BIGINT)
        |  AS n_queries,
        |CAST(4 * count(*) FILTER (doc_id % 25 = 0) AS BIGINT)
        |  AS n_exact,
        |CAST(count(*) FILTER (doc_id % 25 <> 0) AS BIGINT)
        |  AS n_vecs_served,
        |true AS recall_ok
        |FROM documents""".stripMargin,
    // delete: victim count replayed; zero victims served anywhere
    "q233_graph_delete" ->
      """SELECT CAST(count(*) FILTER (doc_id % 25 <> 0
        |  AND doc_id % 20 = 3) AS BIGINT) AS n_victims,
        |CAST(0 AS BIGINT) AS n_victims_served,
        |CAST(4 * count(*) FILTER (doc_id % 25 = 0) AS BIGINT)
        |  AS n_exact,
        |true AS recall_ok
        |FROM documents""".stripMargin,
    // mutual-kNN clustering recomputed non-circularly end-to-end:
    // exact cosine ranking, mutuality self-join, recursive-CTE CC
    "q227_mutual_knn_cc" ->
      """WITH RECURSIVE ev AS (SELECT vec_id,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sc AS (SELECT a.vec_id AS src, b.vec_id AS dst,
        |    CASE WHEN sqrt(list_dot_product(a.v, a.v))
        |           * sqrt(list_dot_product(b.v, b.v)) = 0 THEN 0
        |      ELSE list_dot_product(a.v, b.v)
        |        / (sqrt(list_dot_product(a.v, a.v))
        |           * sqrt(list_dot_product(b.v, b.v))) END AS score
        |  FROM ev a JOIN ev b ON a.vec_id <> b.vec_id),
        |g AS (SELECT src, dst, score, row_number() OVER (
        |    PARTITION BY src ORDER BY score DESC, dst) AS rnk FROM sc),
        |knn AS (SELECT src, dst, score FROM g WHERE rnk <= 6),
        |mut AS (SELECT x.src AS a0, x.dst AS b0 FROM knn x
        |  JOIN knn y ON x.src = y.dst AND x.dst = y.src
        |  WHERE x.src < x.dst AND x.score >= 0.25),
        |edges AS (SELECT a0 AS a, b0 AS b FROM mut
        |  UNION SELECT b0, a0 FROM mut),
        |reach AS (SELECT a, b FROM edges
        |  UNION SELECT r.a, e2.b FROM reach r
        |    JOIN edges e2 ON r.b = e2.a WHERE r.a != e2.b)
        |SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY a""".stripMargin,
    // cross-store purge: the audit zeros are the served-nowhere proof
    // (13 surface tables across 8 layouts); the rewrite proofs replay
    // — fps rows = content groups whose min-id keeper survived,
    // assignments and SCD2 intervals minus the victims'
    "q218_purge" ->
      """WITH e AS (SELECT user_id, ts, event_type FROM events
        |  WHERE user_id % 5 = 0),
        |m AS (SELECT user_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_type) AS p
        |  FROM e),
        |o AS (SELECT user_id FROM m
        |  WHERE p IS NULL OR p <> event_type)
        |SELECT
        |  CAST(13 AS BIGINT) AS n_surfaces,
        |  CAST(0 AS BIGINT) AS n_served_purged,
        |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings
        |     WHERE vec_id < 6) AS n_victims,
        |  CAST(0 AS BIGINT) AS n_lsh_hits,
        |  CAST(0 AS BIGINT) AS n_ivfsq8_hits,
        |  CAST(0 AS BIGINT) AS n_bq_hits,
        |  CAST(0 AS BIGINT) AS n_bm25_hits,
        |  (SELECT CAST(count(*) AS BIGINT) FROM
        |     (SELECT min(doc_id) AS keeper FROM documents
        |        GROUP BY text) g
        |   WHERE keeper >= 6) AS n_seen_after,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |     WHERE doc_id >= 6) AS n_split_after,
        |  (SELECT CAST(count(*) AS BIGINT) FROM o
        |     WHERE user_id >= 6) AS n_scd2_after""".stripMargin,
    // batch routing: every routed count replayed; the main output
    // provably carries zero violations
    "q215_contract_route" ->
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM events
        |     WHERE NOT coalesce(value <= 10, false)) AS n_violations,
        |  (SELECT CAST(count(*) AS BIGINT) FROM events
        |     WHERE coalesce(value <= 10, false)) AS n_main,
        |  (SELECT CAST(count(*) AS BIGINT) FROM events
        |     WHERE NOT coalesce(value <= 10, false)) AS n_quarantine,
        |  CAST(0 AS BIGINT) AS n_violations_in_main""".stripMargin,
    // fused panel: identical per-check arithmetic to the q200 oracle,
    // computed engine-side in ONE scan
    "q216_contract_fused" ->
      """WITH checks AS (
        |  SELECT 'f1_quantity_low' AS check_name,
        |    'lineitem' AS table_name,
        |    (SELECT count(*) FROM lineitem) AS n_rows,
        |    (SELECT count(*) FROM lineitem
        |       WHERE NOT coalesce(l_quantity >= 1, false)) AS n_violations
        |  UNION ALL SELECT 'f2_quantity_cap', 'lineitem',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem
        |       WHERE NOT coalesce(l_quantity <= 10, false))
        |  UNION ALL SELECT 'f3_positive_price', 'lineitem',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem
        |       WHERE NOT coalesce(l_extendedprice > 0, false)))
        |SELECT check_name, table_name, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_violations AS BIGINT) AS n_violations,
        |  round(CAST(n_violations AS DOUBLE) / greatest(n_rows, 1), 6)
        |    AS violation_share,
        |  n_violations = 0 AS passed
        |FROM checks ORDER BY check_name""".stripMargin,
    // pruned store lookup: identical interval-join semantics over the
    // bounded probe subset (users % 25)
    "q212_scd2_store_lookup" ->
      """WITH e AS (SELECT user_id, ts, event_type, event_id FROM events
        |  WHERE user_id % 5 = 0),
        |m AS (SELECT user_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_type) AS p
        |  FROM e),
        |o AS (SELECT user_id, event_type, ts AS valid_from FROM m
        |  WHERE p IS NULL OR p <> event_type),
        |iv AS (SELECT user_id, event_type, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id
        |      ORDER BY valid_from, event_type) AS valid_to
        |  FROM o),
        |pr AS (SELECT user_id, ts, event_id FROM events
        |  WHERE user_id % 25 = 0 AND event_type = 'purchase')
        |SELECT pr.user_id, pr.event_id, epoch_us(pr.ts) AS ts_us,
        |  iv.event_type AS tier,
        |  epoch_us(iv.valid_from) AS valid_from_us
        |FROM pr LEFT JOIN iv
        |  ON pr.user_id = iv.user_id AND pr.ts >= iv.valid_from
        |  AND (iv.valid_to IS NULL OR pr.ts < iv.valid_to)
        |ORDER BY pr.user_id, pr.event_id""".stripMargin,
    // data-contract audit: every check's count arithmetic replayed —
    // uniqueness (dup-excess + nulls), not-null, referential anti-join
    // counts, range/cross-table predicates (null predicate = violation)
    "q200_data_contract" ->
      """WITH ship AS (
        |  SELECT l.l_shipdate, o.o_orderdate FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |checks AS (
        |  SELECT 'c01_customer_key_unique' AS check_name,
        |    'customer' AS table_name,
        |    (SELECT count(*) FROM customer) AS n_rows,
        |    (SELECT coalesce(sum(n - 1), 0) FROM (
        |       SELECT count(*) AS n FROM customer
        |       WHERE c_custkey IS NOT NULL GROUP BY c_custkey
        |       HAVING count(*) > 1) t)
        |    + (SELECT count(*) FROM customer WHERE c_custkey IS NULL)
        |      AS n_violations
        |  UNION ALL SELECT 'c02_orders_custkey_notnull', 'orders',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
        |  UNION ALL SELECT 'c03_orders_customer_fk', 'orders',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
        |       AND NOT EXISTS (SELECT 1 FROM customer c
        |         WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL SELECT 'c04_lineitem_orders_fk', 'lineitem',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
        |       AND NOT EXISTS (SELECT 1 FROM orders o
        |         WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL SELECT 'c05_totalprice_positive', 'orders',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM orders
        |       WHERE NOT coalesce(o_totalprice > 0, false))
        |  UNION ALL SELECT 'c06_quantity_in_range', 'lineitem',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem WHERE NOT
        |       coalesce(l_quantity >= 1 AND l_quantity <= 50, false))
        |  UNION ALL SELECT 'c07_ship_after_order', 'lineitem_orders',
        |    (SELECT count(*) FROM ship),
        |    (SELECT count(*) FROM ship WHERE NOT
        |       coalesce(l_shipdate >= o_orderdate, false))
        |  UNION ALL SELECT 'c08_doc_id_unique', 'documents',
        |    (SELECT count(*) FROM documents),
        |    (SELECT coalesce(sum(n - 1), 0) FROM (
        |       SELECT count(*) AS n FROM documents
        |       WHERE doc_id IS NOT NULL GROUP BY doc_id
        |       HAVING count(*) > 1) t)
        |    + (SELECT count(*) FROM documents WHERE doc_id IS NULL)
        |  UNION ALL SELECT 'c09_event_value_cap', 'events',
        |    (SELECT count(*) FROM events),
        |    (SELECT count(*) FROM events
        |       WHERE NOT coalesce(value <= 10, false)))
        |SELECT check_name, table_name, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_violations AS BIGINT) AS n_violations,
        |  round(CAST(n_violations AS DOUBLE) / greatest(n_rows, 1), 6)
        |    AS violation_share,
        |  n_violations = 0 AS passed
        |FROM checks ORDER BY check_name""".stripMargin,
    // funnel: the first-match chain replayed level by level
    "q157_funnel" ->
      """WITH e AS (SELECT user_id, event_type, ts FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, any_value(s1.t1) AS t1, min(e.ts) AS t2
        |  FROM e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |    AND e.ts <= s1.t1 + INTERVAL 7 DAY GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3
        |  FROM e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |    AND e.ts <= s2.t1 + INTERVAL 7 DAY GROUP BY 1)
        |SELECT CAST(1 AS INT) AS step, 'view' AS step_name,
        |  (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_users
        |UNION ALL SELECT CAST(2 AS INT), 'click',
        |  (SELECT CAST(count(*) AS BIGINT) FROM s2)
        |UNION ALL SELECT CAST(3 AS INT), 'purchase',
        |  (SELECT CAST(count(*) AS BIGINT) FROM s3)""".stripMargin,
    // retention: first-seen week cohorts, distinct-active cells
    "q158_retention" ->
      """WITH f AS (
        |  SELECT user_id,
        |    CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |  FROM events GROUP BY 1),
        |sz AS (SELECT cohort_week, CAST(count(*) AS BIGINT)
        |    AS cohort_size FROM f GROUP BY 1),
        |a AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
        |j AS (SELECT f.cohort_week,
        |    CAST(date_diff('day', f.cohort_week, a.week) // 7 AS INT)
        |      AS week_offset, a.user_id
        |  FROM a JOIN f USING (user_id))
        |SELECT strftime(j.cohort_week, '%Y-%m-%d') AS cohort_week,
        |  j.week_offset,
        |  CAST(count(*) AS BIGINT) AS n_active, sz.cohort_size
        |FROM j JOIN sz USING (cohort_week)
        |GROUP BY 1, 2, sz.cohort_size
        |ORDER BY 1, 2""".stripMargin,
    // budget admission: the cumulative prefix rule replayed verbatim
    "q156_budget_admit" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t <> '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, n_tok,
        |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN cum <= 2000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_admitted,
        |  CAST(sum(CASE WHEN cum <= 2000 THEN n_tok ELSE 0 END)
        |    AS BIGINT) AS admitted_tok
        |FROM c GROUP BY source""".stripMargin,
    // hard negatives: BM25 replay + the q128 qrels + anti-join +
    // per-query renumbering
    "q155_hard_negatives" ->
      s"""WITH $lexicalCtes,
        |dt AS (SELECT DISTINCT doc_id, tok FROM toks),
        |qrels AS (SELECT query_id, doc_id
        |  FROM qt JOIN dt USING (tok) GROUP BY 1, 2
        |  HAVING count(*) >= 4),
        |negs AS (
        |  SELECT b.query_id, b.doc_id, b.score, b.rank
        |  FROM bm25_ranked b
        |  ANTI JOIN qrels q
        |    ON b.query_id = q.query_id AND b.doc_id = q.doc_id
        |  WHERE b.rank <= 20)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY rank)
        |    AS INT) AS neg_rank,
        |  doc_id, round(score, 6) AS score
        |FROM negs
        |QUALIFY neg_rank <= 5""".stripMargin,
    // winnowing: the full pipeline replays — portable md5-52bit gram
    // hashes, window minima, distinct fps, df-capped pair join
    "q154_winnow_pairs" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS l
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, l, len(l) - 3 AS ng FROM docs WHERE len(l) >= 4),
        |h AS (
        |  SELECT doc_id, ng,
        |    list_transform(range(1, ng + 1), i ->
        |      CAST(concat('0x',
        |        substr(md5(array_to_string(l[i:i+3], ' ')), 1, 13))
        |        AS BIGINT)) AS hs
        |  FROM g),
        |wins AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(ng - 3, 1) + 1),
        |      j -> list_min(hs[j:j+3]))) AS fpl
        |  FROM h),
        |fps AS (SELECT doc_id, unnest(fpl) AS fp FROM wins),
        |rare AS (
        |  SELECT fp FROM fps GROUP BY fp
        |  HAVING count(*) BETWEEN 2 AND 10),
        |kept AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp))
        |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id
        |HAVING count(*) >= 2
        |ORDER BY doc_id_a, doc_id_b""".stripMargin,
    // temperature mixture: replay both stages — the T=2 share rule
    // (power 0.5 over natural token shares, normalized, rounded) and
    // the q96 downsample-only rate arithmetic over those shares
    "q152_temperature_mixture" ->
      """WITH stats AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total_tok
        |        FROM stats),
        |nat AS (SELECT lang, n_docs, n_tok,
        |  power(n_tok / t.total_tok, 0.5) AS pw FROM stats, tot t),
        |z AS (SELECT sum(pw) AS z FROM nat),
        |j AS (SELECT lang, n_docs, n_tok,
        |  round(pw / z.z, 6) AS target_share FROM nat, z),
        |ts AS (SELECT min(n_tok / target_share) AS t_star FROM j)
        |SELECT lang, n_docs, n_tok, target_share,
        |  round(least(1.0, target_share * ts.t_star / n_tok), 6) AS rate,
        |  CAST(round(round(least(1.0, target_share * ts.t_star / n_tok),
        |    6) * n_tok, 0) AS BIGINT) AS exp_tok
        |FROM j, ts""".stripMargin,
    // quantized adaptive ≡ direct blend ≡ LSH-persisted blend at the
    // certified margin; alpha=1 degrades to plain retrieval:
    // 2 queries × k=4 hits, zero diff on every closure
    "q151_adaptive_quantized" ->
      """SELECT CAST(8 AS BIGINT) AS n_adaptive,
        |CAST(0 AS BIGINT) AS n_diff_direct,
        |CAST(0 AS BIGINT) AS n_diff_persisted,
        |CAST(0 AS BIGINT) AS n_diff_alpha1""".stripMargin,
    // blended-probe adaptive over the stored index ≡ exact adaptive;
    // alpha=1 ≡ plain retrieve: 2 queries × k=4 hits, zero diff
    "q89_adaptive_persisted_invariants" ->
      """SELECT CAST(8 AS BIGINT) AS n_adaptive,
        |CAST(0 AS BIGINT) AS n_diff_persisted,
        |CAST(0 AS BIGINT) AS n_diff_alpha1""".stripMargin,
    "q84_clean_pipeline" -> cleanPipelineOracle,
    // equality invariants hold by construction at every scale
    "q85_adaptive_invariants" ->
      """SELECT CAST(8 AS BIGINT) AS n_plain,
        |CAST(0 AS BIGINT) AS n_diff_alpha1,
        |CAST(0 AS BIGINT) AS n_diff_nohist""".stripMargin,
    "q57_langid_ngram" -> langidNgramOracle,
    "q58_multimodal_resize" ->
      """SELECT doc_id AS media_id,
        |['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
        |CAST(CASE WHEN octet_length(encode(text)) <= 64
        |  THEN octet_length(encode(text))
        |  ELSE (octet_length(encode(text))
        |        + (octet_length(encode(text)) // 64) - 1)
        |       // (octet_length(encode(text)) // 64)
        |END AS INT) AS resized_len
        |FROM documents""".stripMargin,
    "q46_stream_dedup" ->
      """SELECT count(*) AS n_unique, round(sum(value), 4) AS sum_value
        |FROM (SELECT DISTINCT ON (event_id) * FROM events)""".stripMargin,
    "q47_postprocess" ->
      """SELECT doc_id,
        |CASE WHEN starts_with(text,
        |  'The context provided does not contain specific information')
        |THEN 'I''m sorry, I can only answer questions based on the provided documents.'
        |ELSE split_part(text, chr(10), 1) END AS answer
        |FROM documents""".stripMargin,
    "q48_history_concat" ->
      """SELECT user_id,
        |string_agg(event_type, '|' ORDER BY ts ASC, event_id ASC)
        |  AS history,
        |count(*) AS n_events
        |FROM events GROUP BY user_id""".stripMargin,
    "q49_centroids_udaf" ->
      """SELECT label AS centroid_id, CAST(i - 1 AS INT) AS dim,
        |round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS mean_v
        |FROM embeddings, unnest(generate_series(1, 64)) AS u(i)
        |GROUP BY centroid_id, dim""".stripMargin)

  /** The q101 oracle: BPE training unrolled — round i derives symbol
    * pairs from round i−1's vocabulary, picks the argmax pair with the
    * engine's exact tie-break, and applies the merge with the same
    * sentinel-string replace the engine uses (chr(1)-prefixed symbols,
    * scan-left replace-all = greedy non-overlapping merge). Chained
    * CTEs, not recursion: per-round aggregation + argmax doesn't fit a
    * recursive CTE, and unrolling keeps the replay byte-exact.
    */
  /** The shared BPE training chain (w, v0, per-round s/p/b/v CTEs):
    * round i derives symbol pairs from round i−1's vocabulary, picks
    * the argmax pair with the engine's exact tie-break, and applies
    * the merge with the same sentinel-string replace the engine uses
    * (chr(1)-prefixed symbols, scan-left replace-all = greedy
    * non-overlapping merge). Chained CTEs, not recursion: per-round
    * aggregation + argmax doesn't fit a recursive CTE, and unrolling
    * keeps the replay byte-exact. `word` rides the whole chain so the
    * final vocabulary doubles as the word → encoded-rep map the encode
    * oracle needs.
    */
  private def bpeChain(m: Int): String = {
    // v/b are each referenced twice per round: without MATERIALIZED an
    // inlining planner re-evaluates the whole prefix chain per
    // reference — exponential in rounds
    // two-sentinel representation (chr(1)=S prefix, chr(2)=T suffix per
    // symbol): the merge replace is anchored on BOTH symbol boundaries,
    // so a pair whose rhs is a strict prefix of an actual symbol cannot
    // false-match (the CorpusOps.bpeMerges representation, replayed
    // verbatim); counting strips T and splits on S as the Spark side does
    val rounds = (1 to m).map { i =>
      s"""s$i AS (
         |  SELECT list_filter(string_split(replace(rep, chr(2), ''),
         |           chr(1)), x -> x <> '') AS sym, freq
         |  FROM v${i - 1}),
         |p$i AS (
         |  SELECT sym[idx] AS lhs, sym[idx + 1] AS rhs, freq FROM (
         |    SELECT sym, freq, unnest(range(1, len(sym))) AS idx
         |    FROM s$i)),
         |b$i AS MATERIALIZED (
         |  SELECT lhs, rhs, CAST(sum(freq) AS BIGINT) AS cnt FROM p$i
         |  GROUP BY lhs, rhs
         |  ORDER BY sum(freq) DESC, lhs ASC, rhs ASC LIMIT 1),
         |v$i AS MATERIALIZED (
         |  SELECT v.word, replace(v.rep,
         |           chr(1) || b.lhs || chr(2) || chr(1) || b.rhs || chr(2),
         |           chr(1) || b.lhs || b.rhs || chr(2)) AS rep, v.freq
         |  FROM v${i - 1} v, b$i b)""".stripMargin
    }.mkString(",\n")
    s"""w AS (
       |  SELECT word, count(*) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE word <> '' GROUP BY word),
       |v0 AS MATERIALIZED (
       |  SELECT word,
       |         regexp_replace(word, '(.)', chr(1) || '\\1' || chr(2),
       |           'g') AS rep,
       |         CAST(freq AS BIGINT) AS freq
       |  FROM w),
       |$rounds""".stripMargin
  }

  private def bpeOracle(m: Int): String = {
    val union = (1 to m)
      .map(i => s"SELECT $i AS step, lhs, rhs, cnt FROM b$i")
      .mkString("\n  UNION ALL ")
    s"""WITH ${bpeChain(m)},
       |merges AS (
       |  $union),
       |cov AS (
       |  SELECT round(sum(freq * (len(string_split(replace(rep, chr(2),
       |           ''), chr(1))) - 1)) * 1.0 / sum(freq), 6)
       |           AS avg_symbols_per_word
       |  FROM v$m)
       |SELECT m.step, m.lhs, m.rhs, m.lhs || m.rhs AS merged,
       |  m.cnt AS pair_count, c.avg_symbols_per_word
       |FROM merges m, cov c""".stripMargin
  }

  /** The q106 oracle: the identical training replay, then every doc's
    * words joined against the trained word → rep vocabulary — per-word
    * symbol count = the training run's final representation.
    */
  /** q173 replay: per profiled column, the same canonical string
    * encoding (integers plain, doubles via DECIMAL(38,6), timestamps
    * strftime'd to seconds), then count / nulls / KMV NDV (DISTINCT
    * canonical → md5-52bit → k smallest) / canonical(min,max) /
    * avg length — UNION ALL'd into the stats frame. `rel_err` derives
    * from the UNROUNDED estimate, exactly as the Spark side does.
    */
  private def columnStatsOracle(table: String,
      cols: Seq[(String, String => String)], k: Int, seed: Long): String = {
    val perCol = cols.map { case (c, e) =>
      s"""(SELECT '$c' AS col_name,
         |  (SELECT count(v) FROM (SELECT ${e(c)} AS v FROM $table)) AS cnt,
         |  (SELECT count(*) - count(v)
         |     FROM (SELECT ${e(c)} AS v FROM $table)) AS null_cnt,
         |  (SELECT CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
         |     ELSE ${k - 1}.0 / (max(h) / 4503599627370496.0) END
         |   FROM (SELECT DISTINCT CAST(concat('0x',
         |       substr(md5(v || ':$seed'), 1, 13)) AS BIGINT) AS h
         |     FROM (SELECT ${e(c)} AS v FROM $table)
         |     WHERE v IS NOT NULL ORDER BY h LIMIT $k)) AS ndv_raw,
         |  (SELECT ${e(s"min($c)")} FROM $table) AS min_repr,
         |  (SELECT ${e(s"max($c)")} FROM $table) AS max_repr,
         |  (SELECT round(avg(length(v)), 6)
         |     FROM (SELECT ${e(c)} AS v FROM $table)) AS avg_len,
         |  (SELECT count(DISTINCT v)
         |     FROM (SELECT ${e(c)} AS v FROM $table)) AS exact_ndv)"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT col_name, cnt, null_cnt, round(ndv_raw, 6) AS ndv_est,
       |  min_repr, max_repr, avg_len, exact_ndv,
       |  round(abs(ndv_raw - exact_ndv) / exact_ndv, 6) AS rel_err
       |FROM (
       |$perCol
       |) ORDER BY col_name""".stripMargin
  }

  /** q185/q186 histogram replay: boundaries at exact global ranks via
    * row_number() over the same (price, key) total order; bucket spans
    * by the identical R(i) arithmetic.
    */
  private val histSql: String =
    """rk AS (SELECT o_totalprice AS v,
      |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rank
      |  FROM orders),
      |nn AS (SELECT count(*) AS n FROM orders),
      |bi AS (SELECT i.i AS i,
      |    greatest(1, CAST(ceil(i.i * nn.n / 16.0) AS BIGINT)) AS brank
      |  FROM unnest(range(17)) AS i(i), nn),
      |bounds AS (SELECT bi.i, rk.v FROM bi JOIN rk ON rk.rank = bi.brank),
      |hist AS (SELECT CAST(hi.i AS INT) AS bucket, lo.v AS lo,
      |    hi.v AS hi,
      |    greatest(1, CAST(ceil(hi.i * nn.n / 16.0) AS BIGINT))
      |      - greatest(1, CAST(ceil((hi.i - 1) * nn.n / 16.0) AS BIGINT))
      |      + CASE WHEN hi.i = 1 THEN 1 ELSE 0 END AS n_rows
      |  FROM bounds hi JOIN bounds lo ON lo.i = hi.i - 1
      |  CROSS JOIN nn WHERE hi.i >= 1)""".stripMargin

  /** q183 per-join replay: side stats (row count + KMV NDV of the key
    * under seed 29), the |A|·|B| / max(ndv) estimate from UNROUNDED
    * NDVs (as the Spark side computes it), the exact join count, and
    * the broadcast decision.
    */
  private def joinPlanOracle(name: String, ta: String, ka: String,
      tb: String, kb: String): String = {
    def ndv(tbl: String, key: String) =
      s"""(SELECT CASE WHEN count(*) < 128 THEN CAST(count(*) AS DOUBLE)
         |    ELSE 127.0 / (max(h) / 4503599627370496.0) END FROM (
         |    SELECT DISTINCT CAST(concat('0x', substr(md5(
         |      CAST($key AS VARCHAR) || ':29'), 1, 13)) AS BIGINT) AS h
         |    FROM $tbl ORDER BY h LIMIT 128))""".stripMargin
    s"""SELECT '$name' AS join_name, rows_a, rows_b,
       |  round(na, 6) AS ndv_a, round(nb, 6) AS ndv_b,
       |  round(rows_a * rows_b / greatest(na, nb), 6) AS est_rows,
       |  exact_rows,
       |  round(abs(rows_a * rows_b / greatest(na, nb) - exact_rows)
       |    / exact_rows, 6) AS rel_err,
       |  CASE WHEN least(rows_a, rows_b) < 50000 THEN 'broadcast'
       |    ELSE 'shuffle' END AS decision
       |FROM (SELECT
       |  (SELECT count(*) FROM $ta) AS rows_a,
       |  (SELECT count(*) FROM $tb) AS rows_b,
       |  ${ndv(ta, ka)} AS na,
       |  ${ndv(tb, kb)} AS nb,
       |  (SELECT count(*) FROM $ta x JOIN $tb y ON x.$ka = y.$kb)
       |    AS exact_rows)""".stripMargin
  }

  /** The unrolled Morton bit-interleave as DuckDB SQL — the exact
    * shift/mask/scale sum [[graft.operators.ZOrder.interleave]] plans.
    */
  private def interleaveSql(x: String, y: String, bits: Int): String =
    (0 until bits).map(i =>
      s"(($x >> $i) & 1) * ${1L << (2 * i)} + " +
        s"(($y >> $i) & 1) * ${1L << (2 * i + 1)}").mkString(" + ")

  /** q175/q176 replay: quantized lineitem (l_partkey, l_suppkey) under
    * both layouts' bucket functions → zone maps; `withPanel` layers the
    * 20 seeded rectangle predicates + exact hits on top (q176).
    */
  private def zoneMapOracle(withPanel: Boolean): String = {
    val base =
      s"""WITH b AS (SELECT min(l_partkey) AS x_mn, max(l_partkey) AS x_mx,
         |    min(l_suppkey) AS y_mn, max(l_suppkey) AS y_mx
         |  FROM lineitem),
         |q AS (SELECT l_partkey AS x, l_suppkey AS y,
         |    CAST((x_mx - x_mn + 1) * (y_mx - y_mn + 1) AS DOUBLE) AS dom,
         |    CAST(floor((l_partkey - x_mn) * 256 / (x_mx - x_mn + 1))
         |      AS BIGINT) AS xq,
         |    CAST(floor((l_suppkey - y_mn) * 256 / (y_mx - y_mn + 1))
         |      AS BIGINT) AS yq
         |  FROM lineitem, b),
         |z AS (
         |  SELECT x, y, dom, 'zorder' AS layout,
         |    CAST(floor((${interleaveSql("xq", "yq", 8)}) / 2048)
         |      AS BIGINT) AS bucket
         |  FROM q
         |  UNION ALL
         |  SELECT x, y, dom, 'xsort' AS layout,
         |    CAST(floor(xq / 8) AS BIGINT) AS bucket
         |  FROM q),
         |zm AS (SELECT layout, bucket, count(*) AS n_rows,
         |    min(x) AS x_min, max(x) AS x_max,
         |    min(y) AS y_min, max(y) AS y_max, max(dom) AS dom
         |  FROM z GROUP BY layout, bucket)""".stripMargin
    if (!withPanel)
      s"""$base
         |SELECT layout, bucket, n_rows, x_min, x_max, y_min, y_max,
         |  round((x_max - x_min + 1) * (y_max - y_min + 1) / dom, 6)
         |    AS box_frac
         |FROM zm ORDER BY layout, bucket""".stripMargin
    else
      s"""$base,
         |rects AS (SELECT i.i AS rect_id,
         |    x_mn + CAST(floor((i.i * 37 % 64) * (x_mx - x_mn + 1) / 64)
         |      AS BIGINT) AS ra,
         |    y_mn + CAST(floor((i.i * 23 % 64) * (y_mx - y_mn + 1) / 64)
         |      AS BIGINT) AS rc,
         |    CAST(floor((x_mx - x_mn + 1) / 8) AS BIGINT) AS xw,
         |    CAST(floor((y_mx - y_mn + 1) / 8) AS BIGINT) AS yw
         |  FROM unnest(range(20)) AS i(i), b),
         |r2 AS (SELECT rect_id, ra, ra + xw AS rb, rc, rc + yw AS rd
         |  FROM rects),
         |touched AS (SELECT rect_id, layout,
         |    count(*) AS buckets_touched,
         |    CAST(sum(n_rows) AS BIGINT) AS rows_scanned
         |  FROM r2 JOIN zm ON ra <= x_max AND rb >= x_min
         |    AND rc <= y_max AND rd >= y_min
         |  GROUP BY rect_id, layout),
         |hits AS (SELECT rect_id,
         |    count(CASE WHEN l.l_partkey BETWEEN ra AND rb
         |      AND l.l_suppkey BETWEEN rc AND rd THEN 1 END) AS true_hits
         |  FROM r2 LEFT JOIN lineitem l ON l.l_partkey BETWEEN ra AND rb
         |    AND l.l_suppkey BETWEEN rc AND rd
         |  GROUP BY rect_id)
         |SELECT t.rect_id, t.layout, t.buckets_touched, t.rows_scanned,
         |  h.true_hits,
         |  round(t.rows_scanned / CAST(greatest(h.true_hits, 1) AS DOUBLE),
         |    6) AS scan_amp
         |FROM touched t JOIN hits h ON t.rect_id = h.rect_id
         |ORDER BY t.rect_id, t.layout""".stripMargin
  }

  /** q118/q196 replay: exact top-10 cosine, pre-filter ranks, then the
    * score-threshold filter — the reference stack's
    * `similarity_score_threshold` semantics.
    */
  private val thresholdKnnOracle: String =
    """WITH scored AS (
      |  SELECT q.vec_id AS query_id, x.vec_id,
      |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
      |                     CAST(x.embedding AS DOUBLE[]))
      |    / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
      |                             CAST(q.embedding AS DOUBLE[])))
      |     * sqrt(list_dot_product(CAST(x.embedding AS DOUBLE[]),
      |                             CAST(x.embedding AS DOUBLE[]))))
      |    AS score
      |  FROM embeddings q CROSS JOIN embeddings x
      |  WHERE q.vec_id < 8),
      |ranked AS (
      |  SELECT query_id, vec_id, score,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY score DESC, vec_id ASC) AS INT) AS rank
      |  FROM scored)
      |SELECT query_id, rank, vec_id, round(score, 6) AS score
      |FROM ranked WHERE rank <= 10 AND score >= 0.32""".stripMargin

  /** q162/q190/q191 replay: the md5-jitter 1536-dim fixture rebuilt in
    * SQL (2·rms uniform jitter per tiled component), exact cosine kNN
    * over the pairs `pairFilter` admits — the query restriction for
    * the serving paths, plus a survivor restriction for the delete
    * semantics.
    */
  private def tiledBqKnnOracle(pairFilter: String): String =
    s"""WITH rmsq AS (
       |  SELECT vec_id, embedding AS bemb,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                          CAST(embedding AS DOUBLE[])) / 64.0)
       |      AS rms
       |  FROM embeddings),
       |tiled AS (
       |  SELECT vec_id,
       |    list_transform(range(1, 1537), i ->
       |      CAST(CAST(bemb[(i - 1) % 64 + 1] AS DOUBLE)
       |        + 2.0 * rms *
       |          (CAST(concat('0x', substr(md5(
       |             CAST(vec_id AS VARCHAR) || ':' ||
       |             CAST(i AS VARCHAR)), 1, 13)) AS BIGINT)
       |           / 4503599627370496.0 - 0.5) AS FLOAT)) AS embedding
       |  FROM rmsq),
       |scored AS (
       |  SELECT q.vec_id AS query_id, x.vec_id,
       |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
       |                     CAST(x.embedding AS DOUBLE[]))
       |    / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
       |                             CAST(q.embedding AS DOUBLE[])))
       |     * sqrt(list_dot_product(CAST(x.embedding AS DOUBLE[]),
       |                             CAST(x.embedding AS DOUBLE[]))))
       |    AS score
       |  FROM tiled q CROSS JOIN tiled x
       |  WHERE $pairFilter),
       |ranked AS (
       |  SELECT query_id, vec_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, vec_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, round(score, 6) AS score
       |FROM ranked WHERE rank <= 4""".stripMargin

  /** DuckDB canonical encoders matching [[Analyze.canon]]. */
  private val canonInt: String => String = x => s"CAST($x AS VARCHAR)"
  private val canonDouble: String => String =
    x => s"CAST(CAST($x AS DECIMAL(38,6)) AS VARCHAR)"
  private val canonTs: String => String =
    x => s"strftime($x, '%Y-%m-%d %H:%M:%S')"
  private val canonStr: String => String = identity

  /** q153: the [[bpeEncodeOracle]] chain grouped per language instead
    * of per document — fertility = tokens emitted per word.
    */
  private def fertilityOracle(m: Int): String =
    s"""WITH ${bpeChain(m)},
       |enc AS (
       |  SELECT word, len(string_split(replace(rep, chr(2), ''),
       |           chr(1))) - 1 AS n_sym,
       |         length(word) AS n_chars
       |  FROM v$m),
       |toks AS (
       |  SELECT lang, unnest(string_split(text, ' ')) AS word
       |  FROM documents)
       |SELECT t.lang, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(e.n_sym) AS BIGINT) AS n_tokens,
       |  round(sum(e.n_sym) * 1.0 / count(*), 6) AS fertility,
       |  round(sum(e.n_chars) * 1.0 / sum(e.n_sym), 6) AS chars_per_token
       |FROM toks t JOIN enc e USING (word)
       |WHERE t.word <> ''
       |GROUP BY t.lang""".stripMargin

  /** q169: per-word symbol lists from the replayed merge chain,
    * re-assembled per document in word order, with the round trip.
    */
  private def bpeTokensOracle(m: Int): String =
    s"""WITH ${bpeChain(m)},
       |enc AS (
       |  SELECT word,
       |    list_filter(string_split(replace(rep, chr(2), ''), chr(1)),
       |      s -> s <> '') AS syms
       |  FROM v$m),
       |docs AS (SELECT doc_id, text, string_split(text, ' ') AS l
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, unnest(l) AS word,
       |         generate_subscripts(l, 1) AS pos
       |  FROM docs),
       |nz AS (SELECT * FROM toks WHERE word <> '')
       |SELECT n.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(len(e.syms)) AS BIGINT) AS n_tokens,
       |  string_agg(array_to_string(e.syms, '|'), '|' ORDER BY n.pos)
       |    AS tokens_str,
       |  bool_and(array_to_string(e.syms, '') = n.word) AS rt_ok
       |FROM nz n JOIN enc e USING (word)
       |GROUP BY n.doc_id ORDER BY n.doc_id""".stripMargin

  private def bpeEncodeOracle(m: Int): String =
    s"""WITH ${bpeChain(m)},
       |enc AS (
       |  SELECT word, len(string_split(replace(rep, chr(2), ''),
       |           chr(1))) - 1 AS n_sym,
       |         length(word) AS n_chars
       |  FROM v$m),
       |toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents)
       |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(e.n_sym) AS BIGINT) AS n_tokens,
       |  round(sum(e.n_chars) * 1.0 / sum(e.n_sym), 6) AS chars_per_token
       |FROM toks t JOIN enc e USING (word)
       |WHERE t.word <> ''
       |GROUP BY t.doc_id""".stripMargin
}
