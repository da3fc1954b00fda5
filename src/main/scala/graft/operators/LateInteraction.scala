package graft.operators

import graft.functions.VectorOps
import graft.functions.expressions.TopKAgg.top_k
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Late-interaction (multi-vector) retrieval — ColBERT-style MaxSim
  * scoring (Khattab & Zaharia, SIGIR 2020, public): a query is a SET of
  * token vectors, a document a SET of unit vectors (here: its chunk
  * embeddings — the chunk-level granularity the engine's index already
  * materializes), and
  *
  *   score(q, d) = Σ_{qt ∈ q} max_{dv ∈ d} cos(qt, dv)
  *
  * — each query token finds its best-matching piece of the document
  * independently, which is what makes multi-aspect queries beat
  * single-vector retrieval (a doc strong on every aspect outranks one
  * crushing a single aspect).
  *
  * Scale shape: the inner max is a partial aggregate keyed by
  * (query_id, doc_id, qpos) — map-side combine collapses each task's
  * chunk rows to ONE row per key before any exchange, and everything
  * after the similarity stage ships only 24-byte keyed doubles, never
  * vectors. The full-scan form ([[maxSimTopK]]) broadcasts the token'd
  * query side (queries × tokens rows — small) over the chunk table; the
  * production form is [[maxSimRerank]] over an ANN-fetched candidate
  * set, where the similarity stage touches candidate docs' chunks only
  * (the ColBERT serving architecture: single-vector first stage, exact
  * MaxSim second stage).
  */
object LateInteraction {

  /** Tokenize queries to word vectors: (query_id, qpos, qvec). Words =
    * the lexical split the keyword stack uses (lowercase, non-[a-z0-9]
    * separators, empties dropped), each embedded independently.
    */
  def queryTokens(queries: DataFrame,
      textCol: String = "query_text"): DataFrame = {
    import graft.rag.Embedder
    queries.select(col("query_id"),
        posexplode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
          t => t =!= "")).as(Seq("qpos", "tok")))
      .select(col("query_id"), col("qpos"),
        Embedder.embedCol(col("tok")).as("qvec"))
  }

  /** Full-scan MaxSim top-k: every document scored. docVectors is the
    * multi-vector table (doc_id, vec_id, embedding) — one row per chunk.
    * Output (query_id, rank, doc_id, score); ties (score desc, doc_id
    * asc), the engine-wide convention.
    */
  def maxSimTopK(queryTokens: DataFrame, docVectors: DataFrame,
      k: Int = 4): DataFrame =
    rankDocs(maxSimScores(queryTokens, docVectors), k)

  /** MaxSim over an ANN-fetched candidate set (query_id, doc_id) — the
    * serving form: the similarity stage is an equi-join on doc_id, so
    * only candidate docs' chunks are ever scored. Output shape and
    * tie-breaks identical to [[maxSimTopK]]; at a fetch depth whose
    * candidates contain the true top-k, output-identical (q229 pins the
    * shipped operating point; certify a new depth the same way).
    */
  def maxSimRerank(queryTokens: DataFrame, docVectors: DataFrame,
      candidates: DataFrame, k: Int = 4): DataFrame = {
    val cand = candidates.select("query_id", "doc_id")
    val dv = docVectors.join(
      cand.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
    val scores = maxSimScores(queryTokens, dv)
      .join(cand, Seq("query_id", "doc_id"), "left_semi")
    rankDocs(scores, k)
  }

  /** Mean-pooled single-vector candidate fetch: collapse each document's
    * chunk vectors to their mean (the standard first-stage proxy), then
    * exact cosine top-fetchK against the queries' OWN mean-pooled token
    * vectors. Returns (query_id, doc_id) fetch pairs for
    * [[maxSimRerank]].
    */
  def meanPoolCandidates(queryTokens: DataFrame, docVectors: DataFrame,
      fetchK: Int): DataFrame =
    meanPoolCandidatesRanked(queryTokens, docVectors, fetchK)
      .select("query_id", "doc_id")

  /** [[meanPoolCandidates]] keeping the first-stage rank — the
    * measurement surface MaxSimTune uses to certify a fetch depth.
    */
  def meanPoolCandidatesRanked(queryTokens: DataFrame,
      docVectors: DataFrame, fetchK: Int): DataFrame = {
    import graft.functions.VectorMeanAgg
    val docMean = docVectors.groupBy("doc_id")
      .agg(VectorMeanAgg.asColumn(col("embedding")).as("embedding"))
      .select(col("doc_id").as("vec_id"), col("embedding"))
    val qMean = queryTokens.groupBy("query_id")
      .agg(VectorMeanAgg.asColumn(col("qvec")).as("query_vec"))
    SimilaritySearch.bruteForceTopKAgg(qMean, docMean, fetchK)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").as("fetch_rank"))
  }

  /** Quantized-scan MaxSim: the int8 first stage of the two-stage
    * architecture. Multi-vector indexes are the BYTE-heaviest retrieval
    * layout there is (a vector per chunk, not per doc), so the 4×
    * scan-byte cut of the SQ8 codes ([[SimilaritySearch.quantizeIndex]]
    * semantics: exact cosine of the dequantized vectors against true
    * norms) matters more here than anywhere else in the engine.
    * Approximate MaxSim over the codes shortlists `mDocs` docs per
    * query; exact float MaxSim over ONLY those docs' chunks returns the
    * top-k. MEASURED output-identical to [[maxSimTopK]] at the shipped
    * operating point (MaxSimTune `sq8` mode — certify a new (k, mDocs)
    * the same way before serving it, the q103 discipline).
    */
  def maxSimQuantizedTopK(queryTokens: DataFrame, docVectors: DataFrame,
      k: Int = 4, mDocs: Int = 16): DataFrame = {
    import graft.functions.expressions.TopKAgg.top_k
    import graft.functions.expressions.VectorExpressions.{dot_i8,
      max_abs, quantize_i8}
    require(mDocs >= k, s"candidate docs mDocs ($mDocs) must be >= k ($k)")
    val qi = SimilaritySearch.quantizeIndex(docVectors,
      idCol = "doc_id", vecCol = "embedding")
    val qq = broadcast(queryTokens.select(col("query_id"), col("qpos"),
      quantize_i8(col("qvec")).as("qcodes"),
      (max_abs(col("qvec")) / 127.0).as("qqscale"),
      VectorOps.l2Norm(col("qvec")).as("qqnorm")))
    val cand = qi.crossJoin(qq)
      .withColumn("acos",
        when(col("qnorm") * col("qqnorm") === 0.0, lit(0.0))
          .otherwise(dot_i8(col("codes"), col("qcodes")).cast("double")
            * col("qscale") * col("qqscale")
            / (col("qnorm") * col("qqnorm"))))
      .groupBy("query_id", "doc_id", "qpos")
      .agg(max("acos").as("mx"))
      .groupBy("query_id", "doc_id")
      .agg(sum("mx").as("ascore"))
      .groupBy("query_id")
      .agg(top_k(col("ascore"), col("doc_id"), mDocs).as("topk"))
      .select(col("query_id"), explode(col("topk.id")).as("doc_id"))
    maxSimRerank(queryTokens, docVectors, cand, k)
  }

  /** The MaxSim scoring core: (query_id, doc_id, score). Per-token max
    * then per-doc sum — two partial-agg stages over 24-byte keyed rows.
    */
  private def maxSimScores(queryTokens: DataFrame,
      docVectors: DataFrame): DataFrame = {
    val qt = broadcast(queryTokens.select(col("query_id"), col("qpos"),
      col("qvec"), VectorOps.l2Norm(col("qvec")).as("qnrm")))
    val dv = docVectors.select(col("doc_id"), col("embedding"),
      VectorOps.l2Norm(col("embedding")).as("dnrm"))
    dv.crossJoin(qt)
      .withColumn("cos",
        when(col("dnrm") * col("qnrm") === 0.0, lit(0.0))
          .otherwise(VectorOps.dot(col("embedding"), col("qvec"))
            / (col("dnrm") * col("qnrm"))))
      .groupBy("query_id", "doc_id", "qpos")
      .agg(max("cos").as("mx"))
      .groupBy("query_id", "doc_id")
      .agg(sum("mx").as("score"))
  }

  private def rankDocs(scores: DataFrame, k: Int): DataFrame =
    scores.groupBy("query_id")
      .agg(top_k(col("score"), col("doc_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as("doc_id"), col("hit.score").as("score"))
}
