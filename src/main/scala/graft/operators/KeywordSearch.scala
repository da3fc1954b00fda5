package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword (lexical) retrieval and rank fusion — the half of hybrid
  * search the reference's vector-only retriever lacks (reference:
  * `/root/reference/AI.py:138` retrieves by embedding cosine alone; a
  * production RAG serving stack pairs that with BM25 and fuses the two
  * rankings, which is exactly what a user migrating off the reference
  * asks for first).
  *
  * Everything here is the classic inverted-index shape expressed as
  * Spark relational ops:
  *
  *   - postings `(doc_id, term, tf, dl)` — one explode + one
  *     map-side-combinable groupBy (a document's tokens live in one row,
  *     hence one partition, so partial aggregation finishes the count
  *     before the exchange; the shuffle carries one row per DISTINCT
  *     (doc, term), not per token);
  *   - query terms are broadcast (a query is a handful of terms), so
  *     candidate generation is a map-side hash join against the
  *     postings — the only corpus-sized exchange in the whole plan is
  *     the postings build itself, which at 100 TB you materialize once
  *     (`bm25TopKFromPostings`) exactly like [[graft.sources.AnnIndex]]
  *     persists the vector buckets;
  *   - scoring shuffles only candidate `(query, doc)` rows, and the
  *     final per-query top-k goes through the bounded
  *     [[graft.functions.expressions.TopKAgg]] (map-side partial top-k,
  *     O(k) rows per task on the last exchange).
  *
  * Scores are ranked on their 6-decimal rounding (ties broken by id
  * ascending) so the ordering is stable across summation orders — the
  * same double-math discipline as the cosine top-k queries.
  */
object KeywordSearch {

  /** Precomputed BM25 corpus statistics: document count, total token
    * length, and a per-term document-frequency frame `(term, df)` —
    * possibly appended DELTAS (the read side sums per term), which is
    * the persisted-layout shape [[graft.sources.KeywordIndex]] maintains
    * incrementally at ensure/upsert time. Serving from these replaces
    * the two FULL-POSTINGS aggregates (corpus stats + query-term df)
    * the derived path pays per call — at 100 TB those are corpus-sized
    * scans per query batch; the stats frame is vocabulary-sized.
    *
    * Exactness: `n_docs` and `sum_dl` are integers and `avgdl =
    * sum_dl / n_docs` is the same IEEE division the derived `avg(dl)`
    * performs (dl sums are integral doubles, exact in any order), and
    * the df sums are integer counts — so the served scores are
    * bit-identical to the derived path's.
    */
  final case class Bm25Stats(nDocs: Long, sumDl: Long, dfs: DataFrame)

  /** Lowercased alphanumeric tokens (split on non-`[a-z0-9]` runs,
    * empties dropped). Corpus side and query side MUST tokenize
    * identically, so both go through this one expression; it stays
    * inside whole-stage codegen (builtin split/filter, no UDF).
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))

  /** The inverted index: one row per distinct (document, term) with the
    * term frequency and the document's token length — `(doc_id, term,
    * tf, dl)`, both counts as doubles (they only ever feed double math).
    * `dl` rides along from before the explode, so no corpus-sized join
    * is needed to recover it at scoring time.
    */
  def bm25Postings(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("double").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"), first("dl").as("dl"))

  /** BM25 top-k per query. `queries`: `(query_id, query_text)`; returns
    * `(query_id, rank, doc_id, score)` with `score` rounded to 6
    * decimals (the ranking key). Okapi BM25 with the textbook idf
    * `ln(1 + (N - df + 0.5)/(df + 0.5))`.
    */
  def bm25TopK(
      queries: DataFrame,
      docs: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    bm25TopKFromPostings(queries, bm25Postings(docs, idCol, textCol), k, k1, b)

  /** BM25 over a prebuilt postings frame ([[bm25Postings]] — persist it
    * once per corpus and query many times; the per-call work is then two
    * small aggregates over the postings (corpus stats + query-term df)
    * plus the candidate join, never a re-tokenization of the corpus.
    */
  def bm25TopKFromPostings(
      queries: DataFrame,
      postings: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      stats: Option[Bm25Stats] = None): DataFrame = {
    import graft.functions.expressions.TopKAgg.top_k
    val qt = queries
      .select(col("query_id"), explode(tokens(col("query_text"))).as("term"))
      .distinct()
    // corpus stats and query-term document frequency: from the stored
    // [[Bm25Stats]] when provided (vocabulary-sized work — the
    // persisted-index serving path), else derived from the postings
    // (two corpus-sized aggregates — the ad-hoc path). Same doubles
    // either way, see [[Bm25Stats]].
    val withStats: DataFrame => DataFrame = stats match {
      case Some(st) =>
        df => df
          .withColumn("n_docs", lit(st.nDocs.toDouble))
          .withColumn("avgdl", lit(st.sumDl.toDouble / st.nDocs.toDouble))
      case None =>
        val derived = postings.select("doc_id", "dl").groupBy("doc_id")
          .agg(first("dl").as("dl"))
          .agg(count(lit(1)).cast("double").as("n_docs"),
            avg("dl").as("avgdl"))
        df => df.crossJoin(broadcast(derived))
    }
    val dfr = stats match {
      case Some(st) => st.dfs
        .join(broadcast(qt.select("term").distinct()), Seq("term"))
        .groupBy("term").agg(sum("df").cast("double").as("df"))
      case None => postings
        .join(broadcast(qt.select("term").distinct()), Seq("term"))
        .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    }
    val scored = withStats(postings
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(dfr), Seq("term")))
      .withColumn("contrib",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
            / (col("df") + lit(0.5)))
          * col("tf") * lit(k1 + 1.0)
          / (col("tf")
            + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib").as("score"))
    graft.functions.expressions.TopKAgg.rankedTail(
      scored, round(col("score"), 6), col("doc_id"), k, "doc_id", "score")
  }

  /** Token-set Jaccard top-k — the fuzzy-lexical ranker (|tokens(q) ∩
    * tokens(d)| / |tokens(q) ∪ tokens(d)|), same plan shape as BM25:
    * distinct postings, broadcast query terms, candidate-only shuffles.
    * Returns `(query_id, rank, doc_id, score)`, score = 6-decimal
    * jaccard (the ranking key, ties by doc_id).
    */
  def tokenJaccardTopK(
      queries: DataFrame,
      docs: DataFrame,
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.expressions.TopKAgg.top_k
    // nd rides along from before the explode (the bm25Postings dl
    // trick), so no corpus-sized size-frame join at scoring time —
    // the distinct token arrays are per-row, and the only shuffles
    // left are candidate-keyed
    val dt = docs
      .select(col(idCol).as("doc_id"),
        array_distinct(tokens(col(textCol))).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("double").as("nd"),
        explode(col("toks")).as("term"))
    val qt = queries
      .select(col("query_id"), explode(tokens(col("query_text"))).as("term"))
      .distinct()
    val qsize = qt.groupBy("query_id")
      .agg(count(lit(1)).cast("double").as("nq"))
    val inter = dt.join(broadcast(qt), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).cast("double").as("ni"), first("nd").as("nd"))
    graft.functions.expressions.TopKAgg.rankedTail(
      inter.join(broadcast(qsize), Seq("query_id"))
        .withColumn("score",
          col("ni") / (col("nd") + col("nq") - col("ni"))),
      round(col("score"), 6), col("doc_id"), k, "doc_id", "score")
  }

  /** Reciprocal-rank fusion (Cormack & Clarke, SIGIR'09): each input
    * ranking contributes `1 / (rrfK + rank)` per (query, doc); docs are
    * re-ranked by the summed contribution. Inputs are per-query top-k
    * frames `(query_id, doc_id, rank)` — already tiny (k rows per query
    * per ranker), so the fusion is a union + one small aggregate; rank
    * ties break by doc_id via the 6-decimal-rounded score key, like
    * every other ranking in the engine.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    graft.functions.expressions.TopKAgg.rankedTail(
      rankings
        .map(_.select(col("query_id"), col("doc_id"), col("rank")))
        .reduce(_ unionByName _)
        .withColumn("contrib", lit(1.0) / (lit(rrfK.toDouble) + col("rank")))
        .groupBy("query_id", "doc_id")
        .agg(sum("contrib").as("rrf")),
      round(col("rrf"), 6), col("doc_id"), k, "doc_id", "rrf_score")
  }
}
