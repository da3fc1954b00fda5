package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation harness — the IR metrics every serving
  * stack reports (public: TREC's trec_eval definitions): recall@k,
  * MRR@k, nDCG@k of a ranked run against graded relevance judgments.
  * An engine that ships retrieval operators (BM25, ANN, hybrid,
  * adaptive) needs the measuring stick next to them; this is it.
  *
  * Scale shape: the run is k-bounded per query by construction; every
  * exchange is keyed by query_id (the hits join, the ideal-ranking
  * window over qrels, the per-query aggregate) — nothing global, linear
  * in |run| + |qrels|. Gains are the standard (2^rel − 1)/log2(pos+1);
  * ideal DCG ranks qrels by rel desc (ties are order-free: DCG depends
  * only on the rel multiset).
  */
object Evaluation {

  /** `run`: (query_id, rank, <idCol>) with rank 1..k unique per query.
    * `qrels`: (query_id, <idCol>, rel) with rel > 0 — THE relevance
    * set; anything absent is irrelevant. Returns per query
    * (query_id, n_rel, recall_at_k, rr, ndcg) rounded to 6 — queries
    * with no qrels row report (0, 0, 0, 0).
    */
  def rankingMetrics(run: DataFrame, qrels: DataFrame, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val hits = run.filter(col("rank") <= k)
      .join(qrels.select(col("query_id"), col(idCol), col("rel")),
        Seq("query_id", idCol), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
    val nRel = qrels.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val wIdeal = Window.partitionBy("query_id")
      .orderBy(col("rel").desc, col(idCol).asc)
    val ideal = qrels
      .withColumn("irank", row_number().over(wIdeal))
      .filter(col("irank") <= k)
      .groupBy("query_id")
      .agg(sum((pow(lit(2.0), col("rel")) - 1.0) /
        log2(col("irank") + 1.0)).as("idcg"))
    val per = hits.groupBy("query_id").agg(
      sum(when(col("rel") > 0, 1.0).otherwise(0.0)).as("n_hit"),
      max(when(col("rel") > 0, lit(1.0) / col("rank")).otherwise(0.0))
        .as("rr"),
      sum(when(col("rel") > 0,
        (pow(lit(2.0), col("rel")) - 1.0) / log2(col("rank") + 1.0))
        .otherwise(0.0)).as("dcg"))
    // the reporting universe is run ∪ qrels: a query with judgments
    // but ZERO run rows must report recall/rr/ndcg = 0 (trec_eval
    // semantics) — deriving rows from the run alone would silently
    // drop it and inflate any averaged metric
    val allQ = run.select("query_id")
      .unionByName(qrels.select("query_id")).distinct()
    allQ
      .join(per, Seq("query_id"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0.0)))
      .withColumn("rr", coalesce(col("rr"), lit(0.0)))
      .withColumn("dcg", coalesce(col("dcg"), lit(0.0)))
      .join(nRel, Seq("query_id"), "left")
      .join(ideal, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        round(when(coalesce(col("n_rel"), lit(0L)) === 0, 0.0)
          .otherwise(col("n_hit") / col("n_rel")), 6).as("recall_at_k"),
        round(col("rr"), 6).as("rr"),
        round(when(coalesce(col("idcg"), lit(0.0)) === 0.0, 0.0)
          .otherwise(col("dcg") / col("idcg")), 6).as("ndcg"))
  }

  /** HARD-NEGATIVE mining for retriever/embedding training (the DPR
    * recipe, Karpukhin et al. 2020 — public: the strongest-ranked
    * NON-relevant candidates are the negatives contrastive training
    * needs; random negatives are too easy to teach the boundary).
    * Takes a ranked `run` (any retriever — BM25 is the classic choice,
    * an ANN run works identically) and the relevance set, drops every
    * judged-relevant hit, and renumbers the survivors 1..n per query.
    * Output: (query_id, neg_rank, <idCol>, score).
    *
    * Scale shape: the run is k-bounded per query by construction, so
    * the anti-join and the per-query renumbering window touch ≤ k rows
    * per query — query_id-keyed, nothing global. A query whose entire
    * top-k is relevant yields fewer than n rows (honest — there are no
    * hard negatives that deep; widen the run's k, don't fabricate).
    */
  def hardNegatives(run: DataFrame, qrels: DataFrame, n: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(n >= 1, s"n must be positive: $n")
    val w = Window.partitionBy("query_id").orderBy("rank")
    run.join(qrels.select(col("query_id"), col(idCol)),
        Seq("query_id", idCol), "left_anti")
      .withColumn("neg_rank", row_number().over(w).cast("int"))
      .filter(col("neg_rank") <= n)
      .select(col("query_id"), col("neg_rank"), col(idCol), col("score"))
  }

  /** Cumulative P(Poisson(1) ≤ k) for k = 0..7 (tail capped at 8) —
    * shared by [[bootstrapCI]] and its DuckDB oracle so the inverse-CDF
    * thresholds are the SAME doubles on both sides.
    */
  private[graft] val PoissonCum: Array[Double] = {
    var fact = 1.0
    var cum = 0.0
    (0 to 7).map { k =>
      if (k > 0) fact *= k
      cum += math.exp(-1.0) / fact
      cum
    }.toArray
  }

  /** Poisson(1) BOOTSTRAP confidence interval for a per-query metric
    * (the scalable bootstrap variant — Chamandy et al., "Estimating
    * Uncertainty for Massive Data Streams", Google TR 2012; public):
    * each of `b` replicates re-weights every query by an independent
    * Poisson(1) draw (the large-n limit of multinomial resampling),
    * the replicate estimate is the weighted mean, and the CI is the
    * nearest-rank 2.5%/97.5% of the replicate distribution. The draw
    * is the engine-portable md5-52bit uniform (the q133 discipline)
    * through the shared [[PoissonCum]] inverse CDF — every replicate
    * weight, estimate, and rank REPLAYS digit for digit in DuckDB.
    * Replicates whose weights all drew zero are dropped (counted in
    * `b_eff`); estimates round to 9 decimals before ranking (ties
    * break by replicate id) so the order is float-reorder-proof.
    *
    * Output: one row (point, ci_lo, ci_hi, b_eff).
    *
    * Scale shape: the fan-out is b rows per QUERY (queries × b tiny
    * 16-byte rows — never corpus-sized), the replicate aggregate is
    * map-side partial, and the final ranking window orders ≤ b rows
    * (bounded by the b parameter, not the data).
    */
  def bootstrapCI(perQuery: DataFrame, metricCol: String, b: Int = 200,
      seed: Long = 7L, queryCol: String = "query_id"): DataFrame = {
    require(b >= 40, s"need >= 40 replicates for 2.5/97.5 nearest-rank: $b")
    val u = conv(substring(md5(concat(
        col(queryCol).cast("string"), lit(":"),
        col("rep").cast("string"), lit(":" + seed))), 1, 13), 16, 10)
      .cast("double") / lit(4503599627370496.0)
    val w = PoissonCum.zipWithIndex.foldRight(
      lit(PoissonCum.length): Column) { case ((t, k), e) =>
        when(col("__u") < lit(t), lit(k)).otherwise(e)
      }
    val reps = perQuery
      .select(col(queryCol), col(metricCol).cast("double").as("__m"))
      .withColumn("rep", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("__u", u)
      .withColumn("__w", w.cast("double"))
    val ests = reps.groupBy("rep").agg(
        sum(col("__w") * col("__m")).as("num"), sum("__w").as("den"))
      .filter(col("den") > 0)
      .select(col("rep"), round(col("num") / col("den"), 9).as("est"))
    val ranked = ests.withColumn("r",
      row_number().over(Window.orderBy(col("est"), col("rep"))))
    val stats = ranked.agg(count(lit(1)).as("b_eff"))
    val point = perQuery.agg(avg(col(metricCol).cast("double")).as("point"))
    ranked.crossJoin(broadcast(stats))
      .filter(col("r") === greatest(lit(1), ceil(lit(0.025) * col("b_eff")))
        || col("r") === ceil(lit(0.975) * col("b_eff")))
      .groupBy("b_eff").agg(min("est").as("ci_lo"), max("est").as("ci_hi"))
      .crossJoin(broadcast(point))
      .select(round(col("point"), 6).as("point"),
        round(col("ci_lo"), 6).as("ci_lo"),
        round(col("ci_hi"), 6).as("ci_hi"),
        col("b_eff").cast("long").as("b_eff"))
  }

  /** Reliability table + Expected Calibration Error (the standard
    * equal-width-bin ECE of Naeini et al. / Guo et al., public): bin
    * predicted confidence into `bins` equal-width buckets, report per
    * bucket (n, mean confidence, accuracy), and attach
    * ECE = Σ_b (n_b/N)·|acc_b − conf_b| — the gap a trusted
    * probability estimate must close before its scores can gate
    * admission thresholds (a classifier can be 95% accurate and still
    * uselessly over-confident). Scores must sit in [0, 1]; score 1.0
    * folds into the top bucket (the usual convention).
    *
    * Scale shape: one bin-keyed aggregate over (double, boolean) pairs
    * (map-side partial — at most `bins` rows per task), one
    * `bins`-row ECE aggregate broadcast back. Nothing corpus-sized
    * moves or collects.
    */
  def calibration(df: DataFrame, scoreCol: String, correctCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need at least 2 bins: $bins")
    val table = df
      .withColumn("bin",
        least(floor(col(scoreCol) * bins), lit(bins - 1)).cast("int"))
      .groupBy("bin").agg(
        count(lit(1)).as("n"),
        avg(col(scoreCol)).as("conf"),
        avg(col(correctCol).cast("double")).as("acc"))
    val ece = table.agg(
      (sum(col("n") * abs(col("acc") - col("conf"))) / sum(col("n")))
        .as("ece"))
    table.crossJoin(broadcast(ece))
  }
}
