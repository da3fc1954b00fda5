package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between a reference corpus and a new
  * increment — the QA gate production ingest pipelines run per batch
  * before letting it into the training mix. The metric is the
  * Population Stability Index (public, standard in model monitoring):
  *
  *   PSI = Σ_buckets (p_cur − p_ref) · ln(p_cur / p_ref)
  *
  * with the usual reading: < 0.1 stable, 0.1–0.25 moderate shift,
  * > 0.25 drifted. Bucket shares are Laplace-smoothed
  * ((count + 0.5) / (N + 0.5·buckets)) so an empty bucket on either
  * side contributes a large-but-finite term instead of ±∞.
  *
  * Scale shape: ONE map-side-combinable bucket-count aggregate per
  * side (the exchange carries ≤ `buckets` rows), a bucket-keyed join
  * of two ≤-`buckets`-row frames, and a broadcast total — the corpora
  * are each touched once, nothing corpus-keyed ever shuffles.
  */
object Drift {

  /** Per-bucket PSI decomposition of `metric` over `buckets`
    * equal-width bins of [lo, hi] (outside values clamp to the edge
    * bins). Returns one row per bucket: (bucket, n_ref, n_cur, p_ref,
    * p_cur, contrib, psi) — `psi` is the total, repeated per row so a
    * single-row consumer can filter `bucket = 0`.
    */
  def psi(ref: DataFrame, cur: DataFrame, metric: Column,
      buckets: Int, lo: Double, hi: Double): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets: $buckets")
    require(lo < hi, s"need lo < hi: ($lo, $hi)")
    val width = (hi - lo) / buckets
    def bucketed(df: DataFrame, name: String) = df
      .select(least(lit(buckets - 1), greatest(lit(0),
        floor((metric.cast("double") - lo) / width).cast("int")))
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(name))
    val spark = ref.sparkSession
    import spark.implicits._
    val all = (0 until buckets).toDF("bucket")
    val joined = all
      .join(bucketed(ref, "n_ref"), Seq("bucket"), "left")
      .join(bucketed(cur, "n_cur"), Seq("bucket"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    // an EMPTY side must fail loudly, not smooth into a uniform pseudo-
    // distribution: Laplace smoothing over zero rows yields a finite,
    // often sub-threshold PSI, so a misconfigured gate (a reference
    // filter matching nothing) would silently admit every batch. The
    // guard lives in the plan — no extra pass, raises at materialization
    // (the refuse-don't-guess discipline the other operators follow).
    val tot = joined.agg(sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"))
      .select(
        when(col("t_ref") === 0L, raise_error(lit(
          "Drift.psi: reference side is EMPTY — a zero-row reference " +
            "smooths to a uniform pseudo-distribution and would admit " +
            "any batch; fix the reference selection")))
          .otherwise(col("t_ref")).as("t_ref"),
        when(col("t_cur") === 0L, raise_error(lit(
          "Drift.psi: current side is EMPTY — a zero-row batch smooths " +
            "to a uniform pseudo-distribution; fix the batch selection")))
          .otherwise(col("t_cur")).as("t_cur"))
    val smoothed = joined.crossJoin(broadcast(tot))
      .withColumn("p_ref",
        (col("n_ref") + 0.5) / (col("t_ref") + 0.5 * buckets))
      .withColumn("p_cur",
        (col("n_cur") + 0.5) / (col("t_cur") + 0.5 * buckets))
      .withColumn("contrib",
        (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
    smoothed
      .crossJoin(broadcast(
        smoothed.agg(sum("contrib").as("psi_total"))))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        round(col("p_ref"), 6).as("p_ref"),
        round(col("p_cur"), 6).as("p_cur"),
        round(col("contrib"), 6).as("contrib"),
        round(col("psi_total"), 6).as("psi"))
  }

  /** EMBEDDING-SPACE drift between two corpus snapshots — the vector
    * analogue of the scalar PSI gate, for the "did the new crawl/model
    * version shift the embedding distribution" question an index
    * operator asks before serving a refreshed corpus. Three standard
    * signals in one row:
    *
    *  - `centroid_cos`: cosine between the two snapshots' mean vectors
    *    (population direction shift; 1.0 = unmoved),
    *  - `ref_norm_avg` / `cur_norm_avg`: mean L2 norms (a model or
    *    normalization change shows up here first),
    *  - `psi`: PSI over each side's cosine-to-REFERENCE-centroid
    *    distribution in [-1, 1] — the angular SHAPE drift that centroid
    *    agreement alone misses (two snapshots can share a mean while
    *    one collapses toward it).
    *
    * Scale shape: one VectorMeanAgg pass per side (d doubles per task),
    * one scalar-cosine projection pass feeding [[psi]]'s bounded bucket
    * aggregate. The two d-length centroids are collected to the driver
    * (bounded — the rotationModel discipline) so the projection is a
    * literal, not a join.
    */
  def embeddingDrift(ref: DataFrame, cur: DataFrame,
      vecCol: String = "embedding", buckets: Int = 10): DataFrame = {
    import graft.functions.{VectorMeanAgg, VectorOps}
    def centroid(df: DataFrame): Array[Double] =
      df.agg(VectorMeanAgg.asColumn(col(vecCol)).as("c"))
        .head().getSeq[Double](0).toArray
    val cRef = centroid(ref)
    val cCur = centroid(cur)
    require(cRef.nonEmpty && cCur.nonEmpty,
      "embeddingDrift: empty snapshot")
    // an embedding-DIMENSION change (a model swap) is precisely the
    // drift event this gate exists to catch — truncating the cosine to
    // the shorter centroid would grade the swap as a mild shift instead
    // of refusing (the refuse-don't-guess discipline)
    require(cRef.length == cCur.length,
      s"embeddingDrift: snapshot dimensions differ — reference dim=" +
        s"${cRef.length}, current dim=${cCur.length}; an embedding-" +
        "model swap must be handled as a re-embed, not graded as drift")
    val centroidCos = {
      // double arithmetic, strict left-to-right (the oracle-parity rule)
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < cRef.length) {
        d += cRef(i) * cCur(i); na += cRef(i) * cRef(i)
        nb += cCur(i) * cCur(i); i += 1
      }
      val n = math.sqrt(na) * math.sqrt(nb)
      if (n == 0.0) 0.0 else d / n
    }
    def cosToRef(df: DataFrame) = df.select(
      VectorOps.cosineHof(col(vecCol), typedLit(cRef)).as("m"))
    val psiRow = psi(cosToRef(ref), cosToRef(cur), col("m"), buckets,
      lo = -1.0, hi = 1.0).filter(col("bucket") === 0).select("psi")
    ref.agg(count(lit(1)).as("n_ref"),
        round(avg(VectorOps.l2Norm(col(vecCol))), 6).as("ref_norm_avg"))
      .crossJoin(cur.agg(count(lit(1)).as("n_cur"),
        round(avg(VectorOps.l2Norm(col(vecCol))), 6).as("cur_norm_avg")))
      .crossJoin(psiRow)
      .select(col("n_ref"), col("n_cur"),
        round(lit(centroidCos), 6).as("centroid_cos"),
        col("ref_norm_avg"), col("cur_norm_avg"), col("psi"))
  }
}
