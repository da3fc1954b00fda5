package graft.operators

import graft.functions.expressions.{FreqSketchAgg, HashExpressions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-frequency operators: EXACT top-k heavy hitters priced for
  * 100 TB by a sketch-prune-verify plan.
  *
  * The naive exact formulation — groupBy over every n-gram occurrence —
  * shuffles the full corpus token stream (at 100 TB, the single biggest
  * exchange a frequency query can emit). The classic two-pass
  * alternative ([[FreqSketchAgg]], Misra–Gries):
  *
  *   1. SKETCH pass: one linear scan aggregating a mergeable bounded
  *      summary — each map task ships ≤ 2·capacity rows, the reduce is
  *      a single tiny merge. Yields a candidate set guaranteed to
  *      contain every item with true count > delta (the sketch's
  *      tracked decrement mass).
  *   2. EXACT pass: one more linear scan counting ONLY candidate
  *      n-grams — the candidate list broadcasts, the semi-joined
  *      stream is a vanishing fraction of the corpus, and the groupBy
  *      carries ≤ |candidates| keys per task after map-side combine.
  *
  * The result is then CERTIFIED exact: if the k-th candidate's exact
  * count exceeds delta, no non-candidate can reach the top k (any
  * absent item's true count ≤ delta). If certification fails the
  * operator throws with the measured gap instead of returning a
  * plausibly-wrong ranking — raise `capacity` (delta shrinks as
  * capacity grows) and rerun. Hence the DuckDB oracle can be the plain
  * exact top-k: whenever this returns, it IS the exact answer.
  */
object Frequency {

  /** Exact top-k most frequent word n-grams, sketch-pruned and
    * certified. Output: (rank, ngram, cnt) with ties broken (cnt desc,
    * ngram asc) — a total order, deterministic at every scale.
    */
  def topNgramsExact(df: DataFrame, n: Int, k: Int, capacity: Int,
      textCol: String = "text"): DataFrame =
    topNgramsExactWithDelta(df, n, k, capacity, textCol)._1

  /** [[topNgramsExact]] plus the sketch's tracked decrement mass
    * (delta) — the certification's evidence. delta is partitioning-
    * dependent (a merge-order artifact), so it must never enter a
    * deterministic output; expose it for measurement and for pinning
    * "certification had teeth" (delta > 0) on Zipfian corpora, where
    * the distinct-gram count exceeds capacity and purges actually
    * happen (q147 — a near-uniform corpus certifies trivially at
    * delta = 0, which proves nothing about the refusal rule).
    */
  def topNgramsExactWithDelta(df: DataFrame, n: Int, k: Int,
      capacity: Int, textCol: String = "text"): (DataFrame, Long) = {
    require(n >= 1, s"n must be positive: $n")
    require(k >= 1, s"k must be positive: $k")
    require(capacity >= k, s"capacity ($capacity) must be >= k ($k)")
    val spark = df.sparkSession
    val grams = df.select(explode(
      HashExpressions.shingles_k_positional(split(col(textCol), " "), n))
      .as("g"))
    // pass 1: the bounded mergeable sketch (one row out)
    val sk = grams.agg(FreqSketchAgg.freq_sketch(col("g"), capacity)
      .as("sk")).select(col("sk.items.item").as("cands"), col("sk.delta"))
      .head()
    val cands = sk.getSeq[String](0)
    val delta = sk.getLong(1)
    require(cands.size >= k,
      s"topNgramsExact: sketch kept ${cands.size} < k=$k candidates — " +
        "the corpus has fewer distinct n-grams than k, or capacity is " +
        "too small")
    // pass 2: exact counts over candidates only (broadcast semi-join)
    import spark.implicits._
    val candDf = cands.toDF("g")
    val exact = grams.join(broadcast(candDf), Seq("g"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("g")).limit(k)
      .collect() // k-bounded driver collect (the kMeans discipline)
    val kth = exact.last.getLong(1)
    require(kth > delta,
      s"topNgramsExact NOT certifiable: k-th exact count $kth <= sketch " +
        s"delta $delta — an unsketched n-gram could outrank it. Raise " +
        s"capacity (= $capacity) until delta < the k-th count.")
    (exact.zipWithIndex.map { case (r, i) =>
      (i + 1, r.getString(0), r.getLong(1))
    }.toSeq.toDF("rank", "ngram", "cnt"), delta)
  }

  /** [[topNgramsExact]] PER GROUP (per-language/per-domain top terms —
    * the stratified form curation dashboards want): one sketch per
    * group in a single grouped aggregate, candidates still bounded
    * (≤ 2·capacity per group, `maxGroups` guarded loudly), one exact
    * pass pruned by the broadcast (group, ngram) candidate list,
    * per-group certification with the same refuse-don't-guess rule.
    * Output (group, rank, ngram, cnt), ties (cnt desc, ngram asc).
    */
  def topNgramsExactByGroup(df: DataFrame, groupCol: String, n: Int,
      k: Int, capacity: Int, textCol: String = "text",
      maxGroups: Int = 10000): DataFrame = {
    require(n >= 1 && k >= 1 && capacity >= k,
      s"need n,k >= 1 and capacity >= k: ($n, $k, $capacity)")
    val spark = df.sparkSession
    import spark.implicits._
    // group keys ride driver-side maps as strings (an int domain id or
    // any other type must not ClassCastException on getString) — cast
    // in, cast back on output
    val groupType = df.schema(groupCol).dataType
    val grams = df.select(col(groupCol).cast("string").as("grp"), explode(
      HashExpressions.shingles_k_positional(split(col(textCol), " "), n))
      .as("g"))
    // limit-probe, not a full count: stops scanning once maxGroups+1
    // distinct groups are seen
    val sketches = df.select(col(groupCol).as("grp")).distinct()
      .limit(maxGroups + 1).count()
    require(sketches <= maxGroups,
      s"topNgramsExactByGroup: $sketches groups exceeds maxGroups=" +
        s"$maxGroups — the per-group candidate collect would not stay " +
        "driver-bounded; raise maxGroups deliberately or pre-aggregate")
    val sk = grams.groupBy("grp")
      .agg(FreqSketchAgg.freq_sketch(col("g"), capacity).as("sk"))
      .select(col("grp"), col("sk.items.item").as("cands"),
        col("sk.delta"))
      .collect()
    val candRows = sk.flatMap(r =>
      r.getSeq[String](1).map(g => (r.getString(0), g))).toSeq
    val deltas = sk.map(r => r.getString(0) -> r.getLong(2)).toMap
    val candDf = candRows.toDF("grp", "g")
    val exact = grams.join(broadcast(candDf), Seq("grp", "g"))
      .groupBy("grp", "g").agg(count(lit(1)).as("cnt"))
      .collect() // bounded by groups x 2*capacity
      .groupBy(_.getString(0))
    val out = exact.toSeq.sortBy(_._1).flatMap { case (grp, rows) =>
      val top = rows.map(r => (r.getString(1), r.getLong(2)))
        .sortBy { case (g, c) => (-c, g) }.take(k)
      val delta = deltas(grp)
      // fewer than k candidates is only provably-complete when the
      // sketch never purged (delta 0 -> it held every distinct gram)
      require(if (top.size < k) delta == 0L else top.last._2 > delta,
        s"topNgramsExactByGroup NOT certifiable for group '$grp': " +
          (if (top.size < k)
            s"only ${top.size} candidates survived but delta $delta > 0"
          else s"k-th exact count ${top.last._2} <= sketch delta $delta") +
          s" — raise capacity (= $capacity)")
      top.zipWithIndex.map { case ((g, c), i) => (grp, i + 1, g, c) }
    }
    out.toDF("grp", "rank", "ngram", "cnt")
      .withColumn("grp", col("grp").cast(groupType))
      .withColumnRenamed("grp", groupCol)
  }
}
