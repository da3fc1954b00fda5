package graft.operators

import graft.functions.expressions.KmvAgg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-cardinality sketches and cross-corpus set algebra on them
  * (KMV / theta-sketch family — Bar-Yossef et al. 2002, Beyer et al.
  * SIGMOD 2007, Apache DataSketches; all public).
  *
  * The corpus-curation questions these answer at 100 TB — "how many
  * distinct n-grams does each source contribute?", "how much does
  * crawl A overlap crawl B?" — are exactly the ones
  * `count(DISTINCT ...)` cannot price: an exact per-pair overlap is a
  * corpus-sized distinct exchange PER PAIR. The KMV sketch replaces
  * all of it with ≤ k 8-byte hashes per group (map-side bounded, any
  * merge order), and union/Jaccard/intersection then run on k-row
  * frames: one corpus scan total, no matter how many groups or pairs.
  *
  * Everything is deterministic and DuckDB-replayable: the hash is the
  * engine-portable md5-52-bit value, and "the k smallest distinct
  * hashes" is a pure function of the input set — so the oracle can
  * rebuild sketch, estimates, and pair algebra digit for digit
  * (`SELECT DISTINCT h ORDER BY h LIMIT k` + the same arithmetic).
  *
  * Estimator (Beyer et al. 2007, unbiased): with the sketch full,
  * est = (k-1) / u_k where u_k = h_k / 2^52 is the k-th smallest
  * normalized hash; with fewer than k distinct hashes seen the sketch
  * IS the distinct set and the count is exact. Union sketch = k
  * smallest of the merged sketches (a valid KMV of the union);
  * Jaccard = |{h in K(A∪B) : h in K(A) and h in K(B)}| / |K(A∪B)|;
  * intersection = Jaccard · est_union (the standard KMV composition).
  */
object Sketches {

  /** 2^52 — the hash space size, exact in a double. */
  private val Two52 = 4503599627370496.0

  /** Engine-portable 52-bit hash: first 13 hex digits of
    * md5(value ":" seed) — the q133/q170 uniform, kept as a LONG in
    * [0, 2^52). DuckDB replay:
    * `CAST(concat('0x', substr(md5(x || ':seed'), 1, 13)) AS BIGINT)`.
    */
  def hash52(c: Column, seed: Long): Column =
    conv(substring(md5(concat(c, lit(":" + seed))), 1, 13), 16, 10)
      .cast("long")

  /** Per-group KMV sketch of `item` rows → (groupCol, kmv:
    * array<long> ascending, ≤ k). One linear scan; each map task ships
    * ≤ k longs per group.
    */
  def kmvSketch(items: DataFrame, groupCol: String, item: Column, k: Int,
      seed: Long): DataFrame =
    items.groupBy(groupCol)
      .agg(KmvAgg.kmv(hash52(item, seed), k).as("kmv"))

  /** The KMV estimator over a (possibly not full) sketch column
    * (public so stats consumers like [[Analyze.columnStats]] can apply
    * it to sketches they carried through their own plans).
    */
  def estimate(kmv: Column, k: Int): Column = est(kmv, k)

  private def est(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit((k - 1).toDouble)
        / (element_at(kmv, k).cast("double") / lit(Two52)))

  /** Per-group distinct-count estimates: (groupCol, sk_size, h_max —
    * the k-th/last kept hash, the sketch's replayable fingerprint —
    * est_distinct). Exact when sk_size < k.
    */
  def kmvDistinct(items: DataFrame, groupCol: String, item: Column,
      k: Int, seed: Long): DataFrame =
    kmvSketch(items, groupCol, item, k, seed)
      .select(col(groupCol),
        size(col("kmv")).as("sk_size"),
        when(size(col("kmv")) > 0,
          element_at(col("kmv"), size(col("kmv")))).as("h_max"),
        est(col("kmv"), k).as("est_distinct"))

  /** Merge aggregator for per-pane sketches that land in one target
    * group (e.g. daily panes assembling a sliding window): k smallest
    * of the distinct union of the panes — a valid KMV of the union set
    * (the k smallest of a set are the k smallest of any cover of it).
    * Bounded: collect_list gathers ≤ panes-per-group arrays of ≤ k
    * longs, never raw rows.
    */
  def kmvMergeAgg(kmv: Column, k: Int): Column =
    slice(array_sort(array_distinct(flatten(collect_list(kmv)))), 1, k)

  /** Per-group NOVELTY vs the rest of the corpus — the theta-sketch
    * A-not-B operation (Apache DataSketches' aNotB): how many distinct
    * items does group g contribute that NO other group has? The
    * curation question behind source-acquisition priority ("does crawl
    * g add anything?"), exactly priced without a per-group
    * corpus-anti-join: on k-row sketch frames, novel_est(g) =
    * |{h ∈ K(all) : h ∈ K(g) ∧ h ∉ K(rest_g)}| / |K(all)| · est(all).
    *
    * Output: (groupCol, novel_in_k — the sketch-membership count —
    * novel_est). The corpus is scanned once (the sketch pass);
    * rest-of-corpus sketches are G·k-long merges of the OTHER groups'
    * sketches (valid KMVs of each complement by mergeability).
    */
  def kmvNovelty(items: DataFrame, groupCol: String, item: Column,
      k: Int, seed: Long, maxGroups: Int = 1000): DataFrame = {
    val g = items.select(col(groupCol)).distinct()
      .limit(maxGroups + 1).count()
    require(g <= maxGroups,
      s"kmvNovelty: $g groups exceeds maxGroups=$maxGroups")
    val sk = kmvSketch(items, groupCol, item, k, seed)
    val spark = items.sparkSession
    val skLocal = spark.createDataFrame(
      java.util.Arrays.asList(sk.collect(): _*), sk.schema)
    val a = skLocal.select(col(groupCol).as("g"), col("kmv").as("kg"))
    val b = skLocal.select(col(groupCol).as("o"), col("kmv").as("ko"))
    // complement sketches: merge of every OTHER group's sketch. With
    // a SINGLE group the g =!= o pairing is empty — left-join and
    // coalesce the missing complement to an empty sketch so a lone
    // group reports everything novel instead of silently vanishing
    // from the inner join.
    val rest = a.join(broadcast(b), col("g") =!= col("o"))
      .groupBy("g").agg(kmvMergeAgg(col("ko"), k).as("kr"))
    // the global sketch (one row): merge of all groups
    val all = skLocal.agg(kmvMergeAgg(col("kmv"), k).as("kall"))
    a.join(rest, Seq("g"), "left")
      .withColumn("kr",
        coalesce(col("kr"), array().cast("array<bigint>")))
      .crossJoin(broadcast(all))
      .withColumn("novel_in_k", size(filter(col("kall"),
        h => array_contains(col("kg"), h)
          && !array_contains(col("kr"), h))))
      .select(col("g").as(groupCol), col("novel_in_k"),
        (col("novel_in_k").cast("double") / size(col("kall"))
          * est(col("kall"), k)).as("novel_est"))
  }

  /** Pairwise overlap estimates between all group pairs (grp_a <
    * grp_b): union-sketch size, per-side and union distinct
    * estimates, KMV Jaccard, and the implied intersection estimate.
    * The pair frame is G²/2 rows of 2k longs each — `maxGroups`
    * guards the quadratic loudly (the corpus itself is touched ONCE,
    * in the sketch pass).
    */
  def kmvOverlap(items: DataFrame, groupCol: String, item: Column,
      k: Int, seed: Long, maxGroups: Int = 1000): DataFrame = {
    // limit-probe the group universe BEFORE anything collects (the
    // Frequency.topNgramsExactByGroup discipline)
    val g = items.select(col(groupCol)).distinct()
      .limit(maxGroups + 1).count()
    require(g <= maxGroups,
      s"kmvOverlap: $g groups exceeds maxGroups=$maxGroups — the " +
        "G^2/2 pair frame is the quadratic you must opt into; raise " +
        "maxGroups deliberately")
    val sk = kmvSketch(items, groupCol, item, k, seed)
    // one corpus scan total: the sketch frame (≤ maxGroups × k longs,
    // guarded above) collects once and re-enters as a local relation,
    // so the a/b self-join cannot re-run the scan
    val spark = items.sparkSession
    val skLocal = spark.createDataFrame(
      java.util.Arrays.asList(sk.collect(): _*), sk.schema)
    val a = skLocal.select(col(groupCol).as("grp_a"), col("kmv").as("ka"))
    val b = skLocal.select(col(groupCol).as("grp_b"), col("kmv").as("kb"))
    // union sketch: k smallest of the merged sketches (both inputs
    // ascending; array_union dedups, array_sort restores order)
    val uk = slice(array_sort(array_union(col("ka"), col("kb"))), 1, k)
    a.join(broadcast(b), col("grp_a") < col("grp_b"))
      .withColumn("uk", uk)
      .withColumn("inter_cnt", size(filter(col("uk"),
        h => array_contains(col("ka"), h) && array_contains(col("kb"), h))))
      .select(col("grp_a"), col("grp_b"),
        size(col("uk")).as("union_k"),
        est(col("ka"), k).as("est_a"),
        est(col("kb"), k).as("est_b"),
        est(col("uk"), k).as("est_union"),
        (col("inter_cnt").cast("double") / size(col("uk")))
          .as("jaccard_est"),
        (col("inter_cnt").cast("double") / size(col("uk"))
          * est(col("uk"), k)).as("est_inter"))
  }
}
