package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a DataFrame —
  * the bounded-state frequency summary, and its classic second use:
  * inner-product (equi-join size) estimation between two frequency
  * vectors without materializing either (AMS/CMS join-size estimation,
  * the cardinality-estimation workhorse of the query-optimizer
  * literature).
  *
  * Representation: the sketch is a SPARSE frame of occupied cells
  * (grp, j, b, cnt) — row j of d, bucket b of w, bucket chosen by the
  * engine-portable md5-52bit hash under seed (seed + j), counts summed.
  * Scale shape: the explode-by-d is collapsed by map-side partial
  * aggregation into ≤ d·w cells per group per task, so the exchange is
  * bounded by G·d·w cells no matter the corpus size; every estimate
  * afterwards runs on cell frames.
  *
  * Guarantees that replay exactly (fixed hashes, pure arithmetic, so
  * DuckDB rebuilds every cell and estimate digit for digit):
  * point estimates NEVER undercount (est = min_j cms[j][b_j(x)] ≥
  * true count), and join-size estimates never undercount the true
  * inner product (both sides non-negative). The probabilistic
  * ε = e/w closeness bound is over random hash draws and is reported
  * as a measured overshoot column, not certified.
  */
object CountMin {

  /** Row-j bucket of `item`: md5-52bit(item, seed + j) mod w. */
  def bucket(item: Column, j: Int, w: Int, seed: Long): Column =
    Sketches.hash52(item, seed + j) % w

  /** Sparse CMS per group over `item` occurrences (multiset counts):
    * (grp, j, b, cnt), only occupied cells.
    */
  def cmsByGroup(items: DataFrame, groupCol: String, item: Column,
      d: Int, w: Int, seed: Long): DataFrame = {
    require(d >= 1 && w >= 2, s"bad CMS shape: d=$d w=$w")
    items.select(col(groupCol).as("grp"),
      explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), bucket(item, j, w, seed).as("b"))): _*))
        .as("jb"))
      .select(col("grp"), col("jb.j").as("j"), col("jb.b").as("b"))
      .groupBy("grp", "j", "b")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `probes` (grp, item rows): min over
    * the d rows of the probed cells, absent cells counting 0. Output:
    * (grp, item, est). est ≥ the true multiset count, always.
    */
  def pointEstimates(cms: DataFrame, probes: DataFrame, itemCol: String,
      d: Int, w: Int, seed: Long): DataFrame = {
    val p = probes.select(col("grp"), col(itemCol),
      explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), bucket(col(itemCol), j, w, seed).as("b"))): _*))
        .as("jb"))
      .select(col("grp"), col(itemCol), col("jb.j").as("j"),
        col("jb.b").as("b"))
    p.join(cms, Seq("grp", "j", "b"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy("grp", itemCol)
      .agg(min(col("cnt")).as("est"))
  }

  /** Pairwise equi-join size estimates between all group pairs: for
    * each (grp_a < grp_b), min over j of Σ_b cntA[j][b]·cntB[j][b] —
    * an upper bound on Σ_item cntA(item)·cntB(item), computed entirely
    * on cell frames (G·d·w rows), never re-touching the corpus.
    */
  def joinSizeEstimates(cms: DataFrame): DataFrame = {
    val a = cms.select(col("grp").as("grp_a"), col("j"), col("b"),
      col("cnt").as("ca"))
    val b = cms.select(col("grp").as("grp_b"), col("j"), col("b"),
      col("cnt").as("cb"))
    a.join(b, Seq("j", "b")).where(col("grp_a") < col("grp_b"))
      .groupBy("grp_a", "grp_b", "j")
      .agg(sum(col("ca") * col("cb")).as("ip"))
      .groupBy("grp_a", "grp_b")
      .agg(min(col("ip")).as("est_join"))
  }
}
