package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 — build validity INTERVALS from a
  * change/event feed (public art: Kimball SCD2, Delta/Iceberg merge
  * patterns): for each key ordered by time, consecutive runs of the
  * same attribute tuple collapse to one row carrying
  * (valid_from, valid_to, is_current), half-open [from, to). The shape
  * every warehouse dimension load and every point-in-time training
  * join ([[AsOfJoin]]'s storage-side complement) needs.
  *
  * Scale shape: one key-partitioned window pass (lag for change
  * detection, lead for interval close) — the only exchange is the hash
  * partition on the key; no self-join, no driver state. Ties at the
  * same (key, ts) are broken by the attribute tuple itself so the
  * output is deterministic on replayed feeds.
  */
object Scd2 {

  /** Collapse `changes(keyCol, tsCol, attrCols...)` into SCD2 rows:
    * (keyCol, attrCols..., valid_from, valid_to, is_current). A change
    * row whose attributes equal the key's previous state is a no-op
    * and folds into the open interval (the dedup every CDC feed
    * needs); `valid_to` is null on each key's current row.
    */
  def fromChanges(
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "fromChanges: no attribute columns")
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, struct(attrCols.map(col): _*).asc)
    // change detection: a row opens a new interval iff its attribute
    // tuple differs from the key's previous row (null-safe compare —
    // <=> — so null attributes don't read as perpetual change)
    val tup = struct(attrCols.map(col): _*)
    val marked = changes
      .withColumn("__prev", lag(tup, 1).over(ord))
      .withColumn("__new",
        (col("__prev").isNull || !(tup <=> col("__prev"))).cast("int"))
    // the close window uses the SAME (ts, tuple) ordering as the
    // change-detection window so timestamp ties order identically
    val opens = marked.filter(col("__new") === 1)
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to",
        lead(col(tsCol), 1).over(Window.partitionBy(col(keyCol))
          .orderBy(col(tsCol).asc, tup.asc)))
    opens.select(
      Seq(col(keyCol)) ++ attrCols.map(col) ++ Seq(
        col("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.as("is_current")): _*)
  }

  /** Point-in-time lookup against an SCD2 dimension: every probe row
    * (keyCol, tsCol) joins the interval that covered its timestamp —
    * [valid_from, valid_to) — the training-data join that prevents
    * temporal leakage (features as they WERE, not as they are). A
    * probe before the key's first interval gets no match (left join,
    * null attributes) rather than silently reading the future.
    */
  def asOfLookup(
      probes: DataFrame,
      dim: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame =
    probes.join(dim,
      probes(keyCol) === dim(keyCol) &&
        probes(tsCol) >= dim("valid_from") &&
        (dim("valid_to").isNull || probes(tsCol) < dim("valid_to")),
      "left")
      .drop(dim(keyCol))
}
