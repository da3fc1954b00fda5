package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality EXPECTATIONS over a table set — the
  * contract gate a 100 TB ingest runs before anything downstream
  * trusts the batch (public art: Great Expectations / Deequ-style
  * checks, reduced to their relational core). Every check compiles to
  * ONE lazy aggregate frame (or one anti-join-shaped aggregate for
  * referential integrity) — nothing executes at construction, so a
  * panel composes, caches, and schedules like any other relation;
  * [[panelFused]] goes further and computes ALL of one table's
  * row-predicate checks in a single aggregate pass (the Deequ shape —
  * one scan per table, not one per check). The panel unions the
  * verdicts: (check_name, table_name, n_rows, n_violations,
  * violation_share, passed). Nothing collects corpus data — every
  * check's result is a single row.
  */
object DataContract {

  /** (n_rows, n_violations) single-row aggregate → panel-row shape. */
  private def panelShape(checkName: String, table: String,
      agg1: DataFrame): DataFrame =
    agg1.select(lit(checkName).as("check_name"),
      lit(table).as("table_name"),
      col("n_rows"),
      coalesce(col("n_violations"), lit(0L)).as("n_violations"),
      round(coalesce(col("n_violations"), lit(0L)).cast("double") /
        greatest(col("n_rows"), lit(1L)), 6).as("violation_share"),
      (coalesce(col("n_violations"), lit(0L)) === 0L).as("passed"))

  private def panelRow(checkName: String, table: String, df: DataFrame,
      violation: Column): DataFrame =
    panelShape(checkName, table,
      df.agg(count(lit(1)).as("n_rows"),
        sum(violation.cast("long")).as("n_violations")))

  /** Column must never be null. */
  def notNull(checkName: String, table: String, df: DataFrame,
      column: String): DataFrame =
    panelRow(checkName, table, df, col(column).isNull)

  /** Column values must be unique (violations = rows beyond the first
    * of each duplicated value; null keys count as violations — a
    * unique key admits no null). One LAZY aggregate:
    * n − count(distinct col) equals (rows beyond first per duplicated
    * non-null key) + (null rows), because count(distinct) ignores
    * nulls — no eager `.head`/`.count`, no second scan.
    */
  def unique(checkName: String, table: String, df: DataFrame,
      column: String): DataFrame =
    panelShape(checkName, table,
      df.agg(count(lit(1)).as("n_rows"),
          countDistinct(col(column)).as("__ndv"))
        .select(col("n_rows"),
          (col("n_rows") - col("__ndv")).as("n_violations")))

  /** Arbitrary row predicate must hold (violation = !predicate; a null
    * predicate — null inputs — counts as a violation: an expectation
    * that can't be evaluated is not met).
    */
  def expect(checkName: String, table: String, df: DataFrame,
      predicate: Column): DataFrame =
    panelRow(checkName, table, df, !coalesce(predicate, lit(false)))

  /** Referential integrity: every non-null `fkCol` of `child` must
    * exist as `pkCol` in `parent`. One LAZY left join against the
    * deduplicated parent-key set folded straight into the counting
    * aggregate — a violation is a non-null fk with no parent hit; the
    * join broadcasts when the key set is small and never multiplies
    * child rows (keys are distinct).
    */
  def refIntegrity(checkName: String, childTable: String,
      child: DataFrame, fkCol: String, parent: DataFrame,
      pkCol: String): DataFrame = {
    val parentKeys = parent.select(col(pkCol).as(fkCol))
      .filter(col(fkCol).isNotNull).distinct()
      .withColumn("__hit", lit(1))
    panelShape(checkName, childTable,
      child.join(parentKeys, Seq(fkCol), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum((col(fkCol).isNotNull && col("__hit").isNull)
            .cast("long")).as("n_violations")))
  }

  /** ALL of one table's row-predicate checks in ONE aggregate pass —
    * the scan-sharing form for wide contracts (a panel of N
    * [[notNull]]/[[expect]] checks over one table would scan it N
    * times; this scans ONCE). `checks` are (check_name, predicate)
    * pairs under the [[expect]] rule (null predicate = violation;
    * express not-null as `col(c).isNotNull`). Output is row-for-row
    * what the equivalent per-check [[panel]] would produce — N panel
    * rows exploded from the single-row aggregate, still fully lazy.
    */
  def panelFused(table: String, df: DataFrame,
      checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "panelFused: no checks")
    val sums = checks.zipWithIndex.map { case ((_, pred), i) =>
      sum((!coalesce(pred, lit(false))).cast("long")).as(s"__v$i")
    }
    val agg1 = df.agg(count(lit(1)).as("n_rows"), sums: _*)
    val entries = array(checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("check_name"),
        coalesce(col(s"__v$i"), lit(0L)).as("n_violations"))
    }: _*)
    agg1.select(col("n_rows"), explode(entries).as("e"))
      .select(col("e.check_name"), lit(table).as("table_name"),
        col("n_rows"), col("e.n_violations"),
        round(col("e.n_violations").cast("double") /
          greatest(col("n_rows"), lit(1L)), 6).as("violation_share"),
        (col("e.n_violations") === 0L).as("passed"))
  }

  /** Quarantine ROUTING — the batch twin of
    * [[graft.streaming.StreamOps.streamingContractGate]]: split `df` on
    * `predicate` into the trusted main set and the quarantined
    * violation set (never dropped — a violation is evidence), plus the
    * one-row audit frame (n_rows, n_violations). All three are LAZY
    * views over `df` under the gate's null rule (a null predicate is a
    * violation); a caller writing both halves should checkpoint/cache
    * `df` first so the split doesn't recompute the source twice.
    */
  final case class Routed(main: DataFrame, quarantine: DataFrame,
      audit: DataFrame)

  def route(df: DataFrame, predicate: Column): Routed = {
    val ok = coalesce(predicate, lit(false))
    Routed(
      df.filter(ok),
      df.filter(!ok),
      df.agg(count(lit(1)).as("n_rows"),
        coalesce(sum((!ok).cast("long")), lit(0L)).as("n_violations")))
  }

  /** Union a set of check rows into the audit panel, ordered for
    * deterministic output.
    */
  def panel(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "panel: no checks")
    checks.reduce(_.unionByName(_)).orderBy("check_name")
  }
}
