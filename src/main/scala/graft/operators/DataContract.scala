package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality EXPECTATIONS over a table set — the
  * contract gate a 100 TB ingest runs before anything downstream
  * trusts the batch (public art: Great Expectations / Deequ-style
  * checks, reduced to their relational core). Each check compiles to
  * ONE bounded aggregate (or one anti-join count for referential
  * integrity); the panel unions the verdicts:
  * (check_name, table_name, n_rows, n_violations, violation_share,
  * passed). Nothing collects corpus data — every check's result is a
  * single row.
  */
object DataContract {

  final case class CheckResult(df: DataFrame)

  private def panelRow(checkName: String, table: String, df: DataFrame,
      violation: Column): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        sum(violation.cast("long")).as("n_violations"))
      .select(lit(checkName).as("check_name"),
        lit(table).as("table_name"),
        col("n_rows"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"),
        round(coalesce(col("n_violations"), lit(0L)).cast("double") /
          greatest(col("n_rows"), lit(1L)), 6).as("violation_share"),
        (coalesce(col("n_violations"), lit(0L)) === 0L).as("passed"))

  /** Column must never be null. */
  def notNull(checkName: String, table: String, df: DataFrame,
      column: String): DataFrame =
    panelRow(checkName, table, df, col(column).isNull)

  /** Column values must be unique (violations = rows beyond the first
    * of each duplicated value; null keys count as violations — a
    * unique key admits no null).
    */
  def unique(checkName: String, table: String, df: DataFrame,
      column: String): DataFrame = {
    val perKey = df.groupBy(col(column)).agg(count(lit(1)).as("__n"))
    val extra = perKey.filter(col(column).isNotNull)
      .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("v")).head.getLong(0)
    val nulls = df.filter(col(column).isNull).count()
    val n = df.count()
    val viol = extra + nulls
    df.sparkSession.range(1).select(
      lit(checkName).as("check_name"), lit(table).as("table_name"),
      lit(n).as("n_rows"), lit(viol).as("n_violations"),
      round(lit(viol.toDouble / math.max(n, 1L)), 6)
        .as("violation_share"),
      lit(viol == 0L).as("passed"))
  }

  /** Arbitrary row predicate must hold (violation = !predicate; a null
    * predicate — null inputs — counts as a violation: an expectation
    * that can't be evaluated is not met).
    */
  def expect(checkName: String, table: String, df: DataFrame,
      predicate: Column): DataFrame =
    panelRow(checkName, table, df, !coalesce(predicate, lit(false)))

  /** Referential integrity: every non-null `fkCol` of `child` must
    * exist as `pkCol` in `parent` — one left-anti join count, never a
    * row-by-row probe.
    */
  def refIntegrity(checkName: String, childTable: String,
      child: DataFrame, fkCol: String, parent: DataFrame,
      pkCol: String): DataFrame = {
    val orphans = child.filter(col(fkCol).isNotNull)
      .join(parent.select(col(pkCol).as(fkCol)), Seq(fkCol), "left_anti")
      .count()
    val n = child.count()
    child.sparkSession.range(1).select(
      lit(checkName).as("check_name"), lit(childTable).as("table_name"),
      lit(n).as("n_rows"), lit(orphans).as("n_violations"),
      round(lit(orphans.toDouble / math.max(n, 1L)), 6)
        .as("violation_share"),
      lit(orphans == 0L).as("passed"))
  }

  /** Union a set of check rows into the audit panel, ordered for
    * deterministic output.
    */
  def panel(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "panel: no checks")
    checks.reduce(_.unionByName(_)).orderBy("check_name")
  }
}
