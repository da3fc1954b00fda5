package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters in Spark 4's
  * classic API — the standard extension-point shim for libraries that
  * define native Catalyst expressions (Column no longer exposes `.expr`
  * publicly since the connect/classic split).
  */
object GraftExprBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a custom logical plan (private[sql] in Spark 4). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Recursively nullable form of a schema (`private[spark]` in
    * DataType) — file-source relations force this on inferred schemas,
    * so a footer-derived schema must apply it too to be
    * indistinguishable from inference.
    */
  def asNullable(s: org.apache.spark.sql.types.StructType):
      org.apache.spark.sql.types.StructType = s.asNullable

  /** The fully optimized logical plan behind a DataFrame — used by plan
    * rewrite rules that splice a DataFrame-built subtree into an
    * already-optimized tree (the main optimizer batches will not visit
    * the spliced subtree again, so it must arrive pre-optimized, e.g.
    * with ResolvedHint already folded into join hints).
    */
  def optimizedPlan(df: DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.optimizedPlan
}
