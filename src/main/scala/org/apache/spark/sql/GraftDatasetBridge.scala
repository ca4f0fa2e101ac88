package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access shim for graft's custom logical plans: `Dataset.ofRows` — the
  * only way to wrap a hand-built `LogicalPlan` in a `DataFrame` — is
  * `private[sql]`, so this one-method bridge lives in the
  * `org.apache.spark.sql` package. No Spark internals are modified; this
  * is the established pattern for libraries that add whole operators
  * (logical node + strategy via `SparkSessionExtensions`). */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** `Column` ↔ catalyst `Expression` (both directions are
    * `private[sql]` in Spark 4's ColumnNode world). */
  def expression(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Splits a possibly-`.desc`/`.asc`-wrapped sort column into its bare
    * value column and its direction (true = descending). Spark 4 keeps
    * the sort wrapper as a `ColumnNode`, so the unwrap happens at node
    * level (`Column.node` is `private[sql]`). */
  def sortInfo(c: Column): (Column, Boolean) = c.node match {
    case so: internal.SortOrder =>
      (Column(so.child), so.sortDirection == internal.SortOrder.Descending)
    case _ => (c, false)
  }
}
