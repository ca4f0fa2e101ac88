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
}
