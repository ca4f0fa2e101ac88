package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-flight data-quality metrics via `Dataset.observe` — counters that
  * ride the job's existing pass instead of costing a second scan.
  *
  * At 100 TB the difference is structural: a post-hoc
  * `df.filter(k.isNull).count()` quality check re-reads the table; an
  * observation is a zero-shuffle accumulator folded into whatever action
  * already runs (the write, the aggregate), surfaced on the
  * `QueryExecution` afterwards and, for streams, in every
  * `StreamingQueryProgress`. The reference's sink logs per-statement
  * timing ([[graft.sinks.WriteTimingListener]]); this is the data-shape
  * half of the same operability story.
  */
object Observe {

  /** Standard load-quality counters for a keyed, valued relation:
    * row count, null-key count, value total. Read back after the action
    * from `df.queryExecution.observedMetrics(name)` (batch — the action
    * must execute THIS Dataset's plan, e.g. collect/write; `count()`
    * plans a separate query) or `StreamingQueryProgress.observedMetrics`
    * (streaming, every micro-batch). */
  def withLoadMetrics(df: DataFrame, name: String,
                      keyCol: String, valueCol: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("null_keys"),
      sum(col(valueCol)).as("total_value"))

}
