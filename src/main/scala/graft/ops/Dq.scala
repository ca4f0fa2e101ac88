package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the check-spec ADT behind
  * [[Profile.qDqChecks]], factored so a pipeline declares WHAT to verify
  * and the compiler below decides the plan shape (deequ's "unit tests for
  * data" split between declaration and analysis planning).
  *
  * Plan-shape contract, unchanged from the hand-written version:
  *
  *   - every scalar check on the same table compiles into ONE wide
  *     aggregate pass (each check is a column of that aggregate, map-side
  *     combined) — adding a check adds a COLUMN, not a scan;
  *   - each referential-integrity check is one LEFT ANTI join on the key
  *     (broadcast-able when the parent key set is small, shuffled-on-key
  *     otherwise — never a cartesian);
  *   - output is one row per check: (check_name, violations, pass), the
  *     gate a pipeline evaluates before publishing a snapshot.
  *
  * The same specs also compile to an IN-FLIGHT variant
  * ([[Dq.observed]]): `Dataset.observe` accumulators that ride a write's
  * existing pass — zero extra scans — surfacing violations on the
  * `QueryExecution` (batch) or every `StreamingQueryProgress` (streams).
  * Exact uniqueness is the one check that cannot ride along (observe
  * forbids distinct aggregates); it degrades to an
  * `approx_count_distinct` estimate in-flight, with the exact version
  * still enforced by the post-hoc suite.
  */
object Dq {

  sealed trait Check {
    def table: String
    /** Stable check identity — the suite's output key. */
    def name: String
    /** Aggregate counting violating rows; compiled with every other check
      * on `table` into one wide pass. */
    def agg: Column
    /** observe()-safe variant (deterministic, no distinct aggregates);
      * None = the check cannot ride in-flight (needs a join or exact
      * distinct) and only runs in the post-hoc suite. */
    def inFlight: Option[Column] = Some(agg)
  }

  /** No duplicate values of `column`. Exact (count distinct) in the
    * suite; approximate in-flight. */
  final case class Unique(table: String, column: String) extends Check {
    def name = s"$table.$column unique"
    def agg: Column = count(lit(1)) - countDistinct(col(column))
    // HLL estimate: catches gross duplication mid-write; the exact gate
    // is the post-hoc suite. Clamped at 0 — the ±2% estimate may exceed
    // the true count on clean data, and a negative "violations" reads as
    // nonsense.
    override def inFlight: Option[Column] =
      Some(greatest(count(lit(1)) - approx_count_distinct(col(column)), lit(0L)))
  }

  final case class NotNull(table: String, column: String) extends Check {
    def name = s"$table.$column not_null"
    def agg: Column = count(lit(1)) - count(col(column))
  }

  /** Values inside [lo, hi]; `label` names the expectation (freshness
    * windows, domain bounds) in the suite output. */
  final case class InRange(table: String, column: String,
                           lo: Column, hi: Column,
                           label: String = "in_range") extends Check {
    def name = s"$table.$column $label"
    def agg: Column = count(when(col(column) < lo || col(column) > hi, 1))
  }

  /** Generic row predicate that every row must satisfy. */
  final case class Satisfies(table: String, label: String,
                             predicate: Column) extends Check {
    def name = s"$table.$label"
    def agg: Column = count(when(!predicate, 1))
  }

  /** Every `childColumn` value exists in `parentColumn` (anti-join). */
  final case class RefIntegrity(childTable: String, childColumn: String,
                                parentTable: String, parentColumn: String) {
    def name = s"$childTable.$childColumn ref_$parentTable"
  }

  /** Compile and run a suite: scalar checks grouped into one wide pass
    * per table, RI checks as anti-joins, unioned to one row per check. */
  def suite(tables: Map[String, DataFrame],
            checks: Seq[Check],
            refs: Seq[RefIntegrity] = Nil): DataFrame = {
    def litName(n: String) = n.replace("'", "\\'")
    val perTable = checks.groupBy(_.table).toSeq.map { case (t, cs) =>
      val df = tables.getOrElse(t, throw new IllegalArgumentException(
        s"check references unknown table $t"))
      val aggs = cs.zipWithIndex.map { case (c, i) => c.agg.as(s"vc_$i") }
      val stackArgs = cs.zipWithIndex
        .map { case (c, i) => s"'${litName(c.name)}', `vc_$i`" }.mkString(", ")
      df.agg(aggs.head, aggs.tail: _*)
        .select(expr(s"stack(${cs.size}, $stackArgs) AS (check_name, violations)"))
    }
    val riRows = refs.map { r =>
      val child = tables.getOrElse(r.childTable, throw new IllegalArgumentException(
        s"RI check references unknown table ${r.childTable}"))
      val parent = tables.getOrElse(r.parentTable, throw new IllegalArgumentException(
        s"RI check references unknown table ${r.parentTable}"))
      child.join(parent.select(col(r.parentColumn)),
          col(r.childColumn) === col(r.parentColumn), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(r.name).as("check_name"), col("violations"))
    }
    (perTable ++ riRows).reduce(_.unionByName(_))
      .select(col("check_name"), col("violations"),
        (col("violations") === 0L).as("pass"))
      .orderBy(col("check_name"))
  }

  /** The in-flight compilation: the same specs as observe() accumulators
    * on `df`'s own pass. Checks that cannot ride along (RI, anything with
    * `inFlight = None`) are dropped here and belong in the post-hoc
    * suite. Read back violations from
    * `df.queryExecution.observedMetrics(name)` after the action, or from
    * `StreamingQueryProgress.observedMetrics` per micro-batch. */
  def observed(df: DataFrame, name: String, checks: Seq[Check]): DataFrame = {
    val metrics = checks.flatMap(c => c.inFlight.map(_.as(c.name)))
    require(metrics.nonEmpty, "no in-flight-capable checks in the spec")
    df.observe(name, metrics.head, metrics.tail: _*)
  }
}
