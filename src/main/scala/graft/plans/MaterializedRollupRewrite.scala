package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Materialized-rollup (summary-table) query rewrite — the classic OLAP
  * engine feature (Oracle MV rewrite, Calcite lattices): when a query
  * aggregates the base fact table and a registered rollup can answer it,
  * swap the multi-TB base scan for the kilobyte summary, re-aggregating
  * partial states. At 100 TB this is the difference between a full scan
  * and a metadata-sized read for every dashboard-shaped query — and it
  * needs NO query changes, which is the entire point: the rewrite happens
  * inside the optimizer, below the API surface.
  *
  * Derivability contract (the rule bails to the base plan otherwise):
  *   - query group keys ⊆ rollup keys (coarser grouping re-aggregates);
  *   - an optional Filter may sit between, touching rollup KEYS only
  *     (key predicates commute with the rollup's grouping);
  *   - every aggregate is non-distinct, unfiltered, and one of
  *       SUM(col)   → SUM(partial_sum)   [int/long/double cols — decimal
  *                                        widens per level, so re-summing
  *                                        would change the result type]
  *       COUNT(*)   → SUM(partial_count) (counts add)
  *       COUNT(col) → SUM(partial_nn_count) (per-column null-aware counts)
  *       MIN(col)   → MIN(partial_min)
  *       MAX(col)   → MAX(partial_max)
  *       AVG(col)   → SUM(partial_sum) / SUM(partial_nn_count) — averages
  *                    don't add, but their (sum, count) decomposition
  *                    does; needs BOTH maps populated for the column
  *     COUNT(DISTINCT) is never derivable (distinct doesn't add — that's
  *     [[graft.functions.Udfs.qHllRollup]]'s sketch territory).
  *
  * Output attributes keep the original `exprId`s (each rewritten column is
  * re-aliased under the old id), so parents of the Aggregate resolve
  * untouched. Rollup FRESHNESS is the registrant's contract, as with any
  * materialized view: register at build time, deregister on staleness.
  */
object MaterializedRollupRewrite {

  /** A registered summary table. Column maps are base-name → rollup-name;
    * `cnts` holds per-column null-aware counts (for COUNT(col) and the
    * denominator of AVG). */
  final case class RollupDef(
      basePath: String,
      rollupPath: String,
      keys: Seq[String],
      sums: Map[String, String],
      countCol: Option[String],
      mins: Map[String, String],
      maxs: Map[String, String],
      cnts: Map[String, String] = Map.empty)

  private val registry = new ConcurrentHashMap[String, RollupDef]()

  private def normalize(p: String): String =
    java.nio.file.Paths.get(p.stripPrefix("file:")).normalize.toString

  def register(d: RollupDef): Unit = registry.put(normalize(d.basePath), d)
  def deregister(basePath: String): Unit = registry.remove(normalize(basePath))
  def clear(): Unit = registry.clear()

  /** Swing every registration whose summary lives at `oldPath` to
    * `newPath` — the version-swap hook for incremental maintenance
    * ([[graft.streaming.RollupMaintenance]] GC's superseded dirs, so a
    * registration left pointing at one would go dark). */
  def repointRollup(oldPath: String, newPath: String): Unit =
    registry.replaceAll((_, d) =>
      if (d.rollupPath == oldPath) d.copy(rollupPath = newPath) else d)

  private[plans] def lookup(path: String): Option[RollupDef] =
    Option(registry.get(normalize(path)))

  /** Build the summary parquet for `basePath` grouped by `keys` and
    * register it. Partial columns are namespaced `g_sum_*`/`g_min_*`/
    * `g_max_*`/`g_cnt` so they can never shadow a key. */
  def create(
      spark: SparkSession,
      basePath: String,
      keys: Seq[String],
      sumCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil,
      rollupPath: String): RollupDef = {
    // A refresh must read the BASE: with a registration still live, the
    // build aggregate below is itself derivable and the rule would answer
    // it from the stale rollup — a refresh that copies the staleness it
    // was called to fix (or a self-overwrite error when paths coincide).
    deregister(basePath)
    val aggs =
      sumCols.map(c => sum(col(c)).as(s"g_sum_$c")) ++
      sumCols.map(c => count(col(c)).as(s"g_cntn_$c")) ++
      minCols.map(c => min(col(c)).as(s"g_min_$c")) ++
      maxCols.map(c => max(col(c)).as(s"g_max_$c")) :+
      count(lit(1)).as("g_cnt")
    spark.read.parquet(basePath)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(rollupPath)
    val d = RollupDef(
      basePath, rollupPath, keys,
      sums = sumCols.map(c => c -> s"g_sum_$c").toMap,
      countCol = Some("g_cnt"),
      mins = minCols.map(c => c -> s"g_min_$c").toMap,
      maxs = maxCols.map(c => c -> s"g_max_$c").toMap,
      cnts = sumCols.map(c => c -> s"g_cntn_$c").toMap)
    register(d)
    d
  }
}

case class MaterializedRollupRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import MaterializedRollupRewrite._

  /** The parquet location under a (possibly projected/filtered) aggregate
    * child, plus the filter if one sits between. Only plain attribute
    * projections are transparent — a Project computing expressions would
    * have to be derivable itself. */
  private def unwrap(p: LogicalPlan): Option[(String, Option[Expression])] = p match {
    case lr: LogicalRelation => lr.relation match {
      // Exactly one root path: a union-of-paths scan must never be
      // answered from a rollup covering only one of them.
      case h: HadoopFsRelation if h.location.rootPaths.size == 1 =>
        Some((h.location.rootPaths.head.toUri.getPath, None))
      case _ => None
    }
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(child)
    case Filter(cond, child) =>
      unwrap(child).flatMap {
        case (path, None) => Some((path, Some(cond)))
        case _            => None // one filter level is enough here
      }
    case _ => None
  }

  private def summable(a: AttributeReference): Boolean = a.dataType match {
    case DoubleType | LongType | IntegerType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      val rewritten = for {
        (path, filterCond) <- unwrap(agg.child)
        d <- lookup(path)
        groupNames <- Some(agg.groupingExpressions).collect {
          case gs if gs.forall(_.isInstanceOf[AttributeReference]) =>
            gs.map(_.asInstanceOf[AttributeReference].name)
        }
        if groupNames.forall(d.keys.contains)
        if filterCond.forall(_.references.forall(r => d.keys.contains(r.name)))
        out <- rewrite(agg, d, filterCond)
      } yield out
      rewritten.getOrElse(agg)
  }

  private def rewrite(
      agg: Aggregate,
      d: RollupDef,
      filterCond: Option[Expression]): Option[LogicalPlan] = {
    // A fresh scan per rewrite: attribute ids must not collide if the
    // same rollup serves several aggregates in one query tree. A missing
    // or unreadable rollup (GC'd version dir, stale registration) must
    // cancel the rewrite, never fail a query that would otherwise run.
    val scan = try {
      spark.read.parquet(d.rollupPath).queryExecution.analyzed
    } catch {
      case scala.util.control.NonFatal(_) => return None
    }
    val ra: Map[String, Attribute] = scan.output.map(a => a.name -> a).toMap

    def rollupAttr(baseName: String, m: Map[String, String]): Option[Attribute] =
      m.get(baseName).flatMap(ra.get)

    // Every result column must be derivable; one miss cancels the rewrite.
    val results: Option[Seq[NamedExpression]] =
      traverseOpt(agg.aggregateExpressions) {
        case a: AttributeReference if d.keys.contains(a.name) =>
          ra.get(a.name).map(na => Alias(na, a.name)(exprId = a.exprId))
        case al @ Alias(ae @ AggregateExpression(fn, _, false, None, _), name) =>
          val re: Option[Expression] = fn match {
            case Sum(a: AttributeReference, _) if summable(a) =>
              rollupAttr(a.name, d.sums).map(pa => Sum(pa).toAggregateExpression())
            case Count(Seq(Literal(v, _))) if v != null =>
              d.countCol.flatMap(ra.get).map(cnt =>
                Coalesce(Seq(Sum(cnt).toAggregateExpression(), Literal(0L))))
            case Count(Seq(a: AttributeReference)) =>
              rollupAttr(a.name, d.cnts).map(pc =>
                Coalesce(Seq(Sum(pc).toAggregateExpression(), Literal(0L))))
            case Average(a: AttributeReference, _) if summable(a) =>
              // Averages don't add; (Σ, n) pairs do. Null semantics ride
              // along: an all-null group has a null partial sum, so the
              // division is null exactly where AVG is.
              for {
                ps <- rollupAttr(a.name, d.sums)
                pc <- rollupAttr(a.name, d.cnts)
              } yield Divide(
                Cast(Sum(ps).toAggregateExpression(), DoubleType),
                Cast(Sum(pc).toAggregateExpression(), DoubleType))
            case Min(a: AttributeReference) =>
              rollupAttr(a.name, d.mins).map(pa => Min(pa).toAggregateExpression())
            case Max(a: AttributeReference) =>
              rollupAttr(a.name, d.maxs).map(pa => Max(pa).toAggregateExpression())
            case _ => None
          }
          re.map(e => Alias(e, name)(exprId = al.exprId))
        case _ => None
      }

    results.map { rs =>
      val newGrouping = agg.groupingExpressions.map {
        case a: AttributeReference => ra(a.name)
        case other => other
      }
      val newChild = filterCond match {
        case Some(c) =>
          Filter(c.transform { case a: AttributeReference => ra(a.name) }, scan)
        case None => scan
      }
      Aggregate(newGrouping, rs, newChild)
    }
  }

  /** Option-valued map that short-circuits: Some only if f succeeds on
    * every element. */
  private def traverseOpt[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val out = xs.map(f)
    if (out.forall(_.isDefined)) Some(out.map(_.get)) else None
  }
}
