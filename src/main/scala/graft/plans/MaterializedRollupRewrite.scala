package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, hll_sketch_agg, lit, max, min, sum}
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

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
  *       SUM(col)   → CAST(SUM(partial_sum) AS query-sum-type)
  *                    [partials are DECIMAL(28,4) sums — exact and
  *                     merge-order-independent; the edge cast keeps the
  *                     swap type-invisible]
  *       SUM(CAST(col AS DECIMAL(28,4)))  — i.e. [[graft.functions.Exact]]
  *                  .dsum's inner aggregate → SUM(partial_sum) directly
  *                  (both sides widen 28,4 → 38,4, so types agree); the
  *                  money-dashboard shape this rewrite mostly serves
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
    * denominator of AVG). `baseFp` is the base table's file fingerprint at
    * build time: a non-zero value cancels the rewrite when the base has
    * since changed (regenerated fixture, overwritten partition) — an MV
    * must go dark when stale, not answer from the past. 0 = no check
    * (registrant owns freshness, the classic contract). */
  final case class RollupDef(
      basePath: String,
      rollupPath: String,
      keys: Seq[String],
      sums: Map[String, String],
      countCol: Option[String],
      mins: Map[String, String],
      maxs: Map[String, String],
      cnts: Map[String, String] = Map.empty,
      hlls: Map[String, String] = Map.empty,
      hllLgK: Int = 12,
      baseFp: Long = 0L)

  /** Order-stable fingerprint of a table directory: file names + mtimes +
    * lengths (length catches a same-name overwrite landing within one
    * mtime tick). Resolved through the Hadoop FileSystem API so non-local
    * bases (hdfs://, s3a://) fingerprint too — `java.io.File.listFiles`
    * returns null for those, which would silently disable the staleness
    * fence exactly where it can't be eyeballed. One metadata listing per
    * rewrite attempt — cheap next to the scan the rewrite saves. A result
    * of 0 means "no check"; [[register]]-time callers get a loud warning
    * so a dark fence is a known trade, never a surprise. */
  private[plans] def fingerprint(path: String): Long = {
    import org.apache.hadoop.fs.{Path => HPath}
    try {
      // A MANIFEST table's visible state is its published chain, not its
      // directory metadata: fingerprint the chain so the fence is
      // invariant under WAP stage+discard (a refused ingest restores the
      // chain exactly but bumps the data/ dir mtime — verdict-r15 #3,
      // which left a logically-unchanged index permanently "stale") and
      // under vacuum, while every real commit still moves it. Raw
      // parquet/CSV directories have no chain and keep the physical
      // listing below.
      graft.sources.ManifestFileSink.publishedChainFingerprint(path) match {
        case Some(fp) => return if (fp == 0L) 1L else fp
        case None =>
      }
      val hp = new HPath(path)
      val conf = org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new org.apache.hadoop.conf.Configuration())
      val fs = hp.getFileSystem(conf)
      if (!fs.exists(hp)) 0L
      else fs.listStatus(hp).sortBy(_.getPath.getName).foldLeft(0L)((h, st) =>
        ((h * 1000003L + st.getPath.getName.hashCode.toLong * 31L +
          st.getModificationTime) * 1000003L + st.getLen))
    } catch { case _: Exception => 0L }
  }

  /** Fingerprint for a registration: same hash, but a 0 result (missing
    * dir, unreachable filesystem) warns that the staleness fence is OFF
    * for this rollup — the registrant then owns freshness entirely. */
  def fenceFingerprint(path: String): Long = {
    val fp = fingerprint(path)
    if (fp == 0L)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"rollup base $path fingerprinted to 0 — staleness fence disabled; " +
          "registrant owns freshness")
    fp
  }

  private[plans] def isStale(d: RollupDef): Boolean =
    d.baseFp != 0L && fingerprint(d.basePath) != d.baseFp

  /** The MV catalog: a base table may have SEVERAL rollups (different key
    * sets — the lattice); the rule tries them registration-newest-first
    * and the first derivable one answers. */
  private val registry = new ConcurrentHashMap[String, List[RollupDef]]()

  /** Non-zero while [[create]] is scanning the base: its own build
    * aggregate must read the BASE, never an (older, possibly stale)
    * registration — see create(). Global rather than thread-local because
    * parts of query compilation can hop threads; a concurrent unrelated
    * query during the short build window merely skips its rewrite (always
    * correct, the base answers). */
  private val buildDepth = new java.util.concurrent.atomic.AtomicInteger(0)
  private[plans] def building: Boolean = buildDepth.get() > 0

  private def normalize(p: String): String =
    java.nio.file.Paths.get(p.stripPrefix("file:")).normalize.toString

  /** Register `d`, replacing any existing rollup of the same base with the
    * same key set (a refresh supersedes its predecessor; distinct key sets
    * coexist as lattice levels). */
  def register(d: RollupDef): Unit =
    registry.compute(normalize(d.basePath), (_, old) =>
      d :: Option(old).getOrElse(Nil).filterNot(_.keys.toSet == d.keys.toSet))

  def deregister(basePath: String): Unit = registry.remove(normalize(basePath))
  def clear(): Unit = registry.clear()

  /** Swing every registration whose summary lives at `oldPath` to
    * `newPath` — the version-swap hook for incremental maintenance
    * ([[graft.streaming.RollupMaintenance]] GC's superseded dirs, so a
    * registration left pointing at one would go dark). */
  def repointRollup(oldPath: String, newPath: String): Unit =
    registry.replaceAll((_, ds) => ds.map(d =>
      if (d.rollupPath == oldPath) d.copy(rollupPath = newPath) else d))

  private[plans] def lookup(path: String): List[RollupDef] =
    Option(registry.get(normalize(path))).getOrElse(Nil)

  private[plans] def hasRollups: Boolean = !registry.isEmpty

  /** Build the summary parquet for `basePath` grouped by `keys` and
    * register it. Partial columns are namespaced `g_sum_*`/`g_min_*`/
    * `g_max_*`/`g_cnt` so they can never shadow a key.
    *
    * Sum partials are stored as DECIMAL(28,4) sums ([[graft.functions
    * .Exact.D]]), NOT in the source column's type: decimal addition is
    * exact and associative, so re-folding partials gives the identical
    * answer in any merge order — the same order-independence contract
    * Exact.dsum enforces for direct queries. A double-typed partial would
    * make the MV answer drift from the base answer by merge order at
    * 100 TB. The rewrite casts back to the query's own result type at the
    * edge, so the swap is type-invisible. (Values are assumed
    * representable at scale 4 — the engine's money contract; integer
    * columns are always exact.) */
  def create(
      spark: SparkSession,
      basePath: String,
      keys: Seq[String],
      sumCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil,
      distinctCols: Seq[String] = Nil,
      rollupPath: String): RollupDef = {
    // A refresh must read the BASE: with registrations still live, the
    // build aggregate below may itself be derivable and the rule would
    // answer it from a stale rollup — a refresh that copies the staleness
    // it was called to fix (or a self-overwrite error when paths
    // coincide). Suspend rewriting for the build instead of deregistering,
    // so OTHER rollups of this base (lattice levels) survive a refresh.
    // Distinct-count partials are HLL SKETCHES (DataSketches binary blobs):
    // register-max merge is exact, deterministic, and order-independent, so
    // union-of-group-sketches ≡ sketch-of-group-union — the only partial
    // state that lets a summary answer distinct-count questions (exact
    // distinct doesn't decompose; that asymmetry is why COUNT(DISTINCT)
    // stays non-derivable while hll_sketch_agg IS).
    val aggs =
      sumCols.map(c => sum(col(c).cast(graft.functions.Exact.D)).as(s"g_sum_$c")) ++
      sumCols.map(c => count(col(c)).as(s"g_cntn_$c")) ++
      minCols.map(c => min(col(c)).as(s"g_min_$c")) ++
      maxCols.map(c => max(col(c)).as(s"g_max_$c")) ++
      distinctCols.map(c => hll_sketch_agg(col(c)).as(s"g_hll_$c")) :+
      count(lit(1)).as("g_cnt")
    buildDepth.incrementAndGet()
    try {
      spark.read.parquet(basePath)
        .groupBy(keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .write.mode("overwrite").parquet(rollupPath)
    } finally buildDepth.decrementAndGet()
    val d = RollupDef(
      basePath, rollupPath, keys,
      sums = sumCols.map(c => c -> s"g_sum_$c").toMap,
      countCol = Some("g_cnt"),
      mins = minCols.map(c => c -> s"g_min_$c").toMap,
      maxs = maxCols.map(c => c -> s"g_max_$c").toMap,
      cnts = sumCols.map(c => c -> s"g_cntn_$c").toMap,
      hlls = distinctCols.map(c => c -> s"g_hll_$c").toMap,
      baseFp = fingerprint(basePath))
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

  /** Undo `PullOutGroupingExpressions` for matching: by the post-hoc batch
    * where injected rules run, a complex grouping (e.g. a date grain) has
    * been hoisted into a `_groupingexpression` alias in a Project below
    * the Aggregate. Inline such aliases back into the groupings/results so
    * derivability is judged against BASE columns; top-level attribute
    * results that named an alias are re-aliased under their original
    * exprId. Returns the aggregate unchanged when there is nothing to
    * inline. */
  private def inlineProjectAliases(agg: Aggregate): Aggregate = agg.child match {
    case Project(pl, gchild)
        if pl.exists(_.isInstanceOf[Alias]) && pl.forall {
          case _: AttributeReference => true
          case Alias(e, _)           => e.deterministic
          case _                     => false
        } =>
      val m: Map[ExprId, Expression] =
        pl.collect { case a @ Alias(e, _) => a.exprId -> e }.toMap
      def sub(e: Expression): Expression = e.transformUp {
        case ar: AttributeReference if m.contains(ar.exprId) => m(ar.exprId)
      }
      val r2 = agg.aggregateExpressions.map {
        case ar: AttributeReference if m.contains(ar.exprId) =>
          Alias(m(ar.exprId), ar.name)(exprId = ar.exprId)
        case ne => sub(ne).asInstanceOf[NamedExpression]
      }
      Aggregate(agg.groupingExpressions.map(sub), r2, gchild)
    case _ => agg
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    // Empty-registry bail keeps the rule O(1) for every session that never
    // registered an MV — no per-Aggregate pattern work on unrelated plans.
    if (MaterializedRollupRewrite.building || !MaterializedRollupRewrite.hasRollups) plan
    else plan.transform {
      // ROLLUP/CUBE/GROUPING SETS: Aggregate over Expand. Each expanded
      // grouping set is still a grouping by (a subset of) the rollup keys,
      // so the summary answers level-by-level — see [[rewriteExpand]].
      case agg0 @ Aggregate(_, _, expand: Expand, _) =>
        unwrap(expand.child).flatMap { case (path, filterCond) =>
          lookup(path).iterator.map { d =>
            val filterable = filterCond.forall(c =>
              c.deterministic &&
                c.references.forall(r => d.keys.contains(r.name)))
            if (filterable && !isStale(d)) rewriteExpand(agg0, expand, d, filterCond)
            else None
          }.collectFirst { case Some(out) => out }
        }.getOrElse(agg0)
      case agg0: Aggregate =>
        val agg = inlineProjectAliases(agg0)
        val rewritten = unwrap(agg.child).flatMap { case (path, filterCond) =>
          lookup(path).iterator.map { d =>
            // Groupings may be arbitrary deterministic EXPRESSIONS of the
            // rollup keys (date grains, concatenations): any function of
            // the keys is constant within a rollup group, so re-grouping
            // the summary by it is sound.
            val groupable = agg.groupingExpressions.forall(ge =>
              ge.deterministic && ge.references.nonEmpty &&
                ge.references.forall(r => d.keys.contains(r.name)))
            val filterable = filterCond.forall(c =>
              c.deterministic &&
                c.references.forall(r => d.keys.contains(r.name)))
            if (groupable && filterable && !isStale(d)) rewrite(agg, d, filterCond)
            else None
          }.collectFirst { case Some(out) => out }
        }
        rewritten.getOrElse(agg0)
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

    // Substitute base key attributes with their rollup counterparts in a
    // key-only expression (grouping expr, filter, grouping output).
    def subst(e: Expression): Expression = e.transform {
      case a: AttributeReference if ra.contains(a.name) => ra(a.name)
    }
    // One aggregate function → its partial-re-fold over the summary. The
    // summary's sum partials are DECIMAL(28,4) sums regardless of the base
    // column type, so every sum derivation re-folds in decimal (exact,
    // merge-order-independent) and casts back to the query's own result
    // type at the edge — type-invisible to parents.
    def derive(fn: AggregateFunction): Option[Expression] = fn match {
      // The engine's canonical money shape, Exact.dsum:
      // SUM(CAST(col AS DECIMAL(28,4))). Result types agree by
      // construction (both widen 28,4 → 38,4), so the partial re-fold
      // drops in directly.
      case Sum(Cast(a: AttributeReference, dt: DecimalType, _, _), _)
          if dt == graft.functions.Exact.D =>
        rollupAttr(a.name, d.sums).map(pa => Sum(pa).toAggregateExpression())
      case s @ Sum(a: AttributeReference, _) if summable(a) =>
        rollupAttr(a.name, d.sums).map(pa =>
          Cast(Sum(pa).toAggregateExpression(), s.dataType))
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
      // hll_sketch_agg(col) → hll_union_agg(sketch partial): HLL register-
      // max merge is exact and order-independent, so the union of the
      // summary's per-group sketches IS the sketch of the base — any
      // hll_sketch_estimate / hll_sketch_to_string around it rides through
      // unchanged. Same-lgK only: a union at a different precision would
      // silently answer with the partials' precision, not the query's.
      case hs: HllSketchAgg if hs.lgConfigK == d.hllLgK =>
        hs.left match {
          case a: AttributeReference =>
            rollupAttr(a.name, d.hlls).map(pa =>
              new HllUnionAgg(pa).toAggregateExpression())
          case _ => None
        }
      case _ => None
    }

    // Attribute references NOT under an AggregateExpression — after
    // aggregate derivation these are the grouping-output references, which
    // must all be rollup keys for the alias to ride through.
    def outsideAggRefs(e: Expression): Seq[AttributeReference] = e match {
      case _: AggregateExpression => Nil
      case a: AttributeReference  => Seq(a)
      case other                  => other.children.flatMap(outsideAggRefs)
    }

    // Every result column must be derivable; one miss cancels the rewrite.
    // Aliases are handled as WHOLE EXPRESSIONS, not bare aggregates: the
    // engine's own money shape `dsum` analyzes to Alias(Cast(AggExpr,
    // double)) and `davg` to Alias(Divide(Cast(AggExpr), AggExpr)) — the
    // aggregates sit arbitrarily deep, so each one is derived in place and
    // the surrounding scalar expression (casts, arithmetic, key grains)
    // rides through with key attributes substituted.
    val results: Option[Seq[NamedExpression]] =
      traverseOpt(agg.aggregateExpressions) {
        case a: AttributeReference if d.keys.contains(a.name) =>
          ra.get(a.name).map(na => Alias(na, a.name)(exprId = a.exprId))
        case al @ Alias(e, name) if e.deterministic =>
          var ok = true
          val e2 = e.transformUp {
            case AggregateExpression(fn, _, false, None, _) =>
              derive(fn).getOrElse { ok = false; Literal(null) }
            case ae: AggregateExpression => ok = false; ae
          }
          if (ok && outsideAggRefs(e2).forall(r => d.keys.contains(r.name)))
            Some(Alias(subst(e2), name)(exprId = al.exprId))
          else None
        case _ => None
      }

    results.map { rs =>
      val newGrouping = agg.groupingExpressions.map(subst)
      val newChild = filterCond match {
        case Some(c) => Filter(subst(c), scan)
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

  /** Derive ROLLUP/CUBE/GROUPING SETS from the summary. After analysis the
    * plan is `Aggregate(groupings, results, Expand(projections, output,
    * base))`: every Expand output position is one of
    *
    *   - GROUPING-KEY: projection rows mix a base key attribute with null
    *     literals (the per-set null markers) — or carry the key in every
    *     row. Sound over the summary with the key attribute substituted:
    *     each expanded set still groups by a subset of the rollup keys.
    *   - METADATA: rows hold no attribute at all (the grouping-id
    *     literals) — kept verbatim.
    *   - VALUE PASSTHROUGH: every row is the same base attribute, feeding
    *     the aggregates above. These positions are REPLACED by partial
    *     columns (`g_sum_*`, `g_cntn_*`, …) and the aggregates re-derive
    *     exactly as in the flat case: SUM→SUM(partial), COUNT→SUM(count
    *     partial), AVG→ΣΣ/Σn, MIN/MAX→MIN/MAX(partial).
    *
    * Output attributes of kept positions (keys, grouping id) retain their
    * exprIds, and every rewritten aggregate is re-aliased under its
    * original exprId, so parents resolve untouched. Any position or
    * aggregate outside these shapes cancels the rewrite (base answers). */
  private def rewriteExpand(
      agg: Aggregate,
      expand: Expand,
      d: RollupDef,
      filterCond: Option[Expression]): Option[LogicalPlan] = {
    val scan = try {
      spark.read.parquet(d.rollupPath).queryExecution.analyzed
    } catch {
      case scala.util.control.NonFatal(_) => return None
    }
    val ra: Map[String, Attribute] = scan.output.map(a => a.name -> a).toMap
    // Rollup keys must all exist in the summary by name.
    if (!d.keys.forall(ra.contains)) return None

    sealed trait Pos
    case object Keep extends Pos
    case object Key extends Pos
    final case class Value(baseName: String, exprId: ExprId) extends Pos

    val positions: Seq[Pos] = expand.output.indices.map { i =>
      val cells = expand.projections.map(_(i))
      val refs = cells.flatMap(_.collect { case a: AttributeReference => a })
      if (refs.isEmpty) Keep
      else if (refs.map(_.exprId).distinct.size == 1) {
        val a = refs.head
        val shapeOk = cells.forall {
          case _: AttributeReference => true
          case Literal(null, _)      => true
          case _                     => false
        }
        if (!shapeOk) return None
        if (d.keys.contains(a.name)) Key
        else if (cells.forall(_.isInstanceOf[AttributeReference]))
          Value(a.name, expand.output(i).exprId)
        else return None // null-marked grouping over a non-key column
      } else return None
    }

    val valueByOut: Map[ExprId, String] =
      positions.collect { case v: Value => v.exprId -> v.baseName }.toMap

    // Groupings must be untouched by the value replacement.
    if (agg.groupingExpressions.exists(_.references.exists(r =>
      valueByOut.contains(r.exprId)))) return None

    // Partial columns get appended as fresh passthrough positions (one per
    // distinct partial, shared by all grouping sets).
    val extra = scala.collection.mutable.LinkedHashMap.empty[String, (Attribute, AttributeReference)]
    def partialAttr(pname: String): AttributeReference =
      extra.getOrElseUpdate(pname, {
        val p = ra(pname)
        (p, AttributeReference(pname, p.dataType, nullable = true)())
      })._2

    var failed = false
    def derive(fn: AggregateFunction): Option[Expression] = fn match {
      // Exact.dsum over an expanded value column: decimal partial re-folds
      // directly (result types agree: 28,4 → 38,4 on both sides).
      case Sum(Cast(a: AttributeReference, dt: DecimalType, _, _), _)
          if dt == graft.functions.Exact.D && valueByOut.contains(a.exprId) =>
        d.sums.get(valueByOut(a.exprId)).filter(ra.contains)
          .map(p => Sum(partialAttr(p)).toAggregateExpression())
      case s @ Sum(a: AttributeReference, _)
          if valueByOut.contains(a.exprId) && summable(a) =>
        // Partial is DECIMAL(28,4) (exact re-fold); cast back to the
        // query's own sum type at the edge.
        d.sums.get(valueByOut(a.exprId)).filter(ra.contains)
          .map(p => Cast(Sum(partialAttr(p)).toAggregateExpression(), s.dataType))
      case Count(Seq(Literal(v, _))) if v != null =>
        d.countCol.filter(ra.contains).map(p =>
          Coalesce(Seq(Sum(partialAttr(p)).toAggregateExpression(), Literal(0L))))
      case Count(Seq(a: AttributeReference)) if valueByOut.contains(a.exprId) =>
        d.cnts.get(valueByOut(a.exprId)).filter(ra.contains).map(p =>
          Coalesce(Seq(Sum(partialAttr(p)).toAggregateExpression(), Literal(0L))))
      case Average(a: AttributeReference, _)
          if valueByOut.contains(a.exprId) && summable(a) =>
        for {
          ps <- d.sums.get(valueByOut(a.exprId)).filter(ra.contains)
          pc <- d.cnts.get(valueByOut(a.exprId)).filter(ra.contains)
        } yield Divide(
          Cast(Sum(partialAttr(ps)).toAggregateExpression(), DoubleType),
          Cast(Sum(partialAttr(pc)).toAggregateExpression(), DoubleType))
      case Min(a: AttributeReference) if valueByOut.contains(a.exprId) =>
        d.mins.get(valueByOut(a.exprId)).filter(ra.contains)
          .map(p => Min(partialAttr(p)).toAggregateExpression())
      case Max(a: AttributeReference) if valueByOut.contains(a.exprId) =>
        d.maxs.get(valueByOut(a.exprId)).filter(ra.contains)
          .map(p => Max(partialAttr(p)).toAggregateExpression())
      case hs: HllSketchAgg if hs.lgConfigK == d.hllLgK =>
        hs.left match {
          case a: AttributeReference if valueByOut.contains(a.exprId) =>
            d.hlls.get(valueByOut(a.exprId)).filter(ra.contains)
              .map(p => new HllUnionAgg(partialAttr(p)).toAggregateExpression())
          case _ => None
        }
      case _ => None
    }
    val newResults = agg.aggregateExpressions.map { ne =>
      ne.transformUp {
        // EVERY aggregate must re-derive: an untouched one would count
        // summary rows where it counted base rows.
        case ae @ AggregateExpression(fn, _, false, None, _) =>
          derive(fn).getOrElse { failed = true; ae }
        case ae: AggregateExpression => failed = true; ae
      }.asInstanceOf[NamedExpression]
    }
    if (failed) return None
    // No surviving reference to a replaced value column anywhere (a bare
    // passthrough outside an aggregate would dangle).
    if (newResults.exists(_.references.exists(r => valueByOut.contains(r.exprId))))
      return None

    def substKeys(e: Expression): Expression = e.transform {
      case a: AttributeReference if ra.contains(a.name) => ra(a.name)
    }
    val keptIdx = positions.indices.filterNot(i => positions(i).isInstanceOf[Value])
    val newOutput: Seq[Attribute] =
      keptIdx.map(expand.output) ++ extra.values.map(_._2)
    val newProjections: Seq[Seq[Expression]] = expand.projections.map { row =>
      keptIdx.map(i => positions(i) match {
        case Key => substKeys(row(i))
        case _   => row(i)
      }) ++ extra.values.map(_._1)
    }
    val newChild = filterCond match {
      case Some(c) => Filter(substKeys(c), scan)
      case None    => scan
    }
    Some(Aggregate(agg.groupingExpressions, newResults,
      Expand(newProjections, newOutput, newChild)))
  }
}
