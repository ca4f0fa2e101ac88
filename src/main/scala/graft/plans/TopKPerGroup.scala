package graft.plans

import org.apache.spark.SparkEnv
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftDatasetBridge, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

import scala.collection.mutable

/** Whole-operator customization — rung (c) of the ladder (SURVEY.md §7.3):
  * a custom `LogicalPlan` node, planned by an injected [[SparkStrategy]]
  * into a custom physical operator, registered through
  * `SparkSessionExtensions` ([[graft.functions.GraftExtensions]]).
  *
  * Semantics: keep the first `k` rows of each group under `sortOrder`
  * (SQL's `ROW_NUMBER() OVER (PARTITION BY g ORDER BY s) <= k` with the
  * rank column dropped). The built-in expression of that shape pays for a
  * FULL SORT of every partition's group data inside the Window operator —
  * O(n log n) comparisons and a sort buffer that spills at scale. This
  * operator needs only a bounded heap per group: O(n log k) comparisons,
  * O(groups·k) memory, one pass, nothing spilled. At 100 TB with
  * k=3-per-billion-groups the difference is the job.
  *
  * Callers must pass a total order (include a unique tie-break column)
  * for deterministic output — same contract as the oracle's ROW_NUMBER. */
final case class TopKPerGroupPlan(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(groupExprs.nonEmpty, "topKPerGroup needs at least one group column")
  require(k > 0, "topKPerGroup needs k > 0")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

/** Physical operator: hash-clustered on the group keys (EnsureRequirements
  * inserts the single exchange), then one streaming pass per partition
  * maintaining a k-bounded sorted buffer per group.
  *
  * Memory envelope: O(distinct groups per partition × k) rows on-heap in
  * the hash phase, with a fallback once the buffered-row count crosses
  * `spark.graft.topKFallbackRows` — the same stance as Spark's
  * ObjectHashAggregate and its sort fallback:
  *
  *   - The PARTIAL (map-side) instance flushes its map downstream and
  *     starts a fresh one. Correct because a row in a group's overall
  *     top-k is in the top-k of ANY chunk that contains it (fewer than k
  *     rows beat it anywhere), so the union of per-chunk top-k sets is a
  *     superset of the true top-k that the final instance reduces. Costs
  *     extra shuffle rows (≤ k × groups × chunks), never extra memory.
  *   - The FINAL instance (one group's rows all in one partition —
  *     flushing would emit duplicate groups) switches to sort-based emit:
  *     buffered + remaining rows go through an [[UnsafeExternalRowSorter]]
  *     (spills to disk under memory pressure) ordered by (group keys,
  *     sortOrder), then one streaming pass emits the first k rows per
  *     group on group change — O(1) memory, exactly the
  *     ObjectHashAggregateExec shape.
  *
  * The Window formulation survives huge partitions today by spilling its
  * sorter, but always pays the full O(n log n) sort; this operator sorts
  * only the (rare) partitions whose group cardinality overflows the map. */
final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  // Partial/final like hash aggregation: the partial instance runs
  // map-side with no distribution requirement, cutting shuffle volume to
  // ≤ k rows per (group, map task) — correct because any row in the
  // overall top-k is necessarily in the top-k of its own substream. The
  // final instance requires group clustering; EnsureRequirements inserts
  // the one exchange between them.
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val gExprs = groupExprs
    val so = sortOrder
    val limit = k
    val isPartial = partial
    // Clamp to ≥1: a zero/negative threshold would make hashChunk consume
    // no input while iter.hasNext stays true — an infinite task spin, not
    // a config error.
    val fallbackRows = math.max(1L,
      conf.getConfString(TopKPerGroupExec.FallbackRowsKey, TopKPerGroupExec.FallbackRowsDefault)
        .toLong)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(gExprs, schema)
      val ord = new LazilyGeneratedOrdering(so, schema)

      /** Hash phase: consume input into k-bounded per-group buffers until
        * the input ends or `cap` rows are buffered. Returns the map and
        * whether input remains (= cap was hit). */
      def hashChunk(cap: Long): (mutable.LinkedHashMap[UnsafeRow, mutable.ArrayBuffer[InternalRow]], Boolean) = {
        val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.ArrayBuffer[InternalRow]]
        var held = 0L
        while (iter.hasNext && held < cap) {
          val row = iter.next()
          val key = keyProj(row)
          val buf = heaps.get(key) match {
            case Some(b) => b
            case None =>
              val b = new mutable.ArrayBuffer[InternalRow](limit + 1)
              heaps.put(key.copy(), b)   // projection reuses its buffer — copy
              b
          }
          // Bounded insertion, buffer kept in sort order (best row first):
          // a full buffer rejects rows sorting after its last element in
          // O(1); accepted rows splice at their position in O(k).
          if (buf.length < limit || ord.compare(row, buf(buf.length - 1)) < 0) {
            val r = row.copy()           // iterator reuses the row — copy
            var i = 0
            while (i < buf.length && ord.compare(buf(i), r) <= 0) i += 1
            buf.insert(i, r)
            if (buf.length > limit) buf.remove(buf.length - 1)
            else held += 1               // replacement is net-zero held rows
          }
        }
        (heaps, iter.hasNext)
      }

      if (isPartial) {
        // Flush-and-reset chunking: each chunk's map is emitted downstream
        // and dropped before the next chunk starts.
        new Iterator[InternalRow] {
          private var cur: Iterator[InternalRow] = Iterator.empty
          def hasNext: Boolean = {
            while (!cur.hasNext && iter.hasNext) cur = hashChunk(fallbackRows)._1.valuesIterator.flatMap(_.iterator)
            cur.hasNext
          }
          def next(): InternalRow = { if (!hasNext) Iterator.empty.next(); cur.next() }
        }
      } else {
        val (heaps, overflowed) = hashChunk(fallbackRows)
        if (!overflowed) heaps.valuesIterator.flatMap(_.iterator)
        else TopKPerGroupExec.sortBasedEmit(schema, gExprs, so, limit, keyProj, heaps, iter)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupExec {
  /** Buffered-row count at which the hash phase gives up: the partial
    * instance flushes-and-resets, the final instance goes sort-based.
    * Rows, not bytes, mirroring ObjectHashAggregate's
    * `objectAggSortBasedFallbackThreshold` (its unit is groups). */
  val FallbackRowsKey = "spark.graft.topKFallbackRows"
  val FallbackRowsDefault: String = (4 * 1024 * 1024).toString

  /** Sort-based fallback for the final instance: everything buffered so
    * far plus the remaining input goes through a spill-capable external
    * sort on (group keys, sortOrder); one streaming pass then emits the
    * first k rows of each group run. Group keys must be orderable — true
    * of every type Spark itself can sort, which ClusteredDistribution
    * already implies for the keys. */
  private def sortBasedEmit(
      schema: Seq[Attribute],
      gExprs: Seq[Expression],
      so: Seq[SortOrder],
      limit: Int,
      keyProj: UnsafeProjection,
      heaps: mutable.LinkedHashMap[UnsafeRow, mutable.ArrayBuffer[InternalRow]],
      rest: Iterator[InternalRow]): Iterator[InternalRow] = {
    val groupedOrder = gExprs.map(e => SortOrder(e, Ascending)) ++ so
    val sorter = UnsafeExternalRowSorter.create(
      StructType(schema.map(a => StructField(a.name, a.dataType, a.nullable))),
      new LazilyGeneratedOrdering(groupedOrder, schema),
      // Constant prefix: the generated full ordering does all the work.
      // (A real per-type prefix would only speed the rare fallback sort.)
      PrefixComparators.LONG,
      new UnsafeExternalRowSorter.PrefixComputer {
        private val zero = new UnsafeExternalRowSorter.PrefixComputer.Prefix
        override def computePrefix(row: InternalRow): UnsafeExternalRowSorter.PrefixComputer.Prefix = zero
      },
      SparkEnv.get.memoryManager.pageSizeBytes,
      /* canUseRadixSort = */ false)
    val toUnsafe = UnsafeProjection.create(schema.map(_.dataType).toArray)
    def asUnsafe(r: InternalRow): UnsafeRow = r match {
      case u: UnsafeRow => u
      case other        => toUnsafe(other)
    }
    heaps.valuesIterator.foreach(_.foreach(r => sorter.insertRow(asUnsafe(r))))
    heaps.clear()
    while (rest.hasNext) sorter.insertRow(asUnsafe(rest.next()))
    val sorted = sorter.sort()
    new Iterator[InternalRow] {
      private var curKey: UnsafeRow = null
      private var emitted = 0
      private var pending: InternalRow = null
      private def fetch(): Unit = {
        while (pending == null && sorted.hasNext) {
          val row = sorted.next()
          val key = keyProj(row)
          if (curKey == null || key != curKey) {
            curKey = key.copy()
            emitted = 1
            pending = row
          } else if (emitted < limit) {
            emitted += 1
            pending = row
          } // else: past this group's top-k — skip
        }
      }
      def hasNext: Boolean = { fetch(); pending != null }
      def next(): InternalRow = {
        fetch()
        if (pending == null) Iterator.empty.next()
        val r = pending; pending = null; r
      }
    }
  }
}

/** Planner strategy: one logical node plans to a partial (map-side)
  * instance below the exchange and a final instance above it — the same
  * two-phase shape Catalyst gives hash aggregation.
  *
  * Floating-point group keys are normalized (NaN bit patterns collapsed,
  * -0.0 → 0.0) the way Spark's own NormalizeFloatingNumbers rule does for
  * groupBy: the hash phase groups by UnsafeRow BYTE equality while the
  * sort fallback groups by ORDERING equality, and without normalization
  * the two phases would disagree on -0.0 vs 0.0 and on distinct NaN bit
  * patterns — making results fallback-threshold-dependent. Nested float
  * keys (array/struct of float) are not normalized; use scalar keys. */
class TopKPerGroupStrategy extends SparkStrategy {
  import org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero
  import org.apache.spark.sql.types.{DoubleType, FloatType}

  private def normalizeKey(e: Expression): Expression = e.dataType match {
    case DoubleType | FloatType => NormalizeNaNAndZero(e)
    case _                      => e
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, so, k, child) =>
      val gn = g.map(normalizeKey)
      TopKPerGroupExec(gn, so, k, partial = false,
        TopKPerGroupExec(gn, so, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  /** Top-k rows per group as a DataFrame transform. `orderBy` is
    * (column, ascending); include a unique tie-break for determinism.
    * Name resolution honors `spark.sql.caseSensitive` like the rest of
    * the DataFrame API (H2-sourced frames arrive uppercased). */
  def apply(df: DataFrame, groupCols: Seq[String], orderBy: Seq[(String, Boolean)],
            k: Int): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    val caseSensitive =
      df.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def matches(a: String, b: String) =
      if (caseSensitive) a == b else a.equalsIgnoreCase(b)
    def attr(n: String): Attribute = analyzed.output.find(a => matches(a.name, n)).getOrElse(
      throw new IllegalArgumentException(
        s"topKPerGroup: no column '$n' in ${analyzed.output.map(_.name).mkString(", ")}"))
    val so = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftDatasetBridge.ofRows(df.sparkSession,
      TopKPerGroupPlan(groupCols.map(attr), so, k, analyzed))
  }
}
