package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftDatasetBridge, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

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
  * Memory envelope: O(distinct groups per partition × k) rows on-heap,
  * with NO spill path — the same stance as Spark's ObjectHashAggregate
  * before its sort fallback. Size `spark.sql.shuffle.partitions` so a
  * partition's group count × k rows fits in executor memory (at k=3 and
  * 200-byte rows, 10M groups/partition ≈ 6 GB). The named upgrade path if
  * group cardinality outgrows that: a sort-based fallback that switches
  * to emit-on-group-change when the map crosses a row threshold, exactly
  * like ObjectHashAggregateExec. The Window formulation survives such
  * partitions today by spilling its sorter — at the cost of the full
  * O(n log n) sort this operator exists to avoid. */
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
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(gExprs, schema)
      val ord = new LazilyGeneratedOrdering(so, schema)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.ArrayBuffer[InternalRow]]
      while (iter.hasNext) {
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
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner strategy: one logical node plans to a partial (map-side)
  * instance below the exchange and a final instance above it — the same
  * two-phase shape Catalyst gives hash aggregation. */
class TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, so, k, child) =>
      TopKPerGroupExec(g, so, k, partial = false,
        TopKPerGroupExec(g, so, k, partial = true, planLater(child))) :: Nil
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
