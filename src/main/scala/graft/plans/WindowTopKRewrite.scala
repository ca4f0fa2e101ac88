package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the standard window top-k idiom
  *
  * {{{ Project(cols without rn,
  *       Filter(rn <= k [AND rest...],
  *         Window(row_number() OVER (PARTITION BY g ORDER BY s) AS rn, child))) }}}
  *
  * into [[TopKPerGroupPlan]] — the bounded-heap whole-operator plan — when
  * the rank column itself is DEAD (projected away). Users keep writing the
  * portable ROW_NUMBER idiom; the optimizer swaps in the operator that
  * does O(n log k) with O(groups·k) state instead of a full partition
  * sort. Spark's own InferWindowGroupLimit mitigates the same pattern by
  * pre-filtering each partition to k rows per group, but the surviving
  * Window still sorts and ranks; this rule removes the Window entirely.
  *
  * Fires only when ALL of:
  *   - the Window computes exactly one expression: `row_number()` with its
  *     canonical running frame (rank()/dense_rank() admit >k rows on ties
  *     — NOT equivalent to k rows per group — and any other function needs
  *     the full window machinery);
  *   - the partition spec is non-empty (global top-k is TakeOrdered's
  *     job), the order spec is non-empty, and both are deterministic;
  *   - exactly one Filter conjunct bounds the rank (`rn <= k`, `rn < k`,
  *     `rn = 1`, or the mirrored literal-first forms) with a positive
  *     integer literal; remaining conjuncts must not touch `rn` and stay
  *     as a Filter ABOVE the rewrite (they filtered post-ranking rows, and
  *     on rank-free columns filter∘top-k ≡ they commuted with the rank);
  *   - the Project references the rank attribute nowhere (the rewritten
  *     operator emits child rows only — tie sets may differ from any one
  *     Window run, which is exactly the latitude ROW_NUMBER itself has).
  */
object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** `e` as an upper bound on the rank attribute `rn`, if it is one. */
  private def rankBound(e: Expression, rn: Attribute): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn)        => Some(k - 1)
    case EqualTo(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) && k == 1 => Some(1)
    case EqualTo(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) && k == 1 => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rn)       => Some(k - 1)
    case _ => None
  }

  private def isRowNumberSpec(w: WindowExpression): Boolean = w match {
    case WindowExpression(_: RowNumber,
        WindowSpecDefinition(_, _,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList,
        Filter(cond,
          Window(Seq(alias @ Alias(we: WindowExpression, _)), part, ord, child, _)))
        if isRowNumberSpec(we) && part.nonEmpty && ord.nonEmpty &&
          part.forall(_.deterministic) && ord.forall(_.deterministic) =>
      val rn = alias.toAttribute
      val (rnConds, rest) = splitConjunctivePredicates(cond)
        .partition(_.references.contains(rn))
      val bound = rnConds match {
        case Seq(one) => rankBound(one, rn)
        case _        => None
      }
      val rankIsDead = projectList.forall(!_.references.contains(rn))
      bound match {
        case Some(k) if k > 0 && rankIsDead =>
          val topk = TopKPerGroupPlan(part, ord, k, child)
          Project(projectList, rest.reduceOption(And).map(Filter(_, topk)).getOrElse(topk))
        case _ => p
      }
  }
}
