package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, PredicateHelper, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: bound the input of a windowed top-k-per-group.
  *
  * The stock formulation of "k best rows per group" —
  *
  *   Filter(rn <= k, Window(row_number() OVER (PARTITION BY g ORDER BY o)))
  *
  * — sorts every group completely before the filter throws away all but
  * k rows (WindowExec buffers + sorts whole partitions). This rule
  * inserts the bounded-selection operator [[TopKPerGroupPlan]] BELOW the
  * window, pre-filtering each group to its k best rows (O(n·k) compares,
  * memory groups×k, partial/final with map-side pruning — see
  * TopKPerGroupExec), after which the untouched Window + Filter rank a
  * tiny survivor set. Users keep writing the standard window form; the
  * optimizer swaps in the physical shape a hand-tuned engine would pick.
  * This completes the custom-Catalyst quartet of the design brief's
  * preference (c): LogicalPlan + Rule[LogicalPlan] + SparkStrategy +
  * SparkPlan, all injected by one SparkSessionExtensions.
  *
  * Fires only when provably safe:
  *  - the Window computes EXACTLY one window expression, a row_number —
  *    any sibling window function (sum/rank/lag…) must see full groups;
  *    rank()/dense_rank() can exceed k rows per group under ties, so
  *    only RowNumber qualifies for a size-k pre-filter;
  *  - a conjunct bounds that row_number by a positive integer literal
  *    (rn <= k, rn < k, rn = k, and mirrored forms); the whole Filter is
  *    kept on top, so extra conjuncts and the rank values themselves are
  *    untouched — the pre-filter keeps exactly the rows that would rank
  *    1..k, hence the re-ranked survivor set yields identical output
  *    (up to Spark's usual row_number tie nondeterminism, which the
  *    unrewritten plan has too);
  *  - the partition spec is non-empty (global top-k is
  *    TakeOrderedAndProject's job) and k ≤ MaxK (the operator's memory
  *    is groups×k — for huge k the sort-based window is the right plan).
  */
object TopKWindowRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Above this the bounded per-group buffer stops being "small". */
  val MaxK = 10000

  private def bound(cond: Expression, rn: Attribute): Option[Int] =
    splitConjunctivePredicates(cond).flatMap {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
      case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
      case EqualTo(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
      case _ => None
    }.reduceOption(_ min _)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          part, order, child, _))
        if part.nonEmpty && order.nonEmpty &&
          !child.isInstanceOf[TopKPerGroupPlan] =>
      bound(cond, alias.toAttribute) match {
        case Some(k) if k > 0 && k <= MaxK =>
          f.copy(child = w.copy(child = TopKPerGroupPlan(part, order, k, child)))
        case _ => f
      }
  }

  /** Idempotently enable on a running session (GraftExtensions injects
    * both this rule and the strategy at session build time). */
  def register(spark: SparkSession): Unit = {
    TopKPerGroup.register(spark)
    if (!spark.experimental.extraOptimizations.contains(TopKWindowRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKWindowRewrite
  }
}
