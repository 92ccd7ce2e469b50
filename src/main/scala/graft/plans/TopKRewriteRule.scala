package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite: the canonical top-k-per-key idiom
  *
  * {{{ Project(cols, Filter(rn <= k, Window(row_number() as rn, part, ord))) }}}
  *
  * becomes `Project(cols, TopKPerKey(part, ord, k, child))` whenever the
  * rank column is used only by the filter (i.e. the projection above
  * drops it). Users keep writing the standard window idiom; the planner
  * swaps WindowExec's full per-partition sort for the O(k)-heap exec
  * (see TopKPerKey scaladoc). Conservative by construction:
  *  - exactly one window expression, and it is row_number() over a
  *    running-row frame;
  *  - the filter is a single `rn <= lit` / `rn < lit` / flipped form;
  *  - the projection references child columns only (no rank).
  * Anything else is left untouched.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private object RankLimit {
    /** extract (rankAttr, k) from the filter condition. */
    def unapply(cond: Expression): Option[(Attribute, Int)] = cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) => Some((a, k))
      case LessThan(a: Attribute, Literal(k: Int, _))        => Some((a, k - 1))
      case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) => Some((a, k))
      case GreaterThan(Literal(k: Int, _), a: Attribute)     => Some((a, k - 1))
      case _ => None
    }
  }

  private object RowNumberWindow {
    /** extract (rankAttr, partition, order, child). */
    def unapply(w: Window): Option[(Attribute, Seq[Expression], Seq[SortOrder], LogicalPlan)] =
      w.windowExpressions match {
        case Seq(a @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(part, order, _)), _)) if order.nonEmpty =>
          Some((a.toAttribute, part, order, w.child))
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(RankLimit(rankAttr, k),
        RowNumberWindow(winAttr, part, order, child)))
        if k > 0 && rankAttr.semanticEquals(winAttr) &&
          !projectList.exists(_.references.contains(winAttr)) &&
          projectList.forall(_.references.subsetOf(child.outputSet)) =>
      // Spark's InferWindowGroupLimit may already have slid a
      // WindowGroupLimit under the Window; the heap exec subsumes it
      // (same keys/order/limit), so unwrap rather than stack the two.
      val base = child match {
        case wgl: WindowGroupLimit
            if wgl.partitionSpec == part && wgl.orderSpec == order &&
              wgl.limit >= k => wgl.child
        case other => other
      }
      Project(projectList, TopKPerKey(part, order, k, base))
  }
}
