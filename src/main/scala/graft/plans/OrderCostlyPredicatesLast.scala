package graft.plans

import graft.functions.{FloatDot, SortedIntersectSize, SortedJaccardBp, SortedJaccardGeBp}
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: inside Filter and Join conditions, evaluate conjuncts
  * that are free of the engine's expensive vector/set expressions
  * (float_dot, sorted_intersect_size, sorted_jaccard_bp) FIRST.
  *
  * Catalyst preserves the textual conjunct order and predicate codegen
  * short-circuits left-to-right, so on an all-pairs join a condition like
  * `floor(10000·float_dot(va,vb)) ≥ t AND da < db` pays the O(dims) dot
  * product for BOTH orientations of every pair before the trivial
  * comparison halves the work — measured 2× on the similarity joins.
  * Users write conjuncts in any order; this rule canonicalizes them
  * cheap-first (a stable partition, so the fixed-point batch converges in
  * one pass).
  */
object OrderCostlyPredicatesLast extends Rule[LogicalPlan] {

  private def isCostly(e: Expression): Boolean = e.exists {
    case _: SortedJaccardBp | _: SortedJaccardGeBp | _: SortedIntersectSize | _: FloatDot => true
    case _ => false
  }

  private def split(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => split(l) ++ split(r)
    case other     => other :: Nil
  }

  private def reorder(cond: Expression): Expression = {
    // reordering changes conjunct evaluation order/count — unsound for
    // non-deterministic conjuncts (e.g. rand()-based sampling predicates),
    // matching Catalyst's own predicate-reorder convention
    if (!cond.deterministic) return cond
    val cs = split(cond)
    val (cheap, costly) = cs.partition(c => !isCostly(c))
    if (cheap.isEmpty || costly.isEmpty) cond
    else {
      val ordered = cheap ++ costly
      if (ordered.zip(cs).forall { case (a, b) => a fastEquals b }) cond
      else ordered.reduce(And)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val r = reorder(cond)
      if (r fastEquals cond) f else f.copy(condition = r)
    case j @ Join(_, _, _, Some(cond), _) =>
      val r = reorder(cond)
      if (r fastEquals cond) j else j.copy(condition = Some(r))
  }
}
