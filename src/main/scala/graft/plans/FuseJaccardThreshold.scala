package graft.plans

import graft.functions.{SortedJaccardBp, SortedJaccardGeBp}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: in Filter/Join conditions, rewrite the comparison form
  * `sorted_jaccard_bp(a, b) >= t` (and `> t` as `>= t+1`) into the
  * early-exit [[SortedJaccardGeBp]] — boolean contexts don't need the
  * quantized VALUE, only the verdict, and the fused test aborts a failing
  * merge as soon as the remaining elements cannot close the gap. On the
  * all-pairs similarity joins most candidate pairs fail the threshold, so
  * the abort trims the tail of most merges; projections that output
  * `jacc_bp` still use the full-value expression.
  *
  * Runs AFTER [[InferJaccardSizeBound]] in the extension sequence: that
  * rule pattern-matches the comparison form to derive the Bayardo size
  * bounds, and both rules sit in one fixed-point batch — once fused, the
  * bounds are already present as conjuncts, so the batch is stable.
  * Value-exactness of the integer reformulation (and filter-equivalence
  * of the null-element edge) is argued in [[SortedJaccardGeBp]]'s doc and
  * pinned by OperatorEdgeSpec's exhaustive equivalence check.
  */
object FuseJaccardThreshold extends Rule[LogicalPlan] {

  private def bp(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType)  => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case _                           => None
  }

  // only fuse in-range thresholds: jacc_bp ∈ [0, 10000], so anything
  // outside is a degenerate comparison we leave alone (also avoids the
  // t+1 overflow edge on Long.MaxValue)
  private def inRange(t: Long): Boolean = t >= 0L && t <= 10000L

  private def fuse(cond: Expression): Expression = cond match {
    case And(l, r) => And(fuse(l), fuse(r))
    case GreaterThanOrEqual(j @ SortedJaccardBp(a, b), lit)
        if bp(lit).exists(inRange) && j.deterministic =>
      SortedJaccardGeBp(a, b, Literal(bp(lit).get, LongType))
    case GreaterThan(j @ SortedJaccardBp(a, b), lit)
        if bp(lit).exists(inRange) && j.deterministic =>
      SortedJaccardGeBp(a, b, Literal(bp(lit).get + 1L, LongType))
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val r = fuse(cond)
      if (r fastEquals cond) f else f.copy(condition = r)
    case j @ Join(_, _, _, Some(cond), _) =>
      val r = fuse(cond)
      if (r fastEquals cond) j else j.copy(condition = Some(r))
  }
}
