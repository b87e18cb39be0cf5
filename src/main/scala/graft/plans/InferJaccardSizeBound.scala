package graft.plans

import graft.functions.SortedJaccardBp
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: a predicate `sorted_jaccard_bp(a, b) >= t` implies the
  * Bayardo/Ma/Srikant size-ratio bound (WWW 2007) —
  * `10000·|a| ≥ t·|b|  AND  10000·|b| ≥ t·|a|` — because the Jaccard of
  * two sets can never exceed min(|a|,|b|)/max(|a|,|b|). Injecting the
  * implied conjuncts IN FRONT of the original predicate lets the two int
  * comparisons short-circuit the O(|a|+|b|) merge pass on every
  * size-incompatible pair, wherever the user (or predicate pushdown)
  * placed the threshold — Filter node or join condition.
  *
  * This is the engine's [[org.apache.spark.sql.catalyst.rules.Rule]]
  * extension point in action: queries state the similarity threshold
  * declaratively and the optimizer derives the pruning, instead of every
  * call site hand-writing it (SetSimilarity relied on a manual bound
  * before this rule). Registered per-session via
  * `spark.experimental.extraOptimizations` (graft.Tables.ensure) and on
  * clusters via `GraftExtensions.injectOptimizerRule`.
  *
  * The rule runs in a fixed-point batch, so it must be idempotent: it
  * skips any conjunct set that already contains a semantically-equal
  * bound. All constructed expressions are fully resolved/typed (the
  * analyzer does not run again after optimizer rules).
  */
object InferJaccardSizeBound extends Rule[LogicalPlan] {

  private def bp(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, _)         => Some(v.toLong)
    case _                          => None
  }

  private def sizeTimes(arr: Expression, factor: Long): Expression =
    Multiply(Cast(Size(arr), LongType), Literal(factor, LongType))

  private def bound(a: Expression, b: Expression, t: Long): Seq[Expression] =
    Seq(
      GreaterThanOrEqual(sizeTimes(a, 10000L), sizeTimes(b, t)),
      GreaterThanOrEqual(sizeTimes(b, 10000L), sizeTimes(a, t)))

  private def rewrite(cond: Expression): Expression = {
    val conjuncts = splitConjunctivePredicates(cond)
    // idempotence against the fixed-point batch: the bound is compared (and
    // re-added) as INDIVIDUAL conjuncts, because a previously-added
    // And(b1, b2) is already split apart by the time the rule sees the
    // condition again
    // duplicating a/b into the Size() bounds re-evaluates them — only
    // sound when both argument expressions are deterministic
    val implied = conjuncts.flatMap {
      case GreaterThanOrEqual(SortedJaccardBp(a, b), lit)
          if a.deterministic && b.deterministic =>
        bp(lit).toSeq.flatMap(t => bound(a, b, t))
      case GreaterThan(SortedJaccardBp(a, b), lit)
          if a.deterministic && b.deterministic =>
        bp(lit).toSeq.flatMap(t => bound(a, b, t))
      case _ => Nil
    }.filterNot(bnd => conjuncts.exists(_.semanticEquals(bnd)))
    if (implied.isEmpty) cond
    else {
      // cheap conjuncts FIRST: predicate codegen evaluates conjuncts in
      // order, so the int bounds — and any other predicate free of the
      // merge-pass expression, e.g. the ka<kb pair dedup — short-circuit
      // before sorted_jaccard_bp runs
      val (cheap, costly) = (implied ++ conjuncts)
        .partition(c => !c.exists(_.isInstanceOf[SortedJaccardBp]))
      (cheap ++ costly).reduce(And)
    }
  }

  private def splitConjunctivePredicates(condition: Expression): Seq[Expression] =
    condition match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other     => other :: Nil
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val r = rewrite(cond)
      if (r fastEquals cond) f else f.copy(condition = r)
    case j @ Join(_, _, _, Some(cond), _) =>
      val r = rewrite(cond)
      if (r fastEquals cond) j else j.copy(condition = Some(r))
  }
}
