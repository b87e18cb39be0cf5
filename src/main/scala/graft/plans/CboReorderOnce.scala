package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

/** Once-per-plan wrapper around Catalyst's [[org.apache.spark.sql.catalyst
  * .optimizer.CostBasedJoinReorder]] for the post-pushdown re-application
  * ([[graft.Tables.ensure]]): upstream Spark runs that rule in a `Once`
  * batch explicitly excluded from idempotence checks because join
  * reordering is NOT idempotent — appended to `extraOptimizations` it
  * lands in the fixed-point "User Provided Optimizers" batch instead,
  * where with CBO enabled it can churn a multi-join plan every iteration
  * up to `maxIterations` (idempotence warnings + wasted optimizer time;
  * semantics preserved but noisy). The guard tags the plan root after
  * the first application and no-ops thereafter; transforms copy tags
  * (`TreeNode.copyTagsFrom`), so the tag survives the batch's other
  * rules and the fixed point is reached on the next iteration. */
object CboReorderOnce extends Rule[LogicalPlan] {
  private val applied = TreeNodeTag[Boolean]("graft.cbo.reordered")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (plan.getTagValue(applied).contains(true)) plan
    else {
      val out =
        org.apache.spark.sql.catalyst.optimizer.CostBasedJoinReorder(plan)
      out.setTagValue(applied, true)
      out
    }
  }
}
