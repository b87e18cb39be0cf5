package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `private[sql]` access shim: `Dataset.ofRows` is the one constructor for a
  * DataFrame over a CUSTOM LogicalPlan (graft.plans.AsofJoinPlan), and Spark
  * exposes no public equivalent. Standard extension-library practice; the
  * only member Spark internal this package-placement touches. */
object GraftSqlInternal {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
