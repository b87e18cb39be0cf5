package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `private[sql]` access shim: `Dataset.ofRows` is the one constructor for a
  * DataFrame over a CUSTOM LogicalPlan (graft.plans.AsofJoinPlan), and Spark
  * exposes no public equivalent. Standard extension-library practice; the
  * only member Spark internal this package-placement touches. */
object GraftSqlInternal {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** The one constructor for a STREAMING DataFrame over a computed batch
    * of rows — what a V1 streaming `Source.getBatch` must return (the
    * FileStreamSource/Delta-source pattern: plan the batch with the full
    * SQL reader, re-wrap its RDD with `isStreaming = true`). */
  def ofStreamingBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }

  /** The reverse direction: a V1 streaming `Sink.addBatch` receives a
    * STREAMING-planned DataFrame that batch writers refuse; re-wrap its
    * planned RDD as a plain batch frame (the ForeachBatchSink pattern)
    * so the transactional append path can consume it. */
  def ofBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}
