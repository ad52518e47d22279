package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` API surface, the standard pattern for Spark
  * extension libraries: `classic.ExpressionUtils.column/expression` are the
  * supported way to wrap a custom Catalyst Expression as a user-facing
  * Column in Spark 4.x, but they are package-private to org.apache.spark.sql.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a (fully resolved) LogicalPlan as a DataFrame —
    * `classic.Dataset.ofRows` is the supported internal constructor for
    * extension libraries shipping custom plan nodes, but it is
    * `private[sql]`.
    */
  def ofRows(s: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)

  /** Wrap an InternalRow RDD as a STREAMING DataFrame — what a V1
    * streaming `Source.getBatch` must return (MicroBatchExecution asserts
    * `isStreaming`). This is the same `internalCreateDataFrame(...,
    * isStreaming = true)` call the built-in file/rate sources make; it is
    * `private[sql]`-adjacent (public on classic.SparkSession but not on
    * the api surface), hence routed through this one sanctioned bridge.
    */
  def streamingDataFrame(s: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
