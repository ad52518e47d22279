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
}
