package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public Column
  * API. `classic.ExpressionUtils` is private[sql] in Spark 4, so this lives in
  * the org.apache.spark.sql package namespace (extension-point pattern —
  * SparkSessionExtensions offers function injection, but a direct wrap is all
  * that is needed for library-internal expressions).
  */
package object graftglue {
  def exprColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def columnExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a hand-built logical plan as a DataFrame (`Dataset.ofRows` is
    * private[sql] in Spark 4) — needed to hand custom logical operators like
    * [[graft.plans.TopKPerKeyPlan]] to the planner.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
