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

  /** Release the storage blocks behind an eager `localCheckpoint(true)`
    * Dataset. `Dataset.unpersist` only reaches the cacheManager (persist/
    * cache), not the checkpointed RDD's blocks; the RDD itself hides inside
    * the plan's `LogicalRDD` leaf (private[sql]). Multi-stage operators that
    * checkpoint intermediate frames call this once every downstream consumer
    * is itself checkpointed, so big frames don't coexist for the caller's
    * final action. The frame becomes UNRECOMPUTABLE — only safe when the
    * returned plan no longer references it.
    */
  def freeLocalCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ =>
    }
}
