package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Catalyst plumbing (Column <-> Expression).
  * Lives under org.apache.spark.sql solely for access; no Spark internals
  * are modified. Used by graft's custom Catalyst expressions.
  */
object GraftSqlShim {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Executes a logical plan on the session (commands run eagerly,
    * exactly once) and returns its result rows. Used by graft's
    * deferred-persist command wrapper on the Spark Connect path. */
  def runPlan(session: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Seq[Row] =
    org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan).collect().toSeq

  /** Eagerly converts the Column's node tree to a Catalyst expression.
    * Needed when an expression built from Column API (e.g. a typed UDAF
    * invocation) is returned from a FunctionRegistry builder — the lazy
    * ColumnNodeExpression wrapper would never be converted there. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
