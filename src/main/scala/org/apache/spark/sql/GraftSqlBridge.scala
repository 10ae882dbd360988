package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` call a planner-extension library needs: turn a
  * hand-built [[LogicalPlan]] into a DataFrame on an existing session.
  * Every public Spark extension (Delta, Iceberg, Sedona, ...) ships this
  * same one-file bridge; everything else in graft stays in its own
  * package and uses only developer-API surface.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a hand-built catalyst [[Expression]] as a [[Column]] — needed
    * for expressions that carry non-SQL-expressible state (a broadcast
    * handle) and so cannot go through the function-registry builder,
    * which only receives child expressions. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The inverse of [[column]] — unwrap a [[Column]] to its catalyst
    * expression so it can be a child of a hand-built expression. */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
