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
}
