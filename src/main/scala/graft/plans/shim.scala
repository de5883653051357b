package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the private[sql] Dataset constructor so graft's custom
  * logical operators ([[graft.plans.AsOfJoinNode]]) can be turned into
  * DataFrames — the standard extension-library pattern for planting a
  * custom LogicalPlan into a session.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
