package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the private[sql] Dataset.ofRows — the entry point for
  * libraries that construct their own resolved [[LogicalPlan]] nodes
  * (graft.plans.AsofJoinPlan) and hand them to the session's planner,
  * where an injected [[org.apache.spark.sql.execution.SparkStrategy]]
  * picks the physical operator. Companion to [[GraftColumnBridge]].
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
