package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` door the engine needs: constructing a DataFrame
  * from a custom [[LogicalPlan]] ([[graft.plans.AsOfJoinNode]]). Spark
  * offers no public API for this — every extension library that ships its
  * own logical operator uses a same-package shim for `Dataset.ofRows`
  * (the planner strategy itself is injected through the PUBLIC
  * `SparkSessionExtensions.injectPlannerStrategy`). Kept to this single
  * forwarder so the internal surface the engine touches is explicit. */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
