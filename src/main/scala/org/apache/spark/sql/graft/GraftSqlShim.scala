package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal shim inside the `org.apache.spark.sql` namespace:
  * `classic.Dataset.ofRows` (wrap a hand-built [[LogicalPlan]] as a
  * DataFrame) is `private[sql]`, and building a custom logical operator
  * (graft.plans.AsOfJoinNode) needs exactly that hop. One forwarding
  * call, nothing else — the standard integration pattern for plan-level
  * Spark extensions.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
