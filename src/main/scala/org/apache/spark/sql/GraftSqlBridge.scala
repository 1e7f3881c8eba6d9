package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned crossing into Spark's `private[sql]` surface: wrap a
  * custom [[LogicalPlan]] node as a user-facing [[DataFrame]]. Spark's own
  * API offers no public constructor for this on purpose (plans built by
  * hand skip analysis guarantees), so the engine keeps the crossing to a
  * single audited call site — graft's custom operators
  * ([[graft.plans.AsofJoinPlan]]) build RESOLVED plans from analyzed child
  * DataFrames, which is exactly the contract `Dataset.ofRows` expects.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
