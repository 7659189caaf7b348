package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSparkSession}

/** Bridge to Spark's `private[sql]` Dataset.ofRows, for wrapping custom
  * logical plans (graft.plans.*) into user-facing DataFrames. Lives under
  * the org.apache.spark.sql package namespace solely to satisfy the access
  * modifier — same pattern as [[ColumnBridge]]. */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
