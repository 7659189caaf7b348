package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Expression conversion, for
  * exposing custom Catalyst expressions (e.g. graft.functions.
  * DotProductDouble) as user-facing Columns. Lives under the
  * org.apache.spark.sql package namespace solely to satisfy the access
  * modifier; uses only stable catalyst types in its signature. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp function on a live session (sessionState is
    * private[sql]; the extensions route covers session-build time). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Register a TABLE-VALUED function (FROM-position, e.g.
    * `SELECT … FROM graft_asof('/t', 0)`) on a live session — the same
    * private[sql] seam, against the table-function registry. */
  def registerTableFunction(spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
