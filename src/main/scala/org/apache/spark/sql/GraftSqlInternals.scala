package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into private[sql] surface: constructing a DataFrame from a
  * custom LogicalPlan has no public API, so every library that adds its
  * own logical operators carries this one-liner inside the spark package.
  * Kept to the absolute minimum (two accessors, no behavior). */
object GraftSqlInternals {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Column over a custom Expression — needed for expressions that carry
    * a RUNTIME object (a broadcast handle) and therefore cannot ride the
    * SQL function registry's literal-only argument surface. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The (possibly unresolved) Expression under a Column. */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
