package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column <-> Expression conversions
  * (Spark 4.x moved them behind `org.apache.spark.sql.classic`). Lives in
  * the spark.sql package purely for access; all graft code goes through
  * `graft.functions.ColumnBridge`.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over an arbitrary logical plan (custom operator nodes). */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Register an extra planner strategy on a live session (idempotent). */
  def addStrategy(
      spark: SparkSession,
      s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val em = spark.asInstanceOf[classic.SparkSession].experimental
    if (!em.extraStrategies.contains(s)) em.extraStrategies = em.extraStrategies :+ s
  }

  /** Register an extra optimizer rule on a live session (idempotent). */
  def addOptimization(
      spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val em = spark.asInstanceOf[classic.SparkSession].experimental
    if (!em.extraOptimizations.contains(r))
      em.extraOptimizations = em.extraOptimizations :+ r
  }

  // type aliases laundering `private[sql]` type-system members for graft's
  // Catalyst extensions (Spark 4 hid these from the public surface)
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType
  type IntegralType = org.apache.spark.sql.types.IntegralType
  type FractionalType = org.apache.spark.sql.types.FractionalType
}
