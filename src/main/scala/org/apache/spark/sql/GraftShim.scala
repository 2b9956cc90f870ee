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

  // type aliases laundering `private[sql]` type-system members for graft's
  // Catalyst extensions (Spark 4 hid these from the public surface)
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType
  type IntegralType = org.apache.spark.sql.types.IntegralType
  type FractionalType = org.apache.spark.sql.types.FractionalType
}
