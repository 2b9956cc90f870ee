package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4.x bridge between the public `Column` API and Catalyst
  * `Expression`s (the classic `new Column(expr)` / `col.expr` were removed
  * from the public surface in 4.0).
  */
object ColumnBridge {
  def toColumn(e: Expression): Column = GraftShim.column(e)
  def toExpression(c: Column): Expression = GraftShim.expression(c)
}
