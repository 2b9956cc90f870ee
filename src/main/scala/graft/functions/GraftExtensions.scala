package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the native aggregates, so `spark.sql("SELECT
  * smoke(value) …")` works like the reference's in-database functions
  * (database.py:444-477). Use either:
  *
  *   - `GraftExtensions.register(spark)` on an existing session, or
  *   - `spark.sql.extensions=graft.functions.GraftExtensions` /
  *     `.withExtensions(new GraftExtensions)` at session build.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("smoke"),
      info("smoke", "smoke(col) - ntile-20 percentile sketch"),
      (exprs: Seq[Expression]) => SmokeAggregate(exprs.head)),
    (
      FunctionIdentifier("most"),
      info("most", "most(col) - most frequent value"),
      (exprs: Seq[Expression]) => MostAggregate(exprs.head)))

  /** Imperative registration on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
}
