package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Natural log via the PLATFORM libm (`java.lang.Math.log`) instead of
  * Spark's built-in `log()`, which evaluates `StrictMath.log` (fdlibm).
  *
  * Why this exists: the log-form scorers (BM25 log-idf, LM
  * cross-entropy) are hash-gated against a DuckDB oracle whose `ln` is
  * the platform libm (glibc, correctly rounded). Measured on 600k
  * random rationals in the scorers' input ranges:
  *
  *   - `StrictMath.log` (Spark's `log()`): 6.2% of inputs differ from
  *     glibc — hopeless for bitwise gates;
  *   - `Math.log` (HotSpot intrinsic):     0.06% differ, all by 1 ulp.
  *
  * The residual 1-ulp disagreements are absorbed by the gates'
  * quantization: a flip needs the quantization boundary to land INSIDE
  * the 1-ulp gap, probability ≈ ulp/quantum ≈ 3.6e-15/1e-9 ≈ 4e-6 per
  * differing input (≈2e-9 per term overall) — zero flips observed at
  * any test scale.
  *
  * Tradeoff, stated: `Math.log` may differ (by ≤1 ulp) across JVM
  * versions or CPU architectures, where `StrictMath` never does. The
  * quantized integer sums make that immaterial at the same odds as the
  * oracle parity above; use Spark's `log()` where cross-JVM bit
  * stability matters more than oracle parity.
  */
case class PlatformLn(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "platform_ln"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"platform_ln expects double, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    java.lang.Math.log(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"java.lang.Math.log($v)")

  override protected def withNewChildInternal(c: Expression): PlatformLn =
    copy(child = c)
}

object PlatformLn {
  def apply(x: Column): Column =
    ColumnBridge.toColumn(PlatformLn(ColumnBridge.toExpression(x)))
}
