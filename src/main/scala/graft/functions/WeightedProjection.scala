package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Integer-weighted projection: `out_j = Σ_d w(j,d) · q_d` over the
  * 1/quant-QUANTIZED input vector `q_d = floor(v_d·quant + 0.5)` with an
  * arbitrary INTEGER weight matrix — the trained-matrix sibling of
  * [[SignedProjection]] (whose weights are ±1). Every output coordinate
  * is an exact 64-bit integer any engine reproduces bit-for-bit, which is
  * what makes a TRAINED projection (PCA components quantized to longs)
  * hash-gateable: a float dot product would hinge on summation order.
  * Divide by quant·(the weights' own scale) to recover real values;
  * rankings/distances work directly on the integers.
  *
  * The weight matrix rides as a plan reference object (the
  * [[NearestCells]] pattern — outDims·dims literal nodes would bloat the
  * plan). Arithmetic is Math.multiplyExact/addExact: |q| ≤ quant·|v| and
  * PCA weights quantized at 1e9 stay orders of magnitude inside 2^63 for
  * real embedding widths, and anything wider refuses LOUDLY instead of
  * wrapping (the [[OuterProductAggregate]] contract).
  *
  * Map-only at any scale: no shuffle, no state. Rows whose vector is NULL
  * or shorter than `dims` yield NULL (callers filter).
  */
case class WeightedProjection(
    child: Expression, weights: Seq[Seq[Long]], quant: Double)
  extends UnaryExpression {

  require(weights.nonEmpty && weights.head.nonEmpty, "weights must be non-empty")
  require(weights.forall(_.length == weights.head.length),
    "weights rows must have equal length")
  require(quant > 0, "quant must be positive")

  private val outDims: Int = weights.length
  private val dims: Int = weights.head.length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "weighted_projection"

  // flat row-major [j][d]
  @transient private lazy val flat: Array[Long] = weights.flatten.toArray
  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"weighted_projection expects array<float|double>, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    WeightedProjection.project(
      v.asInstanceOf[ArrayData], isFloat, flat, dims, outDims, quant)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("wpWeights", flat, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.functions.WeightedProjection.project(
         |  $v, $isFloat, $w, $dims, $outDims, $quant);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): WeightedProjection =
    copy(child = c)
}

object WeightedProjection {

  def project(
      arr: ArrayData, isFloat: Boolean, w: Array[Long],
      dims: Int, outDims: Int, quant: Double): GenericArrayData = {
    if (arr.numElements() < dims) return null
    val q = new Array[Long](dims)
    var d = 0
    while (d < dims) {
      val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      q(d) = Math.floor(x * quant + 0.5).toLong
      d += 1
    }
    val out = new Array[Long](outDims)
    var j = 0
    while (j < outDims) {
      var acc = 0L
      val off = j * dims
      d = 0
      while (d < dims) {
        acc = Math.addExact(acc, Math.multiplyExact(w(off + d), q(d)))
        d += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, weights: Seq[Seq[Long]], quant: Double): Column =
    ColumnBridge.toColumn(WeightedProjection(
      ColumnBridge.toExpression(c), weights, quant))
}
