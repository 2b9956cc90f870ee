package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Signed random projection (Johnson–Lindenstrauss with a ±1 matrix,
  * Achlioptas 2003): `out_j = Σ_d sign(j,d) · q_d` over the
  * 1/quant-QUANTIZED input vector `q_d = floor(v_d·quant + 0.5)` — the
  * [[OuterProductAggregate]] exactness contract, so every output
  * coordinate is an exact 64-bit integer any engine reproduces
  * bit-for-bit (a float ±1 projection would hinge on summation order).
  * Dividing by quant recovers the real-valued projection; distance
  * ratios are preserved in the usual JL sense for outDims ≥
  * O(log n / ε²).
  *
  * The sign matrix rides as a plan reference object (the
  * [[NearestCells]] pattern — k·d literal nodes would bloat the plan);
  * signs come from the shared md5 plane family
  * (`sign(j,d) = +1 iff md5Base60("seed:j:d") is even`), so the DuckDB
  * oracle derives the SAME matrix from md5() directly — the derivation
  * itself is cross-checked, not just the result.
  *
  * Map-only at any scale: no shuffle, no state — a projection in the
  * relational sense too. Rows whose vector is NULL or shorter than
  * `dims` yield NULL (callers filter).
  */
case class SignedProjection(
    child: Expression, dims: Int, outDims: Int, quant: Double, seed: String)
  extends UnaryExpression {

  require(dims >= 1 && outDims >= 1, "dims and outDims must be >= 1")
  require(quant > 0, "quant must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "signed_projection"

  // +1/-1 as a flat byte matrix, row-major [j][d]
  @transient private lazy val signs: Array[Byte] =
    SignedProjection.signMatrix(seed, outDims, dims)
  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"signed_projection expects array<float|double>, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    SignedProjection.project(
      v.asInstanceOf[ArrayData], isFloat, signs, dims, outDims, quant)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("rpSigns", signs, "byte[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.functions.SignedProjection.project(
         |  $v, $isFloat, $s, $dims, $outDims, $quant);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SignedProjection =
    copy(child = c)
}

object SignedProjection {

  /** `+1` iff the lower-60-md5 of `"seed:j:d"` is even — in DuckDB:
    * `CASE WHEN ('0x' || substr(md5(seed || ':' || j || ':' || d), 1, 15))::BIGINT
    *  % 2 = 0 THEN 1 ELSE -1 END`.
    */
  def signMatrix(seed: String, outDims: Int, dims: Int): Array[Byte] = {
    val out = new Array[Byte](outDims * dims)
    var j = 0
    while (j < outDims) {
      var d = 0
      while (d < dims) {
        val base = MinHashSignatureMd5.md5Base60(s"$seed:$j:$d")
        out(j * dims + d) = if ((base & 1L) == 0L) 1 else -1
        d += 1
      }
      j += 1
    }
    out
  }

  def project(
      arr: ArrayData, isFloat: Boolean, signs: Array[Byte],
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
        val s = signs(off + d)
        // exact: |q_d| ≤ quant·|v|, dims ≤ ~1e4 → far below 2^63
        acc += (if (s > 0) q(d) else -q(d))
        d += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, dims: Int, outDims: Int, quant: Double, seed: String): Column =
    ColumnBridge.toColumn(SignedProjection(
      ColumnBridge.toExpression(c), dims, outDims, quant, seed))
}
