package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The fused ADC scoring kernel for PQ search: from one code array, emit
  * every query's `(query_id, sim)` in a single pass over the lookup
  * tables —
  *
  *   sim_q = round( (Σ_s D_q[s][code_s]) / (‖q‖ · sqrt(Σ_s N[s][code_s])), 6 )
  *
  * The tables ride as flat `double[]` plan REFERENCE OBJECTS (the
  * [[NearestCells]] argument: literal `element_at` chains evaluate boxed
  * and, worse, project-collapse can clone the whole chain per output
  * column — measured 2.6× SLOWER than the raw-vector brute-force scan at
  * sf0.1; this kernel reads each table entry exactly once per row). Both
  * Σ_s accumulate in block order and the final round replicates
  * `round(x, 6)` (BigDecimal HALF_UP — Spark's RoundBase double path), so
  * results are bit-identical to the composed
  * `element_at(...) + ... / (qnorm * sqrt(...))` form the oracle replays.
  */
case class AdcScores(
    child: Expression,
    queryIds: Seq[Long],
    qnorms: Seq[Double],
    lutDot: Seq[Double],
    lutNorm: Seq[Double],
    m: Int,
    ks: Int)
    extends UnaryExpression {

  require(queryIds.nonEmpty && queryIds.length == qnorms.length, "one qnorm per query")
  require(lutNorm.length == m * ks, s"lutNorm wants m*ks=${m * ks} entries")
  require(lutDot.length == queryIds.length * m * ks, "lutDot wants nq*m*ks entries")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "adc_scores"

  @transient private lazy val idsArr: Array[Long] = queryIds.toArray
  @transient private lazy val qnormsArr: Array[Double] = qnorms.toArray
  @transient private lazy val dotArr: Array[Double] = lutDot.toArray
  @transient private lazy val normArr: Array[Double] = lutNorm.toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"adc_scores expects array<int> codes, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    AdcScores.score(v.asInstanceOf[ArrayData], idsArr, qnormsArr, dotArr, normArr, m, ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("adcIds", idsArr, "long[]")
    val qn = ctx.addReferenceObj("adcQnorms", qnormsArr, "double[]")
    val dd = ctx.addReferenceObj("adcDot", dotArr, "double[]")
    val nn = ctx.addReferenceObj("adcNorm", normArr, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.functions.AdcScores.score(
         |  $v, $ids, $qn, $dd, $nn, $m, $ks);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): AdcScores =
    copy(child = c)
}

object AdcScores {

  /** One row's scores: the per-row Σ_s N lookup happens once, each query
    * then folds its m D-entries in block order. ~nq·m flat array reads —
    * the brute-force dot does nq·d multiplies on 4·d raw bytes.
    */
  def score(
      codes: ArrayData,
      ids: Array[Long],
      qnorms: Array[Double],
      lutDot: Array[Double],
      lutNorm: Array[Double],
      m: Int,
      ks: Int): ArrayData = {
    var nsum = 0.0
    var s = 0
    while (s < m) { nsum += lutNorm(s * ks + codes.getInt(s)); s += 1 }
    val den = java.lang.Math.sqrt(nsum)
    val nq = ids.length
    val out = new Array[Any](nq)
    var q = 0
    while (q < nq) {
      var acc = 0.0
      val base = q * m * ks
      var b = 0
      while (b < m) { acc += lutDot(base + b * ks + codes.getInt(b)); b += 1 }
      val sim = BigDecimal(acc / (qnorms(q) * den))
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      out(q) = new GenericInternalRow(Array[Any](ids(q), sim)): InternalRow
      q += 1
    }
    new GenericArrayData(out)
  }

  def adcScores(
      codes: Column,
      queryIds: Seq[Long],
      qnorms: Seq[Double],
      lutDot: Seq[Double],
      lutNorm: Seq[Double],
      m: Int,
      ks: Int): Column =
    ColumnBridge.toColumn(
      AdcScores(ColumnBridge.toExpression(codes), queryIds, qnorms, lutDot, lutNorm, m, ks))
}
