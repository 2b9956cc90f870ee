package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass second-moment aggregate over a vector column: one buffer of
  * exact integer sums covering the count, the per-dimension sums, and the
  * upper-triangle outer-product sums of the 1/quant-QUANTIZED vectors —
  * everything covariance/PCA needs, in ONE map-side-combined pass whose
  * buffer is a fixed `1 + d + d(d+1)/2` longs (d = 64 → 2 145 slots,
  * ~17 KB) regardless of corpus size. The relational alternative is
  * d(d+1)/2 separate sum() aggregates (codegen explodes past a few hundred)
  * or a pair-exploded groupBy (×d² row blowup before the shuffle).
  *
  * Quantization is the cross-engine exactness contract (the md5-family
  * pattern): `vq = floor(v·quant + 0.5)` is the same double arithmetic on
  * any engine, and from there everything is exact integer math — no
  * float-summation order to disagree about. All additions go through
  * `Math.addExact`; an overflow throws loudly instead of wrapping. With
  * quant = 1e6 and |v| ≤ ~10, products stay < 2^47, so sums are exact to
  * ~3×10⁴ corpus rows per unit magnitude — gate scales. At 100 TB drop
  * quant to 1e3 (exact past 10¹² rows) or shard the corpus and merge
  * covariances driver-side; the scaladoc on `Similarity.covarianceStats`
  * carries the sizing rule.
  *
  * Buffer layout: [0] = n, [1..d] = Σ vq_i, then Σ vq_i·vq_j for i ≤ j in
  * row-major upper-triangle order. Rows whose vector is NULL or shorter
  * than `dims` are skipped (SQL aggregate convention).
  */
case class OuterProductAggregate(
    vec: Expression,
    dims: Int,
    quant: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(dims >= 1, s"outer_product: dims must be positive, got $dims")
  require(quant > 0, s"outer_product: quant must be positive, got $quant")

  override def child: Expression = vec

  private val size = 1 + dims + dims * (dims + 1) / 2

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "outer_product"

  @transient private lazy val isFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    vec.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"outer_product expects array<float|double>, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](size)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = vec.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < dims) return buf
    val q = new Array[Long](dims)
    var i = 0
    while (i < dims) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      // the engine-portable quantization: double multiply, +0.5, floor —
      // three IEEE ops any engine performs identically on the same input
      q(i) = Math.floor(x * quant + 0.5).toLong
      i += 1
    }
    buf(0) = Math.addExact(buf(0), 1L)
    i = 0
    var slot = 1 + dims
    while (i < dims) {
      buf(1 + i) = Math.addExact(buf(1 + i), q(i))
      var j = i
      while (j < dims) {
        buf(slot) = Math.addExact(buf(slot), Math.multiplyExact(q(i), q(j)))
        slot += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < size) { b1(i) = Math.addExact(b1(i), b2(i)); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(size * 8)
    var i = 0
    while (i < size) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](size)
    var i = 0
    while (i < size) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): OuterProductAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): OuterProductAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): OuterProductAggregate =
    copy(vec = c)
}

object OuterProductAggregate {
  /** Column API: `outer_product(vec, d, quant)` → `array<bigint>` of
    * [n, Σvq_1..Σvq_d, Σvq_i·vq_j (i ≤ j, row-major)].
    */
  def outerProduct(vec: Column, dims: Int, quant: Double): Column =
    ColumnBridge.toColumn(
      OuterProductAggregate(ColumnBridge.toExpression(vec), dims, quant)
        .toAggregateExpression())
}
