package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Single-pass native `smoke` aggregate — the reference's custom Postgres
  * aggregate (/root/reference/libnntsc/database.py:421-435, 469-477): drop
  * NULLs, sort, rank into ntile(20) buckets, return per-bucket averages.
  *
  * This is the per-group buffer form (Catalyst TypedImperativeAggregate
  * with partial merge, so it map-side-combines across partitions); the
  * compositional window/groupBy form in QueryEngine.smokeByGroup computes
  * the same result with bounded memory per task and is preferred for very
  * large groups. Buffer size = group cardinality (the reference's
  * array_append sfunc had the same profile).
  */
case class SmokeAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Double]]
  with ImplicitCastInputTypes
  with UnaryLike[Expression] {

  override def inputTypes: Seq[org.apache.spark.sql.GraftShim.AbstractDataType] =
    Seq(DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "smoke"

  override def createAggregationBuffer(): ArrayBuffer[Double] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[Double], input: InternalRow): ArrayBuffer[Double] = {
    val v = child.eval(input)
    if (v != null) buf += v.asInstanceOf[Double]
    buf
  }

  override def merge(b1: ArrayBuffer[Double], b2: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    b1 ++= b2; b1
  }

  override def eval(buf: ArrayBuffer[Double]): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(SmokeAggregate.ntileAverages(buf.sorted.toArray, 20))

  override def serialize(buf: ArrayBuffer[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new ArrayBuffer[Double](n)
    var i = 0
    while (i < n) { out += bb.getDouble; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): SmokeAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SmokeAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SmokeAggregate =
    copy(child = c)
}

object SmokeAggregate {
  /** Exact SQL ntile semantics over a sorted array: k buckets, the first
    * (n mod k) buckets hold one extra row; per-bucket arithmetic mean.
    * Fewer rows than buckets → one bucket per row (matches ntile + GROUP BY
    * in the reference finisher, database.py:427-434).
    */
  def ntileAverages(sorted: Array[Double], k: Int): Array[Double] = {
    val n = sorted.length
    val buckets = math.min(n, k)
    val base = n / buckets
    val extra = n % buckets
    val out = new Array[Double](buckets)
    var idx = 0
    var b = 0
    while (b < buckets) {
      val sz = base + (if (b < extra) 1 else 0)
      var s = 0.0
      var i = 0
      while (i < sz) { s += sorted(idx); idx += 1; i += 1 }
      out(b) = s / sz
      b += 1
    }
    out
  }

  /** Column API: `smoke_agg(col)`. */
  def smoke(c: Column): Column =
    ColumnBridge.toColumn(
      SmokeAggregate(ColumnBridge.toExpression(c)).toAggregateExpression())
}
