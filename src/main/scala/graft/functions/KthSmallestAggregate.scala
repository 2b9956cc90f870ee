package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

private[functions] final class KSmallBuf {
  val items: ArrayBuffer[String] = ArrayBuffer.empty
  var cutoffValid: Boolean = false // items holds exactly k, sorted ascending
}

/** `kth_smallest(key, k)` — the k-th smallest string per group, or the
  * group's maximum when it has fewer than k rows. The per-group admission
  * THRESHOLD of a deterministic cap: over unique keys,
  * `key <= kth_smallest(key, k)` holds for exactly min(k, group size)
  * rows, so [[graft.pipeline.Splits.capPerGroup]] can select its members
  * with a map-only filter instead of a corpus-wide group shuffle + window
  * sort (the Zipf-hot-domain funnel: every row of a 90%-one-domain corpus
  * through ONE window task).
  *
  * The buffer is the [[TopKCountedAggregate]] staged pattern — at most 2k
  * strings, compacted to the k smallest whenever it fills, with a cutoff
  * short-circuit once exactly k are held — and Spark's partial aggregation
  * runs it map-side, so the shuffle moves at most k keys per group per
  * partition however large (or skewed) the corpus. Comparisons are
  * code-point order, matching UTF8String/DuckDB byte order (the cap's
  * keys are ASCII hex, where this equals String.compareTo).
  */
case class KthSmallestAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KSmallBuf]
  with ImplicitCastInputTypes
  with UnaryLike[Expression] {

  require(k > 0, s"kth_smallest: k must be positive, got $k")

  override def inputTypes: Seq[org.apache.spark.sql.GraftShim.AbstractDataType] =
    Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // null only for an all-null group
  override def prettyName: String = "kth_smallest"

  @inline private def lt(a: String, b: String): Boolean =
    TopKCountedAggregate.codePointCompare(a, b) < 0

  private val ord: Ordering[String] =
    (a: String, b: String) => TopKCountedAggregate.codePointCompare(a, b)

  private def compact(buf: KSmallBuf): KSmallBuf = {
    buf.items.sortInPlace()(ord)
    buf.items.takeInPlace(k)
    buf.cutoffValid = buf.items.length == k
    buf
  }

  override def createAggregationBuffer(): KSmallBuf = new KSmallBuf

  override def update(buf: KSmallBuf, input: InternalRow): KSmallBuf = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      if (!buf.cutoffValid || lt(s, buf.items.last)) {
        buf.items += s
        buf.cutoffValid = false
        if (buf.items.length >= 2 * k) compact(buf)
      }
    }
    buf
  }

  override def merge(b1: KSmallBuf, b2: KSmallBuf): KSmallBuf = {
    b1.items ++= b2.items
    compact(b1)
  }

  override def eval(buf: KSmallBuf): Any = {
    compact(buf)
    if (buf.items.isEmpty) null
    else UTF8String.fromString(buf.items.last) // k-th smallest, or max if < k
  }

  override def serialize(buf: KSmallBuf): Array[Byte] = {
    compact(buf)
    val strs = buf.items.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bb = java.nio.ByteBuffer.allocate(
      4 + buf.items.length * 4 + strs.map(_.length).sum)
    bb.putInt(buf.items.length)
    strs.foreach { sb => bb.putInt(sb.length); bb.put(sb) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KSmallBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new KSmallBuf
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val sb = new Array[Byte](len)
      bb.get(sb)
      out.items += new String(sb, java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    out.cutoffValid = n == k
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): KthSmallestAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KthSmallestAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KthSmallestAggregate =
    copy(child = c)
}

object KthSmallestAggregate {
  /** `kth_smallest(key, k)` → the group's k-th smallest string (its max
    * when the group holds fewer than k non-null keys; null when none).
    */
  def kthSmallest(key: Column, k: Int): Column =
    ColumnBridge.toColumn(
      KthSmallestAggregate(ColumnBridge.toExpression(key), k)
        .toAggregateExpression())
}
