package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

private[functions] final class TopKStrBuf {
  val items: ArrayBuffer[(Long, String)] = ArrayBuffer.empty
  var cutoffValid: Boolean = false
}

/** Bounded per-group top-k for COUNTED STRINGS: keeps the k best
  * `(count, value)` pairs under (count DESC, value ASC) and returns them
  * best-first as `array<struct<value string, cnt bigint>>` — the
  * string-valued sibling of [[TopKPairsAggregate]] (same 2k-bounded
  * staged buffer, same map-side-combine-to-≤k contract), built for
  * per-group heavy hitters (top terms per source/language/domain).
  *
  * The relational alternative — `row_number() OVER (PARTITION BY group
  * ORDER BY cnt DESC, value)` then `rank <= k` — shuffles and sorts the
  * FULL (group × vocabulary) count table; this aggregate ships at most
  * k entries per group per partition. The (count DESC, value ASC) order
  * is total → deterministic, engine-reproducible output.
  */
case class TopKCountedAggregate(
    cnt: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrBuf]
  with ImplicitCastInputTypes
  with BinaryLike[Expression] {

  require(k > 0, s"topk_counted: k must be positive, got $k")

  override def left: Expression = cnt
  override def right: Expression = value

  override def inputTypes: Seq[org.apache.spark.sql.GraftShim.AbstractDataType] =
    Seq(LongType, StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_counted"

  @inline private def beats(ac: Long, av: String, bc: Long, bv: String): Boolean =
    ac > bc || (ac == bc && TopKCountedAggregate.codePointCompare(av, bv) < 0)

  private val ord: Ordering[(Long, String)] =
    (a: (Long, String), b: (Long, String)) =>
      if (beats(a._1, a._2, b._1, b._2)) -1
      else if (beats(b._1, b._2, a._1, a._2)) 1
      else 0

  private def compact(buf: TopKStrBuf): TopKStrBuf = {
    buf.items.sortInPlace()(ord)
    buf.items.takeInPlace(k)
    buf.cutoffValid = buf.items.length == k
    buf
  }

  override def createAggregationBuffer(): TopKStrBuf = new TopKStrBuf

  override def update(buf: TopKStrBuf, input: InternalRow): TopKStrBuf = {
    val c = cnt.eval(input)
    val v = value.eval(input)
    if (c != null && v != null) {
      val cv = c.asInstanceOf[Long]
      val sv = v.asInstanceOf[UTF8String].toString
      if (!buf.cutoffValid ||
          beats(cv, sv, buf.items.last._1, buf.items.last._2)) {
        buf.items += ((cv, sv))
        buf.cutoffValid = false
        if (buf.items.length >= 2 * k) compact(buf)
      }
    }
    buf
  }

  override def merge(b1: TopKStrBuf, b2: TopKStrBuf): TopKStrBuf = {
    b1.items ++= b2.items
    compact(b1)
  }

  override def eval(buf: TopKStrBuf): Any = {
    compact(buf)
    new GenericArrayData(buf.items.map { case (c, v) =>
      InternalRow(UTF8String.fromString(v), c)
    }.toArray[Any])
  }

  override def serialize(buf: TopKStrBuf): Array[Byte] = {
    compact(buf)
    val strs = buf.items.map(_._2.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bb = java.nio.ByteBuffer.allocate(
      4 + buf.items.length * 12 + strs.map(_.length).sum)
    bb.putInt(buf.items.length)
    buf.items.zip(strs).foreach { case ((c, _), sb) =>
      bb.putLong(c); bb.putInt(sb.length); bb.put(sb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new TopKStrBuf
    var i = 0
    while (i < n) {
      val c = bb.getLong
      val len = bb.getInt
      val sb = new Array[Byte](len)
      bb.get(sb)
      out.items += ((c, new String(sb, java.nio.charset.StandardCharsets.UTF_8)))
      i += 1
    }
    out.cutoffValid = n == k
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKCountedAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKCountedAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TopKCountedAggregate =
    copy(cnt = l, value = r)
}

object TopKCountedAggregate {

  /** Code-point order — identical to the UTF-8 BYTE order Spark's
    * UTF8String and DuckDB's ORDER BY use, which java.lang.String's
    * UTF-16 compareTo is NOT: code points in [U+E000, U+FFFF] compare
    * ABOVE supplementary characters (≥ U+10000, stored as surrogates
    * 0xD800+) under UTF-16 code units, inverting the cross-engine
    * tie-break. Allocation-free walk; unpaired surrogates (invalid
    * text, unrepresentable in UTF-8 anyway) compare by their surrogate
    * value.
    */
  private[functions] def codePointCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** `topk_counted(cnt, value, k)` → best-first
    * `array<struct<value string, cnt bigint>>` under (cnt DESC, value ASC).
    */
  def topKCounted(cnt: Column, value: Column, k: Int): Column =
    ColumnBridge.toColumn(
      TopKCountedAggregate(
        ColumnBridge.toExpression(cnt), ColumnBridge.toExpression(value), k)
        .toAggregateExpression())
}
