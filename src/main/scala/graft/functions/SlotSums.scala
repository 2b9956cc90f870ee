package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Element-wise sums of a fixed-width slot array in ONE aggregate buffer —
  * the r19 replacement for the tier serve fold's per-slot aggregate fan-out
  * (`sum(element_at(grid, i+1))` × 19 slots × 2 grids = 38 separate
  * Decimal(38,6)/Long sum buffers per group; see `Rollup
  * .aggregatedFromTier`). Exactness is unchanged — integer arithmetic on
  * the decimals' unscaled values (long fast path, BigInteger promotion on
  * overflow) IS the exact decimal sum — and the per-slot NULL semantics
  * match `sum(...)`: a slot with no non-null input stays NULL.
  *
  * Two variants share the buffer/serialization machinery:
  *   - [[DecimalSlotSums]]: array<decimal(p,s)> → array<decimal(p,s)>,
  *     exact unscaled-integer sums.
  *   - [[LongSlotSums]]: array<long> → array<long>, java wrap-around adds
  *     (bit-identical to Spark's non-ANSI `sum(long)`).
  *
  * Rows whose array is NULL contribute nothing (matching
  * `element_at(null, i)` → null → skipped by sum). Input arrays shorter
  * than `slots` contribute nothing at the missing positions (element_at
  * beyond length is null under non-ANSI semantics — the tier never
  * produces these, but the behaviours must agree).
  */
abstract class SlotSumsBase extends TypedImperativeAggregate[SlotSumsBase.Buf] {
  import SlotSumsBase._

  def slots: Int
  def child: Expression

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def createAggregationBuffer(): Buf = new Buf(slots)

  override def update(buf: Buf, input: org.apache.spark.sql.catalyst.InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) updateFromArray(buf, v.asInstanceOf[ArrayData])
    buf
  }

  protected def updateFromArray(buf: Buf, arr: ArrayData): Unit

  override def merge(buf: Buf, other: Buf): Buf = {
    var i = 0
    while (i < slots) {
      if (other.seen(i)) {
        if (!buf.seen(i)) {
          buf.seen(i) = true
          buf.longs(i) = other.longs(i)
          buf.bigs(i) = other.bigs(i)
        } else addInto(buf, i, other.longs(i), other.bigs(i))
      }
      i += 1
    }
    buf
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(slots)
    var i = 0
    while (i < slots) {
      if (!buf.seen(i)) out.writeByte(0)
      else if (buf.bigs(i) == null) { out.writeByte(1); out.writeLong(buf.longs(i)) }
      else {
        val b = buf.bigs(i).toByteArray
        out.writeByte(2); out.writeInt(b.length); out.write(b)
      }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf(n)
    var i = 0
    while (i < n) {
      in.readByte() match {
        case 0 => ()
        case 1 => buf.seen(i) = true; buf.longs(i) = in.readLong()
        case 2 =>
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          buf.seen(i) = true; buf.bigs(i) = new BigInteger(b)
      }
      i += 1
    }
    buf
  }
}

object SlotSumsBase {
  /** Per-slot running sums: compact long until overflow, then BigInteger.
    * `bigs(i) != null` means the slot promoted.
    */
  final class Buf(n: Int) {
    val seen = new Array[Boolean](n)
    val longs = new Array[Long](n)
    val bigs = new Array[BigInteger](n)
  }

  /** buf(i) += (l | big), promoting on long overflow. */
  def addInto(buf: Buf, i: Int, l: Long, big: BigInteger): Unit = {
    if (big == null && buf.bigs(i) == null) {
      val sum = buf.longs(i) + l
      // overflow check (Math.addExact without the throw)
      if (((buf.longs(i) ^ sum) & (l ^ sum)) < 0)
        buf.bigs(i) = BigInteger.valueOf(buf.longs(i)).add(BigInteger.valueOf(l))
      else buf.longs(i) = sum
    } else {
      val a = if (buf.bigs(i) != null) buf.bigs(i) else BigInteger.valueOf(buf.longs(i))
      val b = if (big != null) big else BigInteger.valueOf(l)
      buf.bigs(i) = a.add(b)
    }
  }
}

/** Exact element-wise decimal sums; see [[SlotSumsBase]]. */
case class DecimalSlotSums(
    child: Expression,
    slots: Int,
    precision: Int,
    scale: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SlotSumsBase {
  import SlotSumsBase._

  override def dataType: DataType =
    ArrayType(DecimalType(precision, scale), containsNull = true)
  override def prettyName: String = "decimal_slot_sums"

  override protected def updateFromArray(buf: Buf, arr: ArrayData): Unit = {
    val n = math.min(slots, arr.numElements())
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = arr.getDecimal(i, precision, scale)
        // exact: sum of unscaled integers at the shared scale
        val jbd = d.toJavaBigDecimal
        val unscaled = jbd.unscaledValue()
        if (!buf.seen(i)) {
          buf.seen(i) = true
          if (unscaled.bitLength() < 63) { buf.longs(i) = unscaled.longValueExact(); buf.bigs(i) = null }
          else { buf.bigs(i) = unscaled }
        } else {
          if (unscaled.bitLength() < 63) addInto(buf, i, unscaled.longValueExact(), null)
          else addInto(buf, i, 0L, unscaled)
        }
      }
      i += 1
    }
  }

  override def eval(buf: SlotSumsBase.Buf): Any = {
    val out = new Array[Any](slots)
    var i = 0
    while (i < slots) {
      if (buf.seen(i)) {
        val big =
          if (buf.bigs(i) != null) new java.math.BigDecimal(buf.bigs(i), scale)
          else java.math.BigDecimal.valueOf(buf.longs(i), scale)
        out(i) = org.apache.spark.sql.types.Decimal(big, precision, scale)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def withNewMutableAggBufferOffset(o: Int): DecimalSlotSums =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DecimalSlotSums =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): DecimalSlotSums = copy(child = c.head)
}

object DecimalSlotSums {
  def apply(c: Column, slots: Int, precision: Int, scale: Int): Column =
    ColumnBridge.toColumn(
      DecimalSlotSums(ColumnBridge.toExpression(c), slots, precision, scale)
        .toAggregateExpression())
}

/** Element-wise long sums (java wrap semantics, like non-ANSI sum(long));
  * see [[SlotSumsBase]].
  */
case class LongSlotSums(
    child: Expression,
    slots: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SlotSumsBase {
  import SlotSumsBase._

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "long_slot_sums"

  override protected def updateFromArray(buf: Buf, arr: ArrayData): Unit = {
    val n = math.min(slots, arr.numElements())
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getLong(i)
        if (!buf.seen(i)) { buf.seen(i) = true; buf.longs(i) = v }
        else buf.longs(i) = buf.longs(i) + v // wrap like sum(long), ansi off
      }
      i += 1
    }
  }

  // the base merge promotes to BigInteger on overflow — the DECIMAL
  // contract. sum(long) under non-ANSI semantics WRAPS, so the long
  // variant must wrap in merge too or partial/final results diverge
  // from the per-slot sums it replaces.
  override def merge(buf: SlotSumsBase.Buf, other: SlotSumsBase.Buf): SlotSumsBase.Buf = {
    var i = 0
    while (i < slots) {
      if (other.seen(i)) {
        if (!buf.seen(i)) { buf.seen(i) = true; buf.longs(i) = other.longs(i) }
        else buf.longs(i) = buf.longs(i) + other.longs(i)
      }
      i += 1
    }
    buf
  }

  override def eval(buf: SlotSumsBase.Buf): Any = {
    val out = new Array[Any](slots)
    var i = 0
    while (i < slots) {
      if (buf.seen(i)) out(i) = buf.longs(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def withNewMutableAggBufferOffset(o: Int): LongSlotSums =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LongSlotSums =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): LongSlotSums = copy(child = c.head)
}

object LongSlotSums {
  def apply(c: Column, slots: Int): Column =
    ColumnBridge.toColumn(
      LongSlotSums(ColumnBridge.toExpression(c), slots).toAggregateExpression())
}
