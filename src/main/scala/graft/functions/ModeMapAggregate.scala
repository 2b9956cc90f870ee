package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData, TypeUtils}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Shared (value, count) buffer codec for count-map aggregates, keyed by
  * the value's data type (catalyst values are not java-serializable in
  * general — same per-type scheme as MostAggregate's codec).
  */
private[functions] object ModeCodec {

  def supported(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | ShortType | ByteType |
        DoubleType | FloatType | BooleanType => true
    case _ => false
  }

  /** UTF8String evals point into reused row/array buffers — copy before
    * keeping a reference in the aggregation buffer.
    */
  def copyKey(v: Any): Any = v match {
    case s: UTF8String => s.clone()
    case x             => x
  }

  def writeKey(out: java.io.DataOutputStream, dt: DataType, k: Any): Unit = dt match {
    case StringType =>
      val b = k.asInstanceOf[UTF8String].getBytes
      out.writeInt(b.length); out.write(b)
    case LongType    => out.writeLong(k.asInstanceOf[Long])
    case IntegerType => out.writeInt(k.asInstanceOf[Int])
    case ShortType   => out.writeShort(k.asInstanceOf[Short].toInt)
    case ByteType    => out.writeByte(k.asInstanceOf[Byte].toInt)
    case DoubleType  => out.writeDouble(k.asInstanceOf[Double])
    case FloatType   => out.writeFloat(k.asInstanceOf[Float])
    case BooleanType => out.writeBoolean(k.asInstanceOf[Boolean])
    case other => throw new IllegalStateException(s"unsupported: $other")
  }

  def readKey(in: java.io.DataInputStream, dt: DataType): Any = dt match {
    case StringType =>
      val len = in.readInt(); val b = new Array[Byte](len)
      in.readFully(b); UTF8String.fromBytes(b)
    case LongType    => in.readLong()
    case IntegerType => in.readInt()
    case ShortType   => in.readShort()
    case ByteType    => in.readByte()
    case DoubleType  => in.readDouble()
    case FloatType   => in.readFloat()
    case BooleanType => in.readBoolean()
    case other => throw new IllegalStateException(s"unsupported: $other")
  }

  def serialize(buf: mutable.HashMap[Any, Long], keyType: DataType): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) => writeKey(out, keyType, k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte], keyType: DataType): mutable.HashMap[Any, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Any, Long]
    var i = 0
    while (i < n) { buf.update(readKey(in, keyType), in.readLong()); i += 1 }
    buf
  }
}

/** Count-map aggregate for rollup tiers: builds, merges, and resolves the
  * `modes__<col>` per-value count-map partials (Rollup.buildMulti scaladoc;
  * the exact form of the reference's mode-from-rollup, influx.py:492-511)
  * in ONE aggregation pass.
  *
  * Three faces, selected by the flags:
  *   - `mode_map(v)`        (fromMaps=false, pick=false): count non-null
  *     values into `map<K, bigint>` — the tier BUILD partial;
  *   - `mode_map_merge(m)`  (fromMaps=true, pick=false): sum counts across
  *     map partials — the tier FOLD;
  *   - `most_of_maps(m)`    (fromMaps=true, pick=true): merged argmax under
  *     (count DESC, value ASC) — the tier-served `most`, same collation as
  *     QueryEngine.mostByGroup, so tier- and raw-served mode cannot
  *     disagree.
  *
  * Each face rides the enclosing `groupBy(...).agg(...)` alongside the stat
  * partials, replacing the explode → re-group → map_from_entries → join lap
  * that a builtin-only plan needs per mode column (one exchange instead of
  * two, no join). The buffer is a value→count map combined map-side, so per
  * group it is bounded by the column's DISTINCT cardinality — mode columns
  * are low-cardinality by the tier contract (buildMulti scaladoc), which is
  * what keeps these partials (and this buffer) small. An empty group (no
  * non-null values / no maps) yields NULL, matching the join-miss NULL of
  * the plan shape it replaces.
  */
case class ModeMapAggregate(
    child: Expression,
    fromMaps: Boolean,
    pick: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
  with UnaryLike[Expression] {

  private def keyType: DataType =
    if (fromMaps) child.dataType.asInstanceOf[MapType].keyType else child.dataType

  override def dataType: DataType =
    if (pick) keyType else MapType(keyType, LongType, valueContainsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String =
    if (pick) "most_of_maps" else if (fromMaps) "mode_map_merge" else "mode_map"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = child.dataType match {
      case MapType(k, LongType, _) if fromMaps => ModeCodec.supported(k)
      case dt if !fromMaps                     => ModeCodec.supported(dt)
      case _                                   => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName does not support input type ${child.dataType.catalogString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[Any, Long],
      input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      if (fromMaps) {
        val m = v.asInstanceOf[MapData]
        val ks = m.keyArray()
        val vs = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          if (!vs.isNullAt(i)) {
            val key = ModeCodec.copyKey(ks.get(i, keyType))
            buf.update(key, buf.getOrElse(key, 0L) + vs.getLong(i))
          }
          i += 1
        }
      } else {
        val key = ModeCodec.copyKey(v)
        buf.update(key, buf.getOrElse(key, 0L) + 1L)
      }
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[Any, Long],
      b2: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    b2.foreach { case (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    b1
  }

  @transient private lazy val ordering = TypeUtils.getInterpretedOrdering(keyType)

  override def eval(buf: mutable.HashMap[Any, Long]): Any =
    if (buf.isEmpty) null
    else if (pick)
      buf.reduceLeft { (a, b) =>
        if (b._2 > a._2 || (b._2 == a._2 && ordering.lt(b._1, a._1))) b else a
      }._1
    else {
      val entries = buf.toArray
      new ArrayBasedMapData(
        new GenericArrayData(entries.map(_._1)),
        new GenericArrayData(entries.map(_._2)))
    }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] =
    ModeCodec.serialize(buf, keyType)
  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] =
    ModeCodec.deserialize(bytes, keyType)

  override def withNewMutableAggBufferOffset(o: Int): ModeMapAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ModeMapAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ModeMapAggregate =
    copy(child = c)
}

object ModeMapAggregate {
  /** `mode_map(v)`: per-group value→count map (tier build partial). */
  def modeMap(c: Column): Column =
    ColumnBridge.toColumn(
      ModeMapAggregate(ColumnBridge.toExpression(c), fromMaps = false, pick = false)
        .toAggregateExpression())

  /** `mode_map_merge(m)`: sum counts across map partials (tier fold). */
  def mergeMaps(c: Column): Column =
    ColumnBridge.toColumn(
      ModeMapAggregate(ColumnBridge.toExpression(c), fromMaps = true, pick = false)
        .toAggregateExpression())

  /** `most_of_maps(m)`: merged argmax, (count DESC, value ASC). */
  def mostOfMaps(c: Column): Column =
    ColumnBridge.toColumn(
      ModeMapAggregate(ColumnBridge.toExpression(c), fromMaps = true, pick = true)
        .toAggregateExpression())
}
