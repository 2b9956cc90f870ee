package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Single-pass native `most` (mode) aggregate — the reference's custom
  * Postgres aggregate (/root/reference/libnntsc/database.py:405-451):
  * most frequent non-null value. Deterministic tie-break: higher count,
  * then smaller value (the reference's ORDER BY count DESC LIMIT 1 leaves
  * ties to the planner; we pin them).
  *
  * Buffer = value→count map, merged across partials (map-side combine), so
  * memory is bounded by per-group DISTINCT cardinality, not row count.
  * Supported input types: integral, fractional, string, boolean.
  */
case class MostAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
  with UnaryLike[Expression] {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "most"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: org.apache.spark.sql.GraftShim.IntegralType |
          _: org.apache.spark.sql.GraftShim.FractionalType |
          StringType | BooleanType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"most does not support input type ${other.catalogString}")
    }

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] = mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Any, Long], input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String evals point into reused row buffers — copy before keeping
      val key = ModeCodec.copyKey(v)
      buf.update(key, buf.getOrElse(key, 0L) + 1L)
    }
    buf
  }

  override def merge(b1: mutable.HashMap[Any, Long], b2: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    b2.foreach { case (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    b1
  }

  @transient private lazy val ordering = TypeUtils.getInterpretedOrdering(child.dataType)

  override def eval(buf: mutable.HashMap[Any, Long]): Any =
    if (buf.isEmpty) null
    else
      buf.reduceLeft { (a, b) =>
        if (b._2 > a._2 || (b._2 == a._2 && ordering.lt(b._1, a._1))) b else a
      }._1

  // compact codec keyed by the child type (catalyst values are not
  // java-serializable in general) — shared with ModeMapAggregate
  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] =
    ModeCodec.serialize(buf, child.dataType)

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] =
    ModeCodec.deserialize(bytes, child.dataType)

  override def withNewMutableAggBufferOffset(o: Int): MostAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MostAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MostAggregate =
    copy(child = c)
}

object MostAggregate {
  /** Column API: `most_agg(col)`. */
  def most(c: Column): Column =
    ColumnBridge.toColumn(
      MostAggregate(ColumnBridge.toExpression(c)).toAggregateExpression())
}
