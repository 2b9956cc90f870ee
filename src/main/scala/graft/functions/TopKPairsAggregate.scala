package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: at most 2k staged pairs, compacted (sorted
  * best-first, trimmed to k) whenever it fills. `cutoffValid` is true only
  * when `items` is known sorted with exactly k entries, so `items.last` is
  * the true kth-best and worse candidates can be skipped without appending —
  * an UNSORTED length-k buffer must never be used as a cutoff (its last
  * element is just the most recent insert, and skipping against it drops
  * true top-k members).
  */
private[functions] final class TopKBuf {
  val items: ArrayBuffer[(Double, Long)] = ArrayBuffer.empty
  var cutoffValid: Boolean = false
}

/** Bounded per-group top-k aggregate: keeps the k best `(score, id)` pairs
  * under the total order (score DESC, id ASC) and returns them best-first as
  * `array<struct<id bigint, score double>>`.
  *
  * This is the per-GROUP twin of `TakeOrderedAndProject` (global ORDER BY +
  * LIMIT): a hash aggregate whose buffer never exceeds 2k entries, so the
  * map side combines each partition down to ≤ k pairs per group BEFORE the
  * shuffle, and the exchange carries O(groups × k × partitions) rows instead
  * of the full scored set. The alternative — `row_number() OVER (PARTITION
  * BY group)` then `rank <= k` — funnels every group's complete score set
  * through one task-sized sort (|corpus| rows per query for exact top-k
  * search), which is the scale ceiling this aggregate removes.
  *
  * Score ordering matches Spark's SQL sort for doubles: NaN sorts as the
  * LARGEST value and -0.0 is normalized to 0.0 (the same contract a
  * `desc("score")` window rank applies), so replacing a window rank with
  * this aggregate is result-identical. NULL scores and NULL ids are ignored
  * (SQL aggregate convention); a group with no valid input yields an empty
  * array. The (score DESC, id ASC) order is total, so results are
  * deterministic and engine-reproducible — callers round scores FIRST if
  * they want cross-engine tie-break parity (the `bruteForceTopK`
  * convention: rank on rounded sim).
  */
case class TopKPairsAggregate(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf]
  with ImplicitCastInputTypes
  with BinaryLike[Expression] {

  require(k > 0, s"topk_pairs: k must be positive, got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def inputTypes: Seq[org.apache.spark.sql.GraftShim.AbstractDataType] =
    Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  // (score DESC, id ASC): true when a beats b. Double.compare gives the
  // SQL sort semantics (NaN largest); -0.0 is normalized at insert.
  @inline private def beats(as: Double, ai: Long, bs: Double, bi: Long): Boolean = {
    val c = java.lang.Double.compare(as, bs)
    c > 0 || (c == 0 && ai < bi)
  }

  private val ord: Ordering[(Double, Long)] =
    (a: (Double, Long), b: (Double, Long)) =>
      if (beats(a._1, a._2, b._1, b._2)) -1
      else if (beats(b._1, b._2, a._1, a._2)) 1
      else 0

  /** Sort best-first, trim to k, and mark the cutoff valid when the buffer
    * holds a full k. Called every ~k appends once the buffer passes 2k, so
    * the amortized cost per row is O(log k) and the buffer is hard-bounded
    * at 2k entries regardless of group size.
    */
  private def compact(buf: TopKBuf): TopKBuf = {
    buf.items.sortInPlace()(ord)
    buf.items.takeInPlace(k)
    buf.cutoffValid = buf.items.length == k
    buf
  }

  override def createAggregationBuffer(): TopKBuf = new TopKBuf

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val raw = s.asInstanceOf[Double]
      val sv = if (raw == 0.0) 0.0 else raw // normalize -0.0, keep NaN
      val iv = i.asInstanceOf[Long]
      // with a VALID cutoff (sorted, exactly k entries), skip candidates
      // that cannot enter the top k instead of staging them
      if (!buf.cutoffValid ||
          beats(sv, iv, buf.items.last._1, buf.items.last._2)) {
        buf.items += ((sv, iv))
        buf.cutoffValid = false
        if (buf.items.length >= 2 * k) compact(buf)
      }
    }
    buf
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    b1.items ++= b2.items
    compact(b1)
  }

  override def eval(buf: TopKBuf): Any = {
    compact(buf)
    new GenericArrayData(buf.items.map { case (s, i) =>
      InternalRow(i, s)
    }.toArray[Any])
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    compact(buf) // never ship more than k pairs per group per partition
    val bb = java.nio.ByteBuffer.allocate(4 + buf.items.length * 16)
    bb.putInt(buf.items.length)
    buf.items.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new TopKBuf
    var i = 0
    while (i < n) { out.items += ((bb.getDouble, bb.getLong)); i += 1 }
    // serialized buffers are always compacted: sorted, and a full k means
    // the last entry is a true cutoff
    out.cutoffValid = n == k
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairsAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairsAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TopKPairsAggregate =
    copy(score = l, id = r)
}

object TopKPairsAggregate {
  /** Column API: `topk_pairs(score, id, k)` → best-first
    * `array<struct<id, score>>` under (score DESC, id ASC).
    */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.toColumn(
      TopKPairsAggregate(
        ColumnBridge.toExpression(score),
        ColumnBridge.toExpression(id),
        k).toAggregateExpression())
}
