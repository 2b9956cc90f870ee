package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Fused DSIR importance scorer: one pass over a document's characters,
  * accumulating the per-bucket model weight of every word unigram and
  * bigram — the scoring half of [[graft.pipeline.Importance]] collapsed
  * into a single map-only expression with the (≤ 4096-entry) bucket
  * model as a reference object, the
  * [[BenchShingleHit]]/[[NearestCells]] pattern.
  *
  * Why it exists: the relational scorer explodes |tokens| feature rows
  * per document and re-aggregates them per doc — fine in batch, but a
  * per-doc AGGREGATE is stateful in Structured Streaming, so the
  * always-on ingest path could not score arriving documents statelessly.
  * This expression is a pure map: it works identically on a stream, and
  * in batch it removes the explode/join/agg entirely (the model lookup
  * is an array index).
  *
  * `dq(f)` must cover every bucket (0 ≤ f < dq.length), with unseen
  * buckets already holding the smoothed default — [[graft.pipeline
  * .Importance.trainModel]] builds exactly that. Output is a struct
  * `(n_feats, sumq)`: the caller derives
  * `imp_score = (sumq / n_feats) / 1e12` so the division parity stays
  * in one place. Hash families match the relational scorer bit for bit:
  * xxhash64(seed 42) == Spark's `xxhash64`, md5 == the lower-60-bit
  * oracle bridge; bucket = pmod(hash, B). Tokenization is the shared
  * [[Tokenize]] contract.
  *
  * The model array rides the closure as a reference object (compared by
  * identity, like [[NearestCells]]) — at 4096 longs it broadcasts with
  * the task binary, not a join.
  */
case class ImportanceScore(child: Expression, dq: Array[Long], md5Family: Boolean)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("sumq", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "importance_score"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"importance_score expects string, got ${child.dataType.catalogString}")

  private def bucketOf(s: String): Int = {
    val b = dq.length.toLong
    val h =
      if (md5Family) MinHashSignatureMd5.md5Base60(s) % b
      else {
        val x = XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L) % b
        if (x < 0) x + b else x
      }
    h.toInt
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val (starts, ends) = Tokenize.boundaries(s)
    val ntok = starts.length
    var n = 0L
    var sum = 0L
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < ntok) {
      sb.setLength(0)
      sb.append(s, starts(i), ends(i))
      sum += dq(bucketOf(sb.toString))
      n += 1
      if (i + 1 < ntok) {
        sb.append(' ').append(s, starts(i + 1), ends(i + 1))
        sum += dq(bucketOf(sb.toString))
        n += 1
      }
      i += 1
    }
    InternalRow(n, sum)
  }

  override protected def withNewChildInternal(c: Expression): ImportanceScore =
    copy(child = c)
}

object ImportanceScore {
  def apply(c: Column, dq: Array[Long], md5Family: Boolean): Column =
    ColumnBridge.toColumn(ImportanceScore(ColumnBridge.toExpression(c), dq, md5Family))
}
