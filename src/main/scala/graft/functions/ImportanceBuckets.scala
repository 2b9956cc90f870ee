package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused DSIR feature bucketing: the per-gram bucket ids of a document's
  * word unigrams ∪ bigrams (duplicates kept, unigrams first — the same
  * multiset `explode(concat(WordNgrams(text,1), WordNgrams(text,2)))`
  * feeds through `pmod(hash(g), B)`), computed in ONE pass over the
  * text with the digest applied to the gram bytes directly.
  *
  * Why it exists (r19 optimization round): the relational bucketing the
  * training side of [[graft.pipeline.Importance]] shipped —
  * `pmod(conv(substring(md5(g),1,15),16,10).cast(long), B)` — pays, per
  * gram, a hex-string materialization of the md5 digest, a substring, a
  * base-16 string parse, and an exploded UTF8String gram row. Profiled at
  * sf0.1 the hash+bucket projection alone cost 0.64 s vs 0.23 s for the
  * bare gram explode (ProfOpt `importance`), and the corpus pays it TWICE
  * (model-count pass + score join pass). This expression hashes the gram
  * bytes straight out of a reused StringBuilder ([[MinHashSignatureMd5
  * .md5Base60]] — the first 15 hex chars ARE the first 60 digest bits)
  * and explodes compact longs instead of strings.
  *
  * Hash families match the relational form bit for bit (md5 == the
  * lower-60-bit oracle bridge; xxhash64 seed 42 == Spark's `xxhash64`),
  * and `pmod` == `% B` here because both hashes are already masked
  * non-negative (md5Base60 is 60-bit; xxhash64 is sign-corrected below).
  * Parity with the relational form is pinned in ImportanceSpec.
  */
case class ImportanceBuckets(child: Expression, buckets: Int, md5Family: Boolean)
  extends UnaryExpression with CodegenFallback {

  require(buckets > 0, s"ImportanceBuckets needs a bounded bucket space, got $buckets")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "importance_buckets"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"importance_buckets expects string, got ${child.dataType.catalogString}")

  private def bucketOf(s: String): Long = {
    val b = buckets.toLong
    if (md5Family) MinHashSignatureMd5.md5Base60(s) % b
    else {
      val x = XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L) % b
      if (x < 0) x + b else x
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val (starts, ends) = Tokenize.boundaries(s)
    val ntok = starts.length
    val nGrams = ntok + math.max(ntok - 1, 0)
    val out = new Array[Long](nGrams)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < ntok) { // unigrams first — WordNgrams(text, 1) order
      sb.setLength(0)
      sb.append(s, starts(i), ends(i))
      out(i) = bucketOf(sb.toString)
      i += 1
    }
    i = 0
    while (i + 1 < ntok) { // then bigrams — WordNgrams(text, 2) order
      sb.setLength(0)
      sb.append(s, starts(i), ends(i)).append(' ').append(s, starts(i + 1), ends(i + 1))
      out(ntok + i) = bucketOf(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): ImportanceBuckets =
    copy(child = c)
}

object ImportanceBuckets {
  def apply(c: Column, buckets: Int, md5Family: Boolean): Column =
    ColumnBridge.toColumn(
      ImportanceBuckets(ColumnBridge.toExpression(c), buckets, md5Family))
}
