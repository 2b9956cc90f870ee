package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TRUE iff any word n-gram of the text hashes into the benchmark
  * shingle set — the reference-object form of contamination checking
  * (same pattern as [[NearestCells]]: the set rides the serialized
  * expression to each executor ONCE, instead of a per-row lookup join).
  * This is what makes DECONTAMINATION STATELESS IN STREAMING: no
  * stream-side aggregation, no stream-stream join — one boolean filter
  * expression per arriving document.
  *
  * `sortedHashes` must be sorted ascending (binary search per shingle:
  * O(s log B) per document, allocation-free). Hashing is the shared
  * [[Tokenize]] + xxhash64(seed 42) contract, bit-identical to
  * [[WordNgramHashes]] — so batch (`Dedup.decontaminate`) and stream
  * agree on every document (asserted in StreamingDedupSpec). Documents
  * shorter than n tokens have no shingles and never hit.
  */
case class BenchShingleHit(child: Expression, n: Int, sortedHashes: Array[Long])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bench_shingle_hit"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bench_shingle_hit expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val (starts, ends) = Tokenize.boundaries(s)
    val ntok = starts.length
    if (ntok < n) return false
    val sb = new java.lang.StringBuilder(64)
    var g = 0
    while (g <= ntok - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(s, starts(g + j), ends(g + j))
        j += 1
      }
      val h = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      if (java.util.Arrays.binarySearch(sortedHashes, h) >= 0) return true
      g += 1
    }
    false
  }

  // the hash array is identity-compared by default case-class equality;
  // content equality keeps plan canonicalization/codegen reuse honest
  override def equals(other: Any): Boolean = other match {
    case b: BenchShingleHit =>
      b.child == child && b.n == n &&
        java.util.Arrays.equals(b.sortedHashes, sortedHashes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode + n) + java.util.Arrays.hashCode(sortedHashes)

  override protected def withNewChildInternal(c: Expression): BenchShingleHit =
    copy(child = c)
}

object BenchShingleHit {
  def apply(c: Column, n: Int, sortedHashes: Array[Long]): Column =
    ColumnBridge.toColumn(
      BenchShingleHit(ColumnBridge.toExpression(c), n, sortedHashes))
}
