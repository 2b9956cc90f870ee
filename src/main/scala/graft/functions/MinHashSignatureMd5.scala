package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** md5-family MinHash signature straight from text — the ORACLE-PARITY twin
  * of [[MinHashSignature]] (whose xxhash64 family has no DuckDB
  * equivalent):
  *
  *   base(s)  = lower 60 bits of md5(shingle)          — in DuckDB:
  *              ('0x' || substr(md5(s), 1, 15))::BIGINT
  *   sig[i]   = min over shingles of (base(s) * A_i) mod 2^60
  *              with A_i = (lower-60-md5("plane:i") | 1), odd — in DuckDB:
  *              CAST((base::HUGEINT * A_i) % 2^60 AS BIGINT)
  *
  * The multiply-shift plane family keeps everything inside exact integer
  * arithmetic both engines share: Java's wrapping 64-bit multiply followed
  * by a 60-bit mask equals the 128-bit product mod 2^60 (2^60 divides
  * 2^64), which is what DuckDB's HUGEINT modulo computes. xxhash64 stays
  * the production default (one 8-byte hash per shingle-plane instead of an
  * md5 per shingle); DedupSpec bridges the two families by comparing their
  * LSH pair sets on the test corpus.
  *
  * Tokenization matches `split(trim(text), "\\s+")` /
  * `string_split_regex(trim(text), '\s+')` exactly like
  * [[WordNgramHashes]]; shingles are space-joined word n-grams, NOT
  * deduplicated (min over duplicates is the min — dedup would be wasted
  * work in both engines). Documents with fewer than `n` tokens yield an
  * empty signature; callers filter them (the same no-signature contract as
  * the xxhash64 path).
  */
case class MinHashSignatureMd5(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  require(n >= 1 && numHashes >= 1, "n and numHashes must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature_md5"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_signature_md5 expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    MinHashSignatureMd5.signature(
      input.asInstanceOf[UTF8String].toString, n,
      MinHashSignatureMd5.multipliers(numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mults = ctx.addReferenceObj(
      "minhashMd5Mults", MinHashSignatureMd5.multipliers(numHashes), "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.functions.MinHashSignatureMd5.signature($v.toString(), $n, $mults);"
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignatureMd5 =
    copy(child = c)
}

object MinHashSignatureMd5 {

  private val Mask60 = (1L << 60) - 1

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Lower 60 bits of md5(s) = the first 15 hex chars of the digest —
    * `('0x' || substr(md5(s), 1, 15))::BIGINT` in DuckDB (the SimHash60
    * convention).
    */
  def md5Base60(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    v >>> 4 // 16 hex chars → first 15 (60 bits)
  }

  /** Odd per-plane multipliers, pure functions of the plane index —
    * inlined as literals into the DuckDB oracle.
    */
  def multipliers(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes)(i => md5Base60(s"plane:$i") | 1L)

  def signature(text: String, n: Int, mults: Array[Long]): ArrayData = {
    // the one shared Spark-split tokenizer — identical boundaries to
    // WordNgramHashes by construction (see Tokenize's scaladoc)
    val (starts, ends) = Tokenize.boundaries(text)
    val ntok = starts.length
    if (ntok < n) return new GenericArrayData(Array.empty[Long])

    val k = mults.length
    val out = Array.fill(k)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var g = 0
    while (g <= ntok - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(text, starts(g + j), ends(g + j))
        j += 1
      }
      val base = md5Base60(sb.toString)
      var p = 0
      while (p < k) {
        // Java wrap-multiply then mask-60 == 128-bit product mod 2^60
        val h = (base * mults(p)) & Mask60
        if (h < out(p)) out(p) = h
        p += 1
      }
      g += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, n: Int, numHashes: Int): Column =
    ColumnBridge.toColumn(
      MinHashSignatureMd5(ColumnBridge.toExpression(text), n, numHashes))
}
