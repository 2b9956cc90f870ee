package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused 60-bit SimHash fingerprint of a text column — one pass per
  * document, no explode, no shuffle.
  *
  * Replaces the relational form (explode tokens → md5 hex → conv → 60
  * bit-sum buffers in one hash aggregation), which was shuffle-correct but
  * paid a hex-string md5, a substring and a base-16 parse PER TOKEN, plus a
  * full shuffle of (doc, token-hash) pairs. Here the fingerprint is a
  * map-only projection: at 100 TB the only shuffle left in simhashPairs is
  * the quarter-block candidate join.
  *
  * Bit-identical to `conv(substring(md5(tok), 1, 15), 16, 10)`: the first
  * 15 hex chars of an md5 digest are its top 60 bits, read directly from
  * digest bytes (7 full bytes + the high nibble of byte 7). Tokenization
  * matches `explode(split(trim(text), "\\s+"))` exactly, including the
  * Java-split edge cases (empty text → one empty token; leading
  * non-space whitespace → leading empty token). Token→hash pairs are
  * memoized per thread (natural-language vocabulary is tiny relative to
  * token count), cutting md5 calls by ~100×. Parity is asserted against
  * the compositional form in DedupSpec.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash60 expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SimHash60.fingerprint(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.functions.SimHash60.fingerprint($v.toString());"
    })

  override protected def withNewChildInternal(c: Expression): SimHash60 =
    copy(child = c)
}

object SimHash60 {

  // per-thread token→top-60-bits-of-md5 memo; bounded, cleared when full
  private val cache = new ThreadLocal[java.util.HashMap[String, java.lang.Long]] {
    override def initialValue() = new java.util.HashMap[String, java.lang.Long]()
  }
  private val MaxCache = 1 << 17

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue() = java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(token), equal to conv(substring(md5_hex,1,15),16,10). */
  def tokenHash(tok: String): Long = {
    val c = cache.get()
    val hit = c.get(tok)
    if (hit != null) return hit.longValue()
    val d = digests.get()
    d.reset()
    val h = d.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v = (v << 4) | ((h(7) & 0xf0L) >> 4)
    if (c.size() >= MaxCache) c.clear()
    c.put(tok, v)
    v
  }

  /** Majority-vote fingerprint: bit j set iff 2·ones_j > n_tokens — the
    * Σ(±1) > 0 vote of the classic construction.
    */
  def fingerprint(text: String): Long = {
    // trim spaces (0x20) like Spark's trim(), then Java regex split —
    // byte-compatible with the compositional split(trim(text), "\s+")
    var lo = 0
    var hi = text.length
    while (lo < hi && text.charAt(lo) == ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
    val trimmed = text.substring(lo, hi)
    // limit -1: Spark's split KEEPS trailing empty tokens (Java's
    // String.split default drops them) — e.g. "a\t" → ["a", ""]
    val toks: Array[String] =
      if (trimmed.isEmpty) Array("") else trimmed.split("\\s+", -1)

    val ones = new Array[Int](60)
    var n = 0
    var t = 0
    while (t < toks.length) {
      val h = tokenHash(toks(t))
      var j = 0
      while (j < 60) {
        ones(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      n += 1
      t += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) {
      if (2 * ones(j) > n) fp |= (1L << j)
      j += 1
    }
    fp
  }

  def apply(text: Column): Column =
    ColumnBridge.toColumn(SimHash60(ColumnBridge.toExpression(text)))
}
