package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused document fingerprint — md5 of the normalized text in ONE pass,
  * replacing the compositional
  *
  *   md5(regexp_replace(trim(regexp_replace(lower(text), "[.,;:!?'\"]", "")), "\\s+", " "))
  *
  * which runs two full-text regex NFA passes per row and was the single
  * slowest bench line (9.7 s at sf0.1 — 15% of the whole suite). This
  * expression does lowercase → punct-strip → trim → whitespace-collapse with
  * plain char loops and one incremental MD5, bit-identical to the
  * compositional form (asserted in TextAnalysisSpec) and to the DuckDB
  * oracle.
  *
  * Semantics replicated exactly, in the compositional order:
  *  1. `lower` — ASCII fast path A-Z, otherwise `String.toLowerCase`
  *     (Spark's `UTF8String.toLowerCase` slow path does the same call).
  *  2. strip `[.,;:!?'"]`.
  *  3. `trim` — strips 0x20 spaces ONLY from both ends of the stripped
  *     string (so a leading tab survives trim and becomes a leading " "
  *     after collapse — same edge the regex form has).
  *  4. collapse each maximal Java-`\s+` run (`[ \t\n\x0B\f\r]`) to one " ".
  *  5. md5 hex over the UTF-8 bytes.
  *
  * Reference behavior: content fingerprints for dedup follow the normalize-
  * then-hash convention of the smoothed/rollup tables (nntsc aggregates by
  * stable ids, the `libnntsc/parsers` modules normalize before insert).
  */
case class TextFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "text_fingerprint"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"text_fingerprint expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TextFingerprint.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.functions.TextFingerprint.fingerprint($v);"
    })

  override protected def withNewChildInternal(c: Expression): TextFingerprint =
    copy(child = c)
}

object TextFingerprint {

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private val HexDigits = "0123456789abcdef".toCharArray

  private def isPunct(c: Char): Boolean =
    c == '.' || c == ',' || c == ';' || c == ':' || c == '!' || c == '?' ||
      c == '\'' || c == '"'

  // Java regex \s
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def fingerprint(text: UTF8String): UTF8String = {
    val raw = text.toString
    // 1. lower: ASCII in place, else the same String.toLowerCase Spark's
    //    UTF8String slow path calls.
    var ascii = true
    var i = 0
    while (ascii && i < raw.length) { if (raw.charAt(i) >= 0x80) ascii = false; i += 1 }
    val lowered =
      if (ascii) raw // A-Z handled per-char below to avoid an extra copy
      else raw.toLowerCase

    // 2. strip punct (lowercasing never produces punct-class chars)
    val n = lowered.length
    val stripped = new Array[Char](n)
    var m = 0
    i = 0
    while (i < n) {
      var c = lowered.charAt(i)
      if (!isPunct(c)) {
        if (ascii && c >= 'A' && c <= 'Z') c = (c + 32).toChar
        stripped(m) = c
        m += 1
      }
      i += 1
    }

    // 3. trim 0x20 only, on the punct-stripped string
    var lo = 0
    var hi = m
    while (lo < hi && stripped(lo) == ' ') lo += 1
    while (hi > lo && stripped(hi - 1) == ' ') hi -= 1

    // 4. collapse \s+ runs to single ' ', 5. incremental md5 over UTF-8
    val md = md5Local.get()
    md.reset()
    val out = new java.lang.StringBuilder(hi - lo)
    i = lo
    while (i < hi) {
      val c = stripped(i)
      if (isWs(c)) {
        out.append(' ')
        while (i < hi && isWs(stripped(i))) i += 1
      } else {
        out.append(c)
        i += 1
      }
    }
    val bytes = out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val digest = md.digest(bytes)
    val hex = new Array[Byte](32)
    i = 0
    while (i < 16) {
      hex(2 * i) = HexDigits((digest(i) >> 4) & 0xf).toByte
      hex(2 * i + 1) = HexDigits(digest(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(hex)
  }

  def apply(text: Column): Column =
    ColumnBridge.toColumn(TextFingerprint(ColumnBridge.toExpression(text)))
}
