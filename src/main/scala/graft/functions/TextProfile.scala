package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass text profile — every count the text-analysis operators
  * need, from ONE tokenization:
  *
  *   (n_tokens, n_stopwords, sum_token_len, n_punct, n_digit, n_chars,
  *    en, de, es, fr, zh marker hits)
  *
  * The compositional form re-tokenizes per consumer: Catalyst inlines the
  * `split(trim(text))` input into every higher-order lambda (`filter` per
  * stopword set, `aggregate(transform)` for lengths, one `filter` per
  * language), all interpreted — ~6 tokenizations + boxed lambda evals per
  * row. This expression is one char scan; outputs are identical exact
  * integers, so the derived ratios stay bit-identical to the DuckDB oracle
  * (parity asserted in TextAnalysisSpec against the compositional form).
  *
  * Tokenization matches `split(trim(text), "\\s+")` exactly, including the
  * Java-split edges (empty text → one empty token; leading non-space
  * whitespace → leading empty token). Punct class `[.,;:!?'"]`, digit class
  * `[0-9]`, counts in CHARACTERS (code points ≤ BMP chars, same as
  * Spark/DuckDB `length`).
  */
case class TextProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextProfile.schema
  override def nullable: Boolean = true
  override def prettyName: String = "text_profile"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"text_profile expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TextProfile.profile(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.functions.TextProfile.profile($v.toString());"
    })

  override protected def withNewChildInternal(c: Expression): TextProfile =
    copy(child = c)
}

object TextProfile {

  val Langs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  val schema: StructType = StructType(
    (Seq("n_tokens", "n_stopwords", "sum_token_len", "n_punct", "n_digit",
      "n_chars") ++ Langs)
      .map(StructField(_, LongType, nullable = false)))

  private val stop = new java.util.HashSet[String](java.util.Arrays.asList(
    "the", "a", "an", "of", "and", "to", "in", "is", "on", "for", "with"))

  // language marker sets, index-aligned with Langs
  private val markers: Array[java.util.HashSet[String]] = Array(
    new java.util.HashSet(java.util.Arrays.asList("der", "die", "das", "und", "ist")),
    new java.util.HashSet(java.util.Arrays.asList("the", "a", "of", "and", "is")),
    new java.util.HashSet(java.util.Arrays.asList("el", "la", "de", "y", "es")),
    new java.util.HashSet(java.util.Arrays.asList("le", "la", "de", "et", "est")),
    new java.util.HashSet(java.util.Arrays.asList("的", "是", "了", "在", "我")))

  private def isPunct(c: Char): Boolean =
    c == '.' || c == ',' || c == ';' || c == ':' || c == '!' || c == '?' ||
      c == '\'' || c == '"'

  def profile(text: String): InternalRow = {
    // char-class counts over the RAW text (ratios use full length)
    var nPunct = 0L
    var nDigit = 0L
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (isPunct(c)) nPunct += 1
      else if (c >= '0' && c <= '9') nDigit += 1
      i += 1
    }

    // trim spaces (0x20) like Spark's trim(), then Java regex split
    var lo = 0
    var hi = text.length
    while (lo < hi && text.charAt(lo) == ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
    val trimmed = text.substring(lo, hi)
    // limit -1: Spark's split KEEPS trailing empty tokens (Java's
    // String.split default drops them) — e.g. "a\t" → ["a", ""]
    val toks: Array[String] =
      if (trimmed.isEmpty) Array("") else trimmed.split("\\s+", -1)

    var nStop = 0L
    var sumLen = 0L
    val hits = new Array[Long](markers.length)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      // code points, not UTF-16 units — Spark's length() counts chars
      sumLen += tok.codePointCount(0, tok.length)
      if (stop.contains(tok)) nStop += 1
      var l = 0
      while (l < markers.length) {
        if (markers(l).contains(tok)) hits(l) += 1
        l += 1
      }
      t += 1
    }

    new GenericInternalRow(
      Array[Any](toks.length.toLong, nStop, sumLen, nPunct, nDigit,
        text.codePointCount(0, text.length).toLong) ++ hits)
  }

  def apply(text: Column): Column =
    ColumnBridge.toColumn(TextProfile(ColumnBridge.toExpression(text)))
}
