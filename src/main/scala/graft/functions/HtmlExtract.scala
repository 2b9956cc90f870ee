package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction — the C4/CCNet-style cheap boilerplate strip
  * that turns crawled markup into trainable prose. Semantics are a FIXED
  * CHAIN of passes, each individually expressible in ANSI SQL, so the
  * gate's DuckDB oracle replays the chain verbatim (regexp_replace +
  * literal replace) and the hash check is exact:
  *
  *   1. drop `<script[^>]*>.*?</script>` blocks (dotall, lazy);
  *   2. drop `<style[^>]*>.*?</style>` blocks;
  *   3. drop `<!--.*?-->` comments;
  *   4. every remaining `<[^>]*>` tag → one space (so `a<br>b` keeps its
  *      word boundary);
  *   5. entity decode as SEQUENTIAL literal replaces, in this order:
  *      `&amp;`→`&`, `&lt;`→`<`, `&gt;`→`>`, `&quot;`→`"`, `&#39;`→`'`,
  *      `&apos;`→`'`, `&nbsp;`→space. Sequential-literal is the defined
  *      semantics: `&amp;lt;` double-unescapes to `<` — the cheap-path
  *      contract, NOT a one-pass HTML5 entity parser;
  *   6. collapse `[ \t\n\r\f]+` runs to one space, trim.
  *
  * Scope, stated: tag names match case-SENSITIVELY lowercase (real-world
  * crawls are lowercased upstream; case-insensitive RE2 vs java.util.regex
  * disagree on Unicode case folding — U+017F ſ folds onto `s` in RE2 only,
  * so `(?i)` would be a cross-engine parity trap, not a robustness win).
  * Unclosed `<script` with no terminator falls through pass 1 and loses
  * only its tag to pass 4 — the regex chain's natural behavior, pinned by
  * spec. Whitespace class is the explicit ASCII set (Java `\s` and RE2
  * `\s` disagree on U+000B).
  *
  * Scale shape: one fused map-only expression (a few compiled-regex passes
  * per document, like the PII scanner) — no exchange, stateless on
  * streams; output feeds the quality/dedup operators directly.
  */
case class HtmlExtract(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "html_extract"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"html_extract expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      HtmlExtract.extract(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.HtmlExtract.extract($v.toString()));""".stripMargin)

  override protected def withNewChildInternal(c: Expression): HtmlExtract =
    copy(child = c)
}

object HtmlExtract {

  import java.util.regex.Pattern

  // DOTALL for the block/comment/tag passes; case-SENSITIVE by contract.
  private val script = Pattern.compile("<script[^>]*>.*?</script>", Pattern.DOTALL)
  private val style = Pattern.compile("<style[^>]*>.*?</style>", Pattern.DOTALL)
  private val comment = Pattern.compile("<!--.*?-->", Pattern.DOTALL)
  private val tag = Pattern.compile("<[^>]*>", Pattern.DOTALL)
  private val ws = Pattern.compile("[ \\t\\n\\r\\f]+")

  // (entity, replacement) in contract order — sequential literal replaces.
  private val entities: Array[(String, String)] = Array(
    "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")

  def extract(html: String): String = {
    var s = html
    s = script.matcher(s).replaceAll("")
    s = style.matcher(s).replaceAll("")
    s = comment.matcher(s).replaceAll("")
    s = tag.matcher(s).replaceAll(" ")
    var i = 0
    while (i < entities.length) {
      // String.replace is the LITERAL replace (no regex, no $-groups)
      s = s.replace(entities(i)._1, entities(i)._2)
      i += 1
    }
    s = ws.matcher(s).replaceAll(" ")
    // after collapse every whitespace is 0x20, so space-trim == full trim
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    if (lo == 0 && hi == s.length) s else s.substring(lo, hi)
  }

  def apply(html: Column): Column =
    ColumnBridge.toColumn(HtmlExtract(ColumnBridge.toExpression(html)))
}
