package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL parsing + canonicalization — the FIRST pass of a web-corpus
  * pipeline (URL-level dedup precedes content dedup in C4/CCNet-style
  * stacks, and the registered domain feeds the per-domain cap).
  *
  * The parse grammar is a fixed anchored regex — deliberately small so the
  * gate's DuckDB oracle replays it verbatim with `regexp_extract`:
  *
  *   ^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$
  *
  * (scheme, authority, path, ?query, #fragment). Non-matching input →
  * null struct. Authority splits on the LAST ':' iff a non-empty all-digit
  * suffix follows (the backtracking the oracle's `^(.*?):(\d+)$` does).
  * Scope, stated: no userinfo (`@` is not special), no IPv6 bracket
  * authority, no %-decoding or dot-segment removal — the path is kept
  * verbatim.
  *
  * Canonical form (`url_norm`):
  *   - scheme and host lowercased (ASCII);
  *   - default ports dropped (http:80, https:443), others kept;
  *   - empty path → "/";
  *   - query params: empties dropped, tracking params dropped (key
  *     starting `utm_`, or in {gclid, fbclid, ref, msclkid}), the rest
  *     SORTED byte-wise and rejoined — param order no longer defeats
  *     URL-level dedup;
  *   - fragment dropped.
  *
  * `reg_domain` is a public-suffix-LITE heuristic (documented contract,
  * not the full PSL, which is a versioned external list): last two labels,
  * or last three when the TLD is 2 chars and the second-level label is in
  * {co, com, net, org, ac, gov, edu} — example.co.uk stays whole.
  *
  * Scale shape: one fused map-only expression — URL dedup at 100 TB is
  * then a hash-shuffle of the (short) canonical string or a groupBy on
  * reg_domain, never a corpus-text shuffle.
  */
case class UrlParts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = UrlParts.schema
  override def nullable: Boolean = true
  override def prettyName: String = "url_parts"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"url_parts expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    UrlParts.parse(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.UrlParts.parse($v.toString());
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): UrlParts =
    copy(child = c)
}

object UrlParts {

  /** UTF-8 byte-order comparator (unsigned), the cross-engine sort
    * contract for query params — identical to DuckDB's list_sort on
    * VARCHAR. Equals Java natural order on BMP-only strings; differs
    * exactly where surrogate pairs meet chars in U+E000..U+FFFF.
    */
  private[functions] val utf8ByteOrder: java.util.Comparator[String] =
    (a: String, b: String) => {
      val ba = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(ba.length, bb.length)
      var r = 0
      while (r == 0 && i < n) {
        r = (ba(i) & 0xff) - (bb(i) & 0xff)
        i += 1
      }
      if (r != 0) r else ba.length - bb.length
    }

  val schema: StructType = StructType(Seq(
    StructField("scheme", StringType, nullable = false),
    StructField("host", StringType, nullable = false),
    StructField("port", LongType, nullable = true),
    StructField("path", StringType, nullable = false),
    StructField("query", StringType, nullable = true),
    StructField("reg_domain", StringType, nullable = false),
    StructField("n_params", LongType, nullable = false),
    StructField("url_norm", StringType, nullable = false)))

  private val urlRe = java.util.regex.Pattern.compile(
    "^([A-Za-z][A-Za-z0-9+.\\-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?$")

  private val trackingKeys = new java.util.HashSet[String](
    java.util.Arrays.asList("gclid", "fbclid", "ref", "msclkid"))

  private val secondLevel = new java.util.HashSet[String](
    java.util.Arrays.asList("co", "com", "net", "org", "ac", "gov", "edu"))

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val key = if (eq < 0) param else param.substring(0, eq)
    key.startsWith("utm_") || trackingKeys.contains(key)
  }

  /** null for non-matching input (the gate's malformed rows). */
  def parse(url: String): InternalRow = {
    val m = urlRe.matcher(url)
    if (!m.matches()) return null

    val scheme = m.group(1).toLowerCase(java.util.Locale.ROOT)
    val auth = m.group(2)
    val rawPath = m.group(3)
    val rawQuery = m.group(4) // includes '?', or null

    // authority → (host, port): split on the LAST ':' iff a non-empty
    // all-digit suffix follows
    var portIdx = -1
    val colon = auth.lastIndexOf(':')
    // suffix must be 1..18 digits (18 bounds Long.parseLong — a longer
    // digit run is treated as part of the host, matching the oracle's
    // `:([0-9]{1,18})$`)
    if (colon >= 0 && colon < auth.length - 1 && auth.length - colon - 1 <= 18) {
      var i = colon + 1
      var allDigits = true
      while (i < auth.length) {
        val c = auth.charAt(i)
        if (c < '0' || c > '9') allDigits = false
        i += 1
      }
      if (allDigits) portIdx = colon
    }
    val host = (if (portIdx >= 0) auth.substring(0, portIdx) else auth)
      .toLowerCase(java.util.Locale.ROOT)
    val port: java.lang.Long =
      if (portIdx >= 0) java.lang.Long.valueOf(auth.substring(portIdx + 1))
      else null

    // registered domain (public-suffix-lite; see scaladoc)
    val labels = host.split("\\.", -1)
    val n = labels.length
    val regDomain =
      if (n >= 3 && labels(n - 1).length == 2 && secondLevel.contains(labels(n - 2)))
        s"${labels(n - 3)}.${labels(n - 2)}.${labels(n - 1)}"
      else if (n >= 2) s"${labels(n - 2)}.${labels(n - 1)}"
      else host

    // query params: drop empties + tracking, sort byte-wise, rejoin
    val kept: Array[String] =
      if (rawQuery == null) Array.empty
      else rawQuery.substring(1).split("&", -1)
        .filter(p => p.nonEmpty && !isTracking(p))
    // byte-wise UTF-8 order, matching the oracle's list_sort: Java
    // natural String order (UTF-16 code units) diverges for
    // supplementary characters (surrogates sort below U+E000..U+FFFF
    // in UTF-16 but above them in UTF-8 bytes)
    java.util.Arrays.sort(kept, UrlParts.utf8ByteOrder)
    val normQuery = if (kept.isEmpty) null else kept.mkString("&")

    val keepPort = port != null &&
      !((scheme == "http" && port == 80L) || (scheme == "https" && port == 443L))
    val normPath = if (rawPath.isEmpty) "/" else rawPath
    val sb = new java.lang.StringBuilder(url.length)
    sb.append(scheme).append("://").append(host)
    if (keepPort) sb.append(':').append(port.longValue())
    sb.append(normPath)
    if (normQuery != null) sb.append('?').append(normQuery)

    new GenericInternalRow(Array[Any](
      UTF8String.fromString(scheme),
      UTF8String.fromString(host),
      if (port == null) null else port.longValue(),
      UTF8String.fromString(rawPath),
      if (rawQuery == null) null else UTF8String.fromString(rawQuery.substring(1)),
      UTF8String.fromString(regDomain),
      kept.length.toLong,
      UTF8String.fromString(sb.toString)))
  }

  def apply(url: Column): Column =
    ColumnBridge.toColumn(UrlParts(ColumnBridge.toExpression(url)))
}
