package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused PII scan: the four [[graft.pipeline.TextAnalysis]] PII regexes
  * (email, IPv4, +phone, long digit run) matched by hand-rolled scanners
  * in ONE expression — counts on the raw text plus the 4-stage sequential
  * redaction — replacing 4 `regexp_count` NFA passes + 4 chained
  * `regexp_replace` passes (8 full-text regex walks and 4 intermediate
  * string materializations per row; profiled 2.6 s of q_pii_scan's 2.7 s
  * at sf0.1).
  *
  * The scanners reproduce `java.util.regex` semantics EXACTLY for these
  * specific patterns (leftmost-first, greedy with backtracking,
  * non-overlapping `find()` advance, ASCII `\b`/`\w`):
  *
  *   - email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`: for each
  *     `'@'`, the local part is the maximal local-class run ending just
  *     before it (bounded below by the scan position; empty → no match at
  *     this `'@'`). The domain is the maximal domain-class run after it;
  *     backtracking of the greedy `[A-Za-z0-9.-]+` selects the LARGEST
  *     in-run dot index with ≥ 2 alphas following, and the match ends at
  *     the end of that alpha run. A failed `'@'` can never succeed from a
  *     later start inside the same local run (same domain), so the scan
  *     resumes at the next `'@'`.
  *   - IPv4 `\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b`: a match can only start
  *     at a digit-run start with a word boundary, each of the first three
  *     octets must be a maximal digit run of length 1–3 followed by `'.'`
  *     (a shorter prefix is always followed by a digit, so backtracking
  *     inside a run can never produce the required dot), and the last
  *     octet must be a maximal run of length 1–3 followed by a non-word
  *     char or end. On failure the next possible start is the next digit
  *     run (interior positions have no boundary).
  *   - phone `\+[0-9]{7,15}`: `'+'` followed by ≥ 7 digits; the match
  *     takes min(run, 15) digits, and the remainder of the run cannot
  *     rematch without a `'+'`.
  *   - idnum `\b[0-9]{6,}\b`: a maximal digit run of length ≥ 6 with
  *     non-word (or edge) chars on both sides — `\b` can never hold
  *     inside a run, and greedy shortening always lands on a digit.
  *
  * PiiScanFusedSpec pins every scanner against `java.util.regex` itself
  * on adversarial generated corpora (counts AND redaction bytes), and the
  * q_pii_scan oracle gate pins the end-to-end result against DuckDB's
  * RE2. Output struct: (n_emails, n_ipv4, n_phones, n_idnums, redacted).
  */
case class PiiScanFused(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_ipv4", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("n_idnums", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "pii_scan"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pii_scan expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    import PiiScanFused._
    val ne = scan(s, Email, null)
    val ni = scan(s, Ipv4, null)
    val np = scan(s, Phone, null)
    val nd = scan(s, Idnum, null)
    var red = replace(s, Email, "[EMAIL]")
    red = replace(red, Ipv4, "[IP]")
    red = replace(red, Phone, "[PHONE]")
    red = replace(red, Idnum, "[ID]")
    InternalRow(ne, ni, np, nd, UTF8String.fromString(red))
  }

  override protected def withNewChildInternal(c: Expression): PiiScanFused =
    copy(child = c)
}

object PiiScanFused {
  def apply(c: Column): Column =
    ColumnBridge.toColumn(PiiScanFused(ColumnBridge.toExpression(c)))

  // pattern tags
  private[graft] final val Email = 0
  private[graft] final val Ipv4 = 1
  private[graft] final val Phone = 2
  private[graft] final val Idnum = 3

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  // java.util.regex quirk mirrored exactly: `\b`'s word test is NOT the
  // ASCII `\w` class — OpenJDK's Bound matcher uses code-point
  // `Character.isLetterOrDigit(cp) || cp == '_'` (Unicode letters AND
  // digits count, surrogate pairs resolved via codePointBefore/At), even
  // without UNICODE_CHARACTER_CLASS. So "δ1.2.3.4δ" has NO boundary
  // before the '1' in java (δ is a letter), and the fused scanner must
  // agree — PiiScanFusedSpec pins this input.
  @inline private def boundaryBefore(s: String, i: Int): Boolean =
    i == 0 || {
      val cp = Character.codePointBefore(s, i)
      !(cp == '_' || Character.isLetterOrDigit(cp))
    }
  @inline private def boundaryAfter(s: String, i: Int): Boolean =
    i >= s.length || {
      val cp = Character.codePointAt(s, i)
      !(cp == '_' || Character.isLetterOrDigit(cp))
    }
  @inline private def isLocal(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '_' || c == '%' || c == '+' || c == '-'
  @inline private def isDomain(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '-'

  /** Count matches of `pat` in `s`; when `spans != null` also record
    * (start, end) pairs. Non-overlapping, left to right — `find()`.
    */
  private[graft] def scan(
      s: String, pat: Int, spans: java.util.ArrayList[Int]): Long = {
    val n = s.length
    var count = 0L
    var pos = 0
    pat match {
      case Email =>
        var at = s.indexOf('@', if (pos > 0) pos else 0)
        while (at >= 0) {
          // maximal local-class run ending at at-1, bounded below by pos
          var rs = at
          while (rs > pos && isLocal(s.charAt(rs - 1))) rs -= 1
          var matched = false
          if (rs < at) {
            // maximal domain-class run after '@'
            var de = at + 1
            while (de < n && isDomain(s.charAt(de))) de += 1
            if (de > at + 1) {
              // largest dot index d in (at+1, de) with >= 1 M char before
              // it and >= 2 alphas after — the greedy backtrack winner
              var d = de - 1
              var end = -1
              while (d >= at + 2 && end < 0) {
                if (s.charAt(d) == '.' && d + 2 < n &&
                  isAlpha(s.charAt(d + 1)) && isAlpha(s.charAt(d + 2))) {
                  var e = d + 3
                  while (e < n && isAlpha(s.charAt(e))) e += 1
                  end = e
                } else d -= 1
              }
              if (end >= 0) {
                count += 1
                if (spans != null) { spans.add(rs); spans.add(end) }
                pos = end
                matched = true
              }
            }
          }
          at = s.indexOf('@', if (matched) pos else at + 1)
        }
      case Ipv4 =>
        var i = 0
        while (i < n) {
          if (isDigit(s.charAt(i)) && boundaryBefore(s, i)) {
            // attempt the 4-octet chain from this run start
            var cur = i
            var ok = true
            var k = 0
            while (k < 3 && ok) {
              var e = cur
              while (e < n && isDigit(s.charAt(e))) e += 1
              if (e - cur >= 1 && e - cur <= 3 && e < n && s.charAt(e) == '.') cur = e + 1
              else ok = false
              k += 1
            }
            if (ok) {
              var e = cur
              while (e < n && isDigit(s.charAt(e))) e += 1
              if (e - cur >= 1 && e - cur <= 3 && boundaryAfter(s, e)) {
                count += 1
                if (spans != null) { spans.add(i); spans.add(e) }
                i = e
              } else ok = false
            }
            if (!ok) {
              // skip this digit run; interior starts have no boundary
              var e = i
              while (e < n && isDigit(s.charAt(e))) e += 1
              i = e
            }
          } else i += 1
        }
      case Phone =>
        var i = 0
        while (i < n) {
          if (s.charAt(i) == '+') {
            var e = i + 1
            val cap = math.min(n, i + 16) // at most 15 digits consumed
            while (e < cap && isDigit(s.charAt(e))) e += 1
            if (e - i - 1 >= 7) {
              count += 1
              if (spans != null) { spans.add(i); spans.add(e) }
              // skip the rest of the digit run — unmatchable without '+'
              while (e < n && isDigit(s.charAt(e))) e += 1
              i = e
            } else i += 1
          } else i += 1
        }
      case Idnum =>
        var i = 0
        while (i < n) {
          if (isDigit(s.charAt(i))) {
            var e = i
            while (e < n && isDigit(s.charAt(e))) e += 1
            if (e - i >= 6 && boundaryBefore(s, i) && boundaryAfter(s, e)) {
              count += 1
              if (spans != null) { spans.add(i); spans.add(e) }
            }
            i = e
          } else i += 1
        }
    }
    count
  }

  /** replaceAll(`pat` → `token`) via one scan. */
  private[graft] def replace(s: String, pat: Int, token: String): String = {
    val spans = new java.util.ArrayList[Int]()
    if (scan(s, pat, spans) == 0L) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    var i = 0
    while (i < spans.size) {
      sb.append(s, last, spans.get(i)).append(token)
      last = spans.get(i + 1)
      i += 2
    }
    sb.append(s, last, s.length)
    sb.toString
  }
}
