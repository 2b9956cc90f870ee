package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PiiScanFused
import graft.pipeline.TextAnalysis

/** The fused PII scanners vs `java.util.regex` ITSELF — counts and
  * replacement bytes must agree exactly on adversarial generated inputs,
  * because the fused expression replaces the regexp_count/regexp_replace
  * passes in the gated q_pii_scan path (oracle: DuckDB RE2 over the same
  * patterns; java/RE2 agreement for this pattern subset is the standing
  * piiScan contract).
  */
class PiiScanFusedSpec extends AnyFunSuite {

  private val patterns = Seq(
    PiiScanFused.Email -> TextAnalysis.EmailPattern,
    PiiScanFused.Ipv4 -> TextAnalysis.Ipv4Pattern,
    PiiScanFused.Phone -> TextAnalysis.PhonePattern,
    PiiScanFused.Idnum -> TextAnalysis.IdNumberPattern)
  private val tokens = Map(
    PiiScanFused.Email -> "[EMAIL]", PiiScanFused.Ipv4 -> "[IP]",
    PiiScanFused.Phone -> "[PHONE]", PiiScanFused.Idnum -> "[ID]")

  private def regexCount(s: String, pat: String): Long = {
    val m = java.util.regex.Pattern.compile(pat).matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  private def check(s: String): Unit = {
    patterns.foreach { case (tag, pat) =>
      val want = regexCount(s, pat)
      val got = PiiScanFused.scan(s, tag, null)
      assert(got === want, s"count[$pat] on ${s.take(120).replace("\n", "\\n")}")
      val wantR = java.util.regex.Pattern.compile(pat).matcher(s)
        .replaceAll(java.util.regex.Matcher.quoteReplacement(tokens(tag)))
      val gotR = PiiScanFused.replace(s, tag, tokens(tag))
      assert(gotR === wantR, s"replace[$pat] on ${s.take(120).replace("\n", "\\n")}")
    }
    // the 4-stage sequential redaction — the piiRedact contract
    var want = s
    patterns.foreach { case (tag, pat) =>
      want = java.util.regex.Pattern.compile(pat).matcher(want)
        .replaceAll(java.util.regex.Matcher.quoteReplacement(tokens(tag)))
    }
    var got = s
    patterns.foreach { case (tag, _) =>
      got = PiiScanFused.replace(got, tag, tokens(tag))
    }
    assert(got === want, s"sequential redaction on ${s.take(120)}")
  }

  test("hand-picked structural edges match java.util.regex") {
    Seq(
      "",
      "plain text no pii",
      "a@b.co", "a@b.c", "a@b.co2", "a@b.c2o", "x a@b.c.d.com y",
      "a@b@c.com", "@@x.com@", "a@b..com", "a@.com", "@example.com",
      "u123@example.com ip 10.0.1.2", "a@b-c.d-e.org",
      "dot.end.a@b.co.", "a@b.coM3x@d.ef", "-a@b.cd-", "%+-.@x.yz",
      "1.2.3.4", "1.2.3.4.5", "1.2.3.4.5.6.7.8", "1234.5.6.7",
      "1.2.3.4567", "a1.2.3.4", "1.2.3.4a", ".1.2.3.4.", "10.0.256.999",
      "1..2.3.4", "1.2.3.", "255.255.255.255", "_1.2.3.4", "1.2.3.4_",
      "+1234567", "+123456", "+123456789012345", "+1234567890123456",
      "++1234567", "tel +641234567 x", "+abc", "a+1234567",
      "123456", "12345", "1234567890123456789012", "a123456", "123456a",
      "_123456", ".123456.", "12 3456 123456 1234567",
      "uid 42 mail u42@example.com ip 10.0.42.7 tel +644000042 acct 9000042 xyz",
      "naïve ٣٤٥٦٧٨ café @b.co δ1.2.3.4δ",
      "a@b.co 1.2.3.4 +1234567 123456 together a@b.co")
      .foreach(check)
  }

  test("generated adversarial corpus matches java.util.regex (counts + redaction)") {
    // alphabet dense in structural chars so boundaries, runs, dots and
    // '@'s collide constantly; fixed seed for reproducibility
    val rnd = new scala.util.Random(20260818L)
    // δ/٣/𝟙 are java-\b word chars (Unicode letter / digit / astral
    // digit) while 😀 is not — they stress the code-point boundary logic
    val alphabet = "a b. @ + - _ % 0 1 23 456 . . @ + co om 7890123456 x_ [ ]".split(" ") ++
      Seq(" ", ".", "@", "+", "-", "δ", "٣", "𝟙", "😀")
    (1 to 3000).foreach { _ =>
      val len = 1 + rnd.nextInt(40)
      val s = (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      check(s)
    }
  }

  test("gate-shaped lines match (the synthesized q_pii_scan input)") {
    val rnd = new scala.util.Random(7L)
    (1 to 500).foreach { _ =>
      val sid = rnd.nextInt(2000)
      val eid = rnd.nextInt(1000000)
      val s = s"uid $sid mail u$sid@example.com ip 10.0.${sid % 256}.${eid % 256} " +
        s"tel +64${4000000 + eid % 1000000} acct ${9000000 + eid} props_${rnd.nextInt(99)}"
      check(s)
    }
  }
}
