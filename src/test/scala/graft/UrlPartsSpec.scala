package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.UrlParts

class UrlPartsSpec extends SparkSpec {
  import spark.implicits._

  private def one(url: String): Row =
    Seq(Tuple1(url)).toDF("u").select(UrlParts(col("u")).as("p"))
      .select("p.*").head()

  private def norm(url: String): String = one(url).getString(7)

  test("parse fields: scheme, host, port, path, query, reg_domain") {
    val r = one("HTTP://WWW.Example.COM:8080/a/b?x=1&y=2#frag")
    assert(r.getString(0) == "http")
    assert(r.getString(1) == "www.example.com")
    assert(r.getLong(2) == 8080L)
    assert(r.getString(3) == "/a/b")
    assert(r.getString(4) == "x=1&y=2")
    assert(r.getString(5) == "example.com")
    assert(r.getLong(6) == 2L)
    assert(r.getString(7) == "http://www.example.com:8080/a/b?x=1&y=2")
  }

  test("canonicalization contract") {
    // default ports dropped, non-default kept; scheme/host lowercased
    assert(norm("http://A.B:80/x") == "http://a.b/x")
    assert(norm("https://A.B:443/x") == "https://a.b/x")
    assert(norm("https://a.b:80/x") == "https://a.b:80/x") // 80 is NOT https' default
    // empty path → "/"
    assert(norm("https://example.com") == "https://example.com/")
    assert(norm("https://example.com?a=1") == "https://example.com/?a=1")
    // tracking params dropped, remainder sorted; all-dropped → no '?'
    assert(norm("http://h/p?utm_source=x&b=2&a=1") == "http://h/p?a=1&b=2")
    assert(norm("http://h/p?utm_a=1&gclid=z&fbclid=y&ref=r&msclkid=m") == "http://h/p")
    // bare and empty params: empties dropped, bare keys kept (and sorted)
    assert(norm("http://h/p?&&flag&a=1") == "http://h/p?a=1&flag")
    // fragment dropped
    assert(norm("http://h/p#section") == "http://h/p")
    // duplicate params survive (URL semantics keep both)
    assert(norm("http://h/p?a=1&a=1") == "http://h/p?a=1&a=1")
    // utm must be a KEY prefix, not a substring/value hit
    assert(norm("http://h/p?xutm_b=1&k=utm_v") == "http://h/p?k=utm_v&xutm_b=1")
  }

  test("registered-domain heuristic (public-suffix-lite)") {
    assert(one("http://a.b.example.co.uk/").getString(5) == "example.co.uk")
    assert(one("http://a.b.example.gov.au/").getString(5) == "example.gov.au")
    assert(one("http://www.example.com/").getString(5) == "example.com")
    assert(one("http://example.com/").getString(5) == "example.com")
    assert(one("http://localhost/").getString(5) == "localhost")
    // 3-char TLD does not trigger the 2nd-level rule: co.example.dev → last 2
    assert(one("http://a.co.example.dev/").getString(5) == "example.dev")
  }

  test("authority port split: last colon + all-digit suffix only") {
    assert(one("http://h:81x/").getString(1) == "h:81x") // non-digit suffix → no port
    assert(one("http://h:/").getString(1) == "h:")       // empty suffix → no port
    assert(one("http://h:0081/").getLong(2) == 81L)      // leading zeros parse
    val r = one("http://h:1:2/")                          // last colon wins
    assert(r.getString(1) == "h:1" && r.getLong(2) == 2L)
  }

  test("malformed input yields a null struct") {
    val docs = Seq("not a url", "", "http//missing.colon/x", "://nohost",
      "1http://bad.scheme/")
      .map(Tuple1(_)).toDF("u")
      .select(col("u"), UrlParts(col("u")).as("p"))
      .collect()
    for (r <- docs) assert(r.isNullAt(1), s"expected null for '${r.getString(0)}'")
  }

  test("SQL registration works") {
    graft.functions.GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT url_parts('https://Ex.Com/p?utm_x=1&b=2').url_norm AS n").head()
    assert(out.getString(0) == "https://ex.com/p?b=2")
  }
}
