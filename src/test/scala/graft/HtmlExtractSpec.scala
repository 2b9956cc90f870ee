package graft

import org.apache.spark.sql.functions._

import graft.functions.HtmlExtract

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def one(html: String): String =
    Seq(Tuple1(html)).toDF("h").select(HtmlExtract(col("h"))).head().getString(0)

  test("pass chain: blocks, comments, tags, entities, whitespace") {
    assert(one("<html><body><p>Hello&nbsp;world</p></body></html>") == "Hello world")
    // block removal is "" (not a space): adjacent words join — the spaces
    // here come from the source text
    assert(one("keep <script type='x'>var a = '<p>';</script> this") == "keep this")
    assert(one("join<script>x</script>ed") == "joined")
    assert(one("a <style>p { color: red }</style> b") == "a b")
    assert(one("x <!-- a <b> comment --> y") == "x y")
    assert(one("x<!-- inline -->y") == "xy")
    assert(one("a<br>b") == "a b")                       // tag → space keeps the boundary
    assert(one("one\t\ntwo   three\r") == "one two three")
    assert(one("&lt;tag&gt; &amp; &quot;q&quot; &#39;s&apos;") == "<tag> & \"q\" 's'")
  }

  test("contract edges: unclosed script, bare '<', double-unescape, case scope") {
    // unclosed <script> falls through the block pass and loses only its tag
    assert(one("before <script>var x = 1") == "before var x = 1")
    // a bare '<' eats to the NEXT '>' — the tag regex's natural behavior
    assert(one("a 1<2 <b>x</b>") == "a 1 x")
    // sequential literal entity replaces double-unescape &amp;lt;
    assert(one("&amp;lt;") == "<")
    // tag-name matching is case-SENSITIVE by contract: uppercase SCRIPT is
    // not a block, so only its tags are stripped and the content survives
    assert(one("<SCRIPT>kept</SCRIPT>") == "kept")
    // decoded entities are NOT re-stripped (entity pass runs after tags)
    assert(one("&lt;script&gt;still here&lt;/script&gt;") == "<script>still here</script>")
    assert(one("") == "")
    assert(one("   plain  text   ") == "plain text")
  }

  test("fused expression equals the Spark regexp_replace chain on gate-shaped markup") {
    val docs = graft.core.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"), col("source")).limit(300)
    val html = concat(
      lit("<html><head><title>doc "), col("doc_id"),
      lit("</title><style>p{margin:"), col("doc_id") % 7,
      lit("px}</style></head><body><!-- id "), col("doc_id"),
      lit(" --><h1 class=\"t\">"), col("source"),
      lit("</h1><p data-k=\"v\">"),
      expr("replace(replace(text, 'a', '&lt;i&gt;'), 'e', '&amp;')"),
      lit("</p>"),
      when(col("doc_id") % 13 === 0, lit("<script>var x=unclosed"))
        .otherwise(lit("<script type=\"text/javascript\">var id=1;</script>")),
      when(col("doc_id") % 11 === 0, lit(" 1<2 ")).otherwise(lit("")),
      lit("</body></html>"))

    // the compositional witness: Spark's regexp_replace/replace chain
    // (same java.util.regex engine, pinning the PASS ORDER)
    var chain: org.apache.spark.sql.Column = html
    chain = regexp_replace(chain, "(?s)<script[^>]*>.*?</script>", "")
    chain = regexp_replace(chain, "(?s)<style[^>]*>.*?</style>", "")
    chain = regexp_replace(chain, "(?s)<!--.*?-->", "")
    chain = regexp_replace(chain, "(?s)<[^>]*>", " ")
    for ((ent, rep) <- Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " "))
      chain = replace(chain, lit(ent), lit(rep))
    chain = trim(regexp_replace(chain, "[ \\t\\n\\r\\f]+", " "))

    val out = docs.select(
        col("doc_id"), HtmlExtract(html).as("fused"), chain.as("witness"))
      .collect()
    assert(out.nonEmpty)
    for (r <- out)
      assert(r.getString(1) == r.getString(2), s"doc ${r.getLong(0)} diverged")
  }

  test("null input yields null; SQL registration works") {
    graft.functions.GraftExtensions.register(spark)
    Seq((1L, "<p>a</p>"), (2L, null.asInstanceOf[String]))
      .toDF("id", "h").createOrReplaceTempView("he_docs")
    val out = spark.sql(
      "SELECT id, html_extract(h) AS c FROM he_docs ORDER BY id").collect()
    assert(out(0).getString(1) == "a")
    assert(out(1).isNullAt(1))
  }
}
