package graft

import org.apache.spark.sql.functions._

import graft.functions.{PlatformLn, TokenEntropy}
import graft.pipeline.TextAnalysis

class TokenEntropySpec extends SparkSpec {
  import spark.implicits._

  private def q9ln(x: Double): Long =
    math.floor(java.lang.Math.log(x) * 1e9 + 0.5).toLong

  private def fused(docs: org.apache.spark.sql.DataFrame) = docs
    .select(col("doc_id"), TokenEntropy(col("text")).as("__e"))
    .select(
      col("doc_id"),
      col("__e.n_tokens").as("n_tokens"),
      col("__e.n_distinct").as("n_distinct"),
      col("__e.entropy").as("entropy"))

  // the relational witness: explode → per-token count → totals join —
  // exactly the gate oracle's shape, in Spark
  private def relational(docs: org.apache.spark.sql.DataFrame) = {
    val u = docs.select(
      col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val c = u.groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
    val n = c.groupBy("doc_id")
      .agg(sum("cnt").as("n"), count(lit(1)).as("nd"))
    c.join(n, "doc_id")
      .groupBy(col("doc_id"), col("n"), col("nd"))
      .agg(sum(col("cnt") *
        floor(PlatformLn(col("cnt").cast("double") / col("n")) * 1e9 + 0.5)
          .cast("long")).as("sq"))
      .select(
        col("doc_id"),
        col("n").as("n_tokens"),
        col("nd").as("n_distinct"),
        (-(col("sq").cast("double") / col("n")) / 1e9).as("entropy"))
  }

  private def edgeDocs = Seq(
    (9000001L, "a a b b"),
    (9000002L, "x x x x"),                  // zero entropy (one distinct token)
    (9000003L, "one two three four five"),  // all-distinct → ln(5)
    (9000004L, ""),                         // empty → one empty token, H = 0
    (9000005L, "   "),                      // spaces only → same
    (9000006L, "solo"),
    (9000007L, "tab\tsep\ttokens and a repeated and a repeated tail"),
    (9000008L, "newline\nsplit doc\t"))     // trailing sep → trailing empty token
    .toDF("doc_id", "text")

  test("fused token_entropy equals the relational explode form, corpus + edges") {
    val docs = graft.core.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text")).limit(300)
      .union(edgeDocs)
    val f = fused(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val r = relational(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(f.keySet == r.keySet)
    for ((id, fv) <- f) assert(fv == r(id), s"doc $id: fused $fv vs relational ${r(id)}")
  }

  test("known values: uniform, constant, and all-distinct documents") {
    val out = fused(edgeDocs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap

    // "a a b b": n=4, 2 distinct, each c/n = 1/2 → H = −q9(ln .5)/1e9
    assert(out(9000001L)._1 == 4L && out(9000001L)._2 == 2L)
    assert(out(9000001L)._3 == -(4.0 * q9ln(0.5) / 4) / 1e9)

    // constant doc: ln(4/4) = 0 → entropy 0 (−0.0 == 0.0)
    assert(out(9000002L)._1 == 4L && out(9000002L)._2 == 1L && out(9000002L)._3 == 0.0)

    // all-distinct: H = −q9(ln(1/5))/1e9 (≈ ln 5)
    assert(out(9000003L)._1 == 5L && out(9000003L)._2 == 5L)
    assert(out(9000003L)._3 == -(5.0 * q9ln(0.2) / 5) / 1e9)
    assert(math.abs(out(9000003L)._3 - math.log(5.0)) < 1e-8)

    // empty and whitespace-only collapse to the single empty token
    assert(out(9000004L) == ((1L, 1L, 0.0)))
    assert(out(9000005L) == ((1L, 1L, 0.0)))
    assert(out(9000006L) == ((1L, 1L, 0.0)))

    // trailing separator keeps the Spark-split trailing empty token:
    // "newline\nsplit doc\t" → ["newline", "split", "doc", ""] = 4 distinct
    assert(out(9000008L)._1 == 4L && out(9000008L)._2 == 4L)
  }

  test("null text yields null; SQL registration works") {
    graft.functions.GraftExtensions.register(spark)
    val rows = Seq((9000001L, "a b a"), (9000002L, null.asInstanceOf[String]))
      .toDF("doc_id", "text").createOrReplaceTempView("te_docs")
    val out = spark.sql(
      "SELECT doc_id, token_entropy(text) AS e FROM te_docs ORDER BY doc_id")
      .collect()
    assert(out(0).getStruct(1).getLong(0) == 3L)
    assert(out(0).getStruct(1).getLong(1) == 2L)
    assert(out(1).isNullAt(1))
  }
}
