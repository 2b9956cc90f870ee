package graft

import org.apache.spark.sql.functions._

import graft.functions.NfcNormalize

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // explicit escapes throughout — raw composed/decomposed glyphs in
  // source are indistinguishable to a reviewer and fragile under
  // editor/VCS normalization
  private val Composed = "\u00e9"            // é
  private val Decomposed = "e\u0301"         // e + combining acute

  test("composes decomposed sequences; identity on already-NFC text") {
    val rows = Seq(
      (1L, Decomposed),
      (2L, Composed),
      (3L, "A\u0300ngstro\u0308m"),          // decomposed À and ö
      (4L, "plain ascii"),
      (5L, ""),
      (6L, null: String)).toDF("id", "t")
    val out = rows.select(col("id"), NfcNormalize(col("t")).as("n"))
      .orderBy("id").collect()
    assert(out(0).getString(1) === Composed)
    assert(out(1).getString(1) === Composed)
    assert(out(2).getString(1) === "\u00c0ngstr\u00f6m")
    assert(out(3).getString(1) === "plain ascii")
    assert(out(4).getString(1) === "")
    assert(out(5).isNullAt(1))
  }

  test("matches java.text.Normalizer on corpus text and stays codegen'd") {
    val docs = graft.core.Tables.documents(spark, sf("sf0.001")).limit(100)
      .select(col("doc_id"),
        concat(lit("pre\u0301fix "), col("text")).as("t"))
    val got = docs.select(col("doc_id"), NfcNormalize(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = docs.collect().map(r => r.getLong(0) ->
      java.text.Normalizer.normalize(r.getString(1), java.text.Normalizer.Form.NFC)).toMap
    assert(got === want)
    val plan = docs.select(NfcNormalize(col("t")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("SQL registration") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(s"SELECT nfc_normalize('$Decomposed') AS n")
      .head().getString(0)
    assert(r === Composed)
  }
}
