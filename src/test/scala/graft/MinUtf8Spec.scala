package graft

import org.apache.spark.sql.functions._

/** MinUtf8 (the ObjectHashAggregate-eligible min-string twin) vs the
  * builtin `min(string)` ITSELF — q_pii_scan's redacted_min rides it, so
  * any divergence is a gate break. Includes the orderings that would
  * expose a wrong comparator: multi-byte UTF-8 vs ASCII (bytewise
  * unsigned), prefix vs longer string, empty string vs non-empty, and
  * all-null / mixed-null groups.
  */
class MinUtf8Spec extends SparkSpec {

  test("MinUtf8 == builtin min(string) per group, including unicode/empty/null edges") {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      ("a", "banana"), ("a", "apple"), ("a", "Apple"), // case = byte order
      ("b", "δelta"), ("b", "zeta"), ("b", "Zeta"),    // multi-byte vs ASCII
      ("c", ""), ("c", "x"),                             // empty < everything
      ("d", null), ("d", "only"),                        // null skipped
      ("e", null), ("e", null),                          // all-null → null
      ("f", "pre"), ("f", "prefix"),                     // prefix < longer
      ("g", "\u0000nul"), ("g", "a"),                   // NUL byte smallest
      ("h", "🎉emoji"), ("h", "zz"), ("h", "�"))
    val df = spark.createDataFrame(
      rows.map { case (g, v) => org.apache.spark.sql.Row(g, v) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("g",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))))
    val want = df.groupBy("g").agg(min("v").as("m"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val gotDf = df.groupBy("g").agg(graft.functions.MinUtf8(col("v")).as("m"))
    val got = gotDf.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === want)
    // the operator the swap exists for: hash-based object aggregation,
    // never a sort-based fallback
    val plan = gotDf.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(500))
    assert(!plan.contains("SortAggregate"), plan.take(500))
  }
}
