package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKPairsAggregate

/** Adversarial coverage for the k-bounded top-k aggregate — every case
  * cross-checks against the window-rank reference form it replaces
  * (`row_number() OVER (PARTITION BY grp ORDER BY score DESC, id)`), which
  * is exact by construction on these small inputs.
  */
class TopKPairsSpec extends SparkSpec {
  import spark.implicits._

  // NaN != NaN under Scala tuple equality — compare via a sentinel
  private def denan(s: Double): Double =
    if (s.isNaN) Double.MaxValue else s

  private def viaAggregate(rows: Seq[(String, Double, Long)], k: Int, parts: Int) =
    rows.toDF("grp", "score", "id")
      .repartition(parts) // exercise partial update + serialize + merge
      .groupBy("grp")
      .agg(TopKPairsAggregate.topK(col("score"), col("id"), k).as("top"))
      .select(col("grp"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("grp"), col("t.id"), (col("pos") + 1).as("rank"), col("t.score"))
      .as[(String, Long, Int, Double)].collect()
      .map { case (g, i, r, s) => (g, i, r, denan(s)) }.toSet

  private def viaWindow(rows: Seq[(String, Double, Long)], k: Int) = {
    val w = Window.partitionBy("grp").orderBy(desc("score"), col("id"))
    rows.toDF("grp", "score", "id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .as[(String, Double, Long, Int)].collect()
      .map { case (g, s, i, r) => (g, i, r, denan(s)) }.toSet
  }

  test("matches window rank on adversarial insert orders around the k boundary") {
    // the round-6 regression shape: the k-th insert is HIGH, later inserts
    // are mid-ranked — an unsorted buffer misused as a cutoff drops them
    val tricky = Seq(
      ("g", 0.10, 1L), ("g", 0.20, 2L), ("g", 0.15, 3L), ("g", 0.12, 4L),
      ("g", 0.99, 5L), // 5th insert (k=5): high score lands LAST in buffer
      ("g", 0.50, 6L), ("g", 0.45, 7L), ("g", 0.40, 8L), ("g", 0.35, 9L),
      ("g", 0.30, 10L))
    for (parts <- Seq(1, 4)) {
      assert(viaAggregate(tricky, 5, parts) === viaWindow(tricky, 5),
        s"parts=$parts")
    }
  }

  test("ties break on id ascending, exactly as the window form") {
    val ties = Seq(
      ("g", 0.5, 9L), ("g", 0.5, 3L), ("g", 0.5, 7L), ("g", 0.5, 1L),
      ("g", 0.5, 5L), ("g", 0.7, 2L), ("g", 0.3, 8L))
    assert(viaAggregate(ties, 3, 4) === viaWindow(ties, 3))
    // rank 1 = highest score; ranks 2-3 = tied 0.5 with LOWEST ids
    val got = viaAggregate(ties, 3, 4).toSeq.sortBy(_._3)
    assert(got.map(_._2) === Seq(2L, 1L, 3L))
  }

  test("fewer rows than k, empty groups, and NULL scores/ids ignored") {
    val rows = Seq(("a", 0.9, 1L), ("a", 0.1, 2L))
    assert(viaAggregate(rows, 5, 2) === viaWindow(rows, 5))
    // NULLs dropped (SQL aggregate convention)
    val withNulls = Seq(("a", Some(0.9), Some(1L)), ("a", None, Some(2L)),
      ("a", Some(0.5), None)).toDF("grp", "score", "id")
      .groupBy("grp")
      .agg(TopKPairsAggregate.topK(col("score"), col("id"), 3).as("top"))
      .select(size(col("top"))).as[Int].collect()
    assert(withNulls === Array(1))
  }

  test("NaN sorts as largest, matching Spark's window sort of doubles") {
    val rows = Seq(
      ("g", Double.NaN, 4L), ("g", 0.9, 1L), ("g", 0.5, 2L), ("g", 0.1, 3L))
    assert(viaAggregate(rows, 2, 2) === viaWindow(rows, 2))
    val top = viaAggregate(rows, 2, 2).toSeq.sortBy(_._3)
    assert(top.head._2 === 4L) // NaN first (denan'd to the sentinel)
    assert(top.head._4 === Double.MaxValue)
  }

  test("many groups × many rows: exact agreement under heavy compaction") {
    // 8 groups × 400 rows with engineered collisions: scores quantized to
    // 1dp so every group has deep ties at each score level
    val rows = for {
      g <- 0 until 8; i <- 0 until 400
    } yield (s"g$g", ((i * 7919) % 10) / 10.0, ((i * 104729) % 100000).toLong)
    val distinctRows = rows.distinct
    for (parts <- Seq(1, 7)) {
      assert(viaAggregate(distinctRows, 10, parts) === viaWindow(distinctRows, 10),
        s"parts=$parts")
    }
  }

  test("topk_counted ties collate in UTF-8 byte order, not UTF-16 (r10 review)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // U+E000 (private use, BMP) vs U+10000 (supplementary): UTF-16
    // code-unit order inverts these relative to the code-point/UTF-8
    // order Spark's sort and DuckDB use
    val supp = new String(Character.toChars(0x10000))
    val bmp = "\uE000"
    val counts = Seq(("g", supp, 5L), ("g", bmp, 5L), ("g", "zzz", 5L))
      .toDF("g", "term", "cnt")
    val viaAgg = counts
      .groupBy("g")
      .agg(graft.functions.TopKCountedAggregate
        .topKCounted(col("cnt"), col("term"), 2).as("top"))
      .select(explode(col("top")).as("t")).select(col("t.value"))
      .as[String].collect().toSeq
    val viaSort = counts.orderBy(col("cnt").desc, col("term"))
      .select("term").as[String].collect().take(2).toSeq
    assert(viaAgg === viaSort)
    assert(viaAgg === Seq("zzz", bmp)) // code points 0x7A.. < 0xE000 < 0x10000
  }

  test("topk_counted (string twin): equals the window rank at any partitioning") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // engineered ties: many terms share counts, tie-break is term ASC
    val rows = for {
      g <- 0 until 4; i <- 0 until 300
    } yield (s"g$g", s"t${(i * 31) % 40}", ((i * 7) % 5 + 1).toLong)
    val df0 = rows.toDF("g", "term", "w")
    // per-(g, term) counts (weights summed) — the aggregate's input shape
    val counts = df0.groupBy("g", "term").agg(sum("w").as("cnt"))
    def viaAgg(parts: Int) = counts.repartition(parts)
      .groupBy("g")
      .agg(graft.functions.TopKCountedAggregate
        .topKCounted(col("cnt"), col("term"), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("g"), (col("i") + 1).as("rank"), col("t.value"), col("t.cnt"))
      .as[(String, Int, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val viaWin = {
      import org.apache.spark.sql.expressions.Window
      counts.withColumn("rank",
          row_number().over(Window.partitionBy("g")
            .orderBy(col("cnt").desc, col("term"))))
        .filter(col("rank") <= 5)
        .select(col("g"), col("rank"), col("term"), col("cnt"))
        .as[(String, Int, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    }
    for (parts <- Seq(1, 7)) assert(viaAgg(parts) === viaWin, s"parts=$parts")
    // SQL surface
    graft.functions.GraftExtensions.register(spark)
    counts.createOrReplaceTempView("tc_sql")
    val viaSql = spark.sql(
      "SELECT g, topk_counted(cnt, term, 5) AS top FROM tc_sql GROUP BY g")
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.value"), col("t.cnt"))
      .as[(String, String, Long)].collect().toSet
    assert(viaSql === viaWin.map(r => (r._1, r._3, r._4)).toSet)
  }
}
