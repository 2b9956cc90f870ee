package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main for q_sketches' stages.
  * Usage: runMain graft.tools.ProfileSketch [sfDir]
  */
object ProfileSketch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // whole gate query, twice (warm cache second time)
    time("q_sketches (1st)") { graft.SparkEntry.queries("q_sketches")(spark, sfDir).count() }
    time("q_sketches (2nd)") { graft.SparkEntry.queries("q_sketches")(spark, sfDir).count() }

    val ev = graft.query.QueryEngine
      .attachLabels(
        graft.query.QueryEngine.filterTime(
          graft.core.Tables.tsEvents(spark, sfDir), 1704067200L, 1706745600L),
        Map("g0" -> Seq(0L, 3L, 6L), "g1" -> Seq(1L, 4L, 7L), "g2" -> Seq(2L, 5L, 8L)))
      .select(col("nntsclabel"), col("value"))

    time("ev scan") { ev.count() }
    time("count+nd_exact") {
      ev.groupBy("nntsclabel").agg(count(lit(1)), countDistinct(col("value"))).count()
    }
    time("approx_count_distinct") {
      ev.groupBy("nntsclabel").agg(approx_count_distinct(col("value"), 0.01)).count()
    }
    time("percentile_approx acc=10000") {
      ev.groupBy("nntsclabel")
        .agg(percentile_approx(col("value"), array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)))
        .count()
    }
    time("percentile_approx acc=1000") {
      ev.groupBy("nntsclabel")
        .agg(percentile_approx(col("value"), array(lit(0.5), lit(0.95), lit(0.99)), lit(1000)))
        .count()
    }
    time("ranked bands") {
      import org.apache.spark.sql.expressions.Window
      val ns = ev.groupBy("nntsclabel").agg(count(lit(1)).as("__n"))
      val rn = row_number().over(Window.partitionBy("nntsclabel").orderBy("value"))
      ev.join(broadcast(ns), "nntsclabel").withColumn("rn", rn)
        .groupBy("nntsclabel")
        .agg(max(when(col("rn") === greatest(lit(1L),
          ceil(col("__n") * lit(0.49)).cast("long")), col("value"))))
        .count()
    }
    spark.stop()
  }
}
