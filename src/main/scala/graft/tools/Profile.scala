package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.Tables
import graft.pipeline.Dedup

/** Ad-hoc profiling main for the heavy dedup pipelines.
  * Usage: runMain graft.tools.Profile [sfDir]
  */
object Profile {
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
    val docs = Tables.documents(spark, sfDir)
    docs.cache().count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("ngramJaccard") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2).count()
    }
    time("ngramJaccard maxDf=500") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2,
        maxDf = Some(500L)).count()
    }
    // stage decomposition of the candidate volume driving the above.
    // NOTE: deliberately re-states the pipeline's stages inline (a
    // diagnostic snapshot, not a call into Dedup) — if ngramJaccardPairs'
    // shape changes, update this block or its timings measure a stale
    // pipeline
    locally {
      import org.apache.spark.sql.functions._
      val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
      time("  shingle sets") { sets.count() }
      val exploded = sets.select(col("__id"), explode(col("__set")).as("__s"))
      time("  exploded index rows") { exploded.count() }
      val dfs = exploded.groupBy("__s").agg(count(lit(1)).as("__df"))
      time("  distinct shingles") { dfs.count() }
      time("  candidate pair rows (sum df^2, kept)") {
        dfs.filter(col("__df") <= 500)
          .agg(sum(col("__df") * col("__df"))).collect()(0).getLong(0)
      }
      time("  hot shingles (df>500)") { dfs.filter(col("__df") > 500).count() }
      val inv = exploded.groupBy("__s")
        .agg(sort_array(collect_list("__id")).as("__docs"))
      time("  inverted lists") { inv.count() }
      val gen = inv
        .select(posexplode(col("__docs")).as(Seq("__i", "id_a")), col("__docs"))
        .select(col("id_a"),
          explode(expr("slice(__docs, __i + 2, size(__docs))")).as("id_b"))
      time("  generated pair rows") { gen.count() }
      time("  distinct candidate pairs") {
        gen.groupBy("id_a", "id_b").agg(count(lit(1))).count()
      }
    }
    time("minhashLsh") {
      Dedup.minhashLshPairs(docs, "doc_id", "text").count()
    }
    time("simhashPairs") {
      Dedup.simhashPairs(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
