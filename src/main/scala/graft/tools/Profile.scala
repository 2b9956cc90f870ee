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
    time("minhashLsh") {
      Dedup.minhashLshPairs(docs, "doc_id", "text").count()
    }
    time("simhashPairs") {
      Dedup.simhashPairs(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
