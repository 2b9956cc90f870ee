package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.pipeline.TextAnalysis

object Profile3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    docs.cache().count()

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROF $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    time("docStats current (explode expr)") {
      TextAnalysis.docStats(docs, "doc_id", "text").agg(sum("quality")).collect()
    }
    time("docStats persist-toks") {
      val toks = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("__toks")).persist()
      toks.count()
      val t = toks.select(col("doc_id"), explode(col("__toks")).as("__t"))
      val agg = t.groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__t").isin(TextAnalysis.Stopwords: _*), 1L).otherwise(0L)).as("n_stop"),
        sum(length(col("__t"))).as("sl"))
      agg.agg(sum("n_tokens")).collect()
      toks.unpersist()
    }
    time("pure column single select") {
      val toks = split(trim(col("text")), "\\s+")
      docs.select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        size(filter(toks, t => t.isin(TextAnalysis.Stopwords: _*))).as("n_stop"),
        aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x).as("sl"))
        .agg(sum("n_tokens")).collect()
    }
    time("explode posexplode-free: split once via repartition barrier") {
      val toks = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("__toks"))
        .repartition(32)
      toks.select(col("doc_id"), explode(col("__toks")).as("__t"))
        .groupBy("doc_id").agg(count(lit(1))).agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
