package graft

import graft.core.Tables

/** The r19 small-input scan fan-out (Tables.loadFact / tsEvents): a
  * single-row-group fact file is spread by a hash repartition on its id
  * so per-row kernels parallelize; the conf gate must make it the exact
  * identity when disabled or when the input is past the threshold (the
  * 100 TB case — the remediation must never add a corpus-sized shuffle).
  */
class TablesFanoutSpec extends SparkSpec {

  private def hasRepart(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("RepartitionByExpression")

  test("fan-out applies to small single-split fact tables and follows defaultParallelism") {
    val prev = spark.conf.getOption("graft.fanout.maxInputBytes")
    try {
      spark.conf.set("graft.fanout.maxInputBytes", (64L << 20).toString)
      val docs = Tables.documents(spark, sf("sf0.001"))
      assert(hasRepart(docs), "small documents table must fan out")
      assert(docs.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
      // results identical to the raw read (same rows, same aggregates)
      val raw = Tables.load(spark, sf("sf0.001"), "documents")
      assert(docs.count() === raw.count())
      val a = docs.agg(org.apache.spark.sql.functions.sum("doc_id")).collect()(0).getLong(0)
      val b = raw.agg(org.apache.spark.sql.functions.sum("doc_id")).collect()(0).getLong(0)
      assert(a === b)
    } finally {
      prev.fold(spark.conf.unset("graft.fanout.maxInputBytes"))(
        spark.conf.set("graft.fanout.maxInputBytes", _))
    }
  }

  test("fan-out is the identity when disabled or when the input exceeds the threshold") {
    val prev = spark.conf.getOption("graft.fanout.maxInputBytes")
    try {
      spark.conf.set("graft.fanout.maxInputBytes", "0")
      assert(!hasRepart(Tables.documents(spark, sf("sf0.001"))), "disabled → identity")
      // threshold below the file size → the 100 TB branch: no repartition
      spark.conf.set("graft.fanout.maxInputBytes", "1")
      assert(!hasRepart(Tables.documents(spark, sf("sf0.001"))), "big input → identity")
    } finally {
      prev.fold(spark.conf.unset("graft.fanout.maxInputBytes"))(
        spark.conf.set("graft.fanout.maxInputBytes", _))
    }
  }

  test("directory inputs: single-data-file sized by the file, multi-file identity, byte-string conf") {
    import java.nio.file.{Files, Paths}
    val prev = spark.conf.getOption("graft.fanout.maxInputBytes")
    val tmp = Files.createTempDirectory("fanout_dir").toString
    try {
      // a directory-layout copy of the small corpus: one data part +
      // the _SUCCESS marker Spark writes (ADVICE r19: the dirent-size
      // measurement previously made ANY directory pass the gate)
      Tables.load(spark, sf("sf0.001"), "documents")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      // byte-string value — the format every adjacent size conf accepts
      spark.conf.set("graft.fanout.maxInputBytes", "64m")
      val single = Tables.documents(spark, tmp)
      assert(hasRepart(single), "single-data-file directory must fan out")
      assert(single.count() ===
        Tables.load(spark, sf("sf0.001"), "documents").count())
      // second data file → already-split → identity
      val part = Files.list(Paths.get(s"$tmp/documents.parquet")).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.copy(part, Paths.get(s"$tmp/documents.parquet/part-copy.parquet"))
      assert(!hasRepart(Tables.documents(spark, tmp)),
        "multi-data-file directory is already split → identity")
    } finally {
      prev.fold(spark.conf.unset("graft.fanout.maxInputBytes"))(
        spark.conf.set("graft.fanout.maxInputBytes", _))
      // best-effort cleanup
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(Paths.get(tmp)).iterator().asScala.toSeq
          .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }
  }

  test("dimension tables never fan out") {
    val prev = spark.conf.getOption("graft.fanout.maxInputBytes")
    try {
      spark.conf.set("graft.fanout.maxInputBytes", (64L << 20).toString)
      assert(!hasRepart(Tables.nation(spark, sf("sf0.001"))))
      assert(!hasRepart(Tables.customer(spark, sf("sf0.001"))))
    } finally {
      prev.fold(spark.conf.unset("graft.fanout.maxInputBytes"))(
        spark.conf.set("graft.fanout.maxInputBytes", _))
    }
  }
}
