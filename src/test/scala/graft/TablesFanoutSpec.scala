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
