package graft.serve

import org.apache.spark.sql.functions._

class PrefetchSpec extends graft.SparkSpec {
  import spark.implicits._

  test("row sequence equals collect() on a multi-partition sorted frame") {
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("v", col("id") * 3)
      .repartition(7)
      .orderBy("id") // range-partitioned sort: partition order = row order
    val got = Prefetch.rows(df, None).map(r => (r.getLong(0), r.getLong(1))).toVector
    val want = df.collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(got === want)
    assert(got.size === 10000)
  }

  test("empty frame and zero-partition frame yield empty iterators") {
    val empty = spark.range(0, 100).filter(col("id") < 0).toDF()
    assert(!Prefetch.rows(empty, None).hasNext)
    assert(Prefetch.rows(spark.emptyDataFrame, None).isEmpty)
  }

  test("a failing partition surfaces the original Spark exception, unwrapped") {
    val boom = udf { (i: Long) =>
      if (i == 7777L) throw new IllegalStateException("boom at 7777")
      i
    }
    val df = spark.range(0, 10000).toDF("id")
      .repartition(8)
      .select(boom(col("id")).as("id"))
    val it = Prefetch.rows(df, None)
    val e = intercept[org.apache.spark.SparkException] {
      while (it.hasNext) it.next()
    }
    // unwrapped from the pump's ExecutionException: the consumer sees what
    // a synchronous draw would have thrown (Service.isCancellation relies
    // on this to classify watchdog kills)
    assert(e.getMessage.contains("boom at 7777") ||
      Option(e.getCause).exists(_.getMessage.contains("boom at 7777")))
  }

  test("partition jobs run under the supplied watchdog job group") {
    val sc = spark.sparkContext
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val g = j.properties.getProperty("spark.jobGroup.id")
        if (g != null && g.startsWith("pf-test-")) seen.add(g)
      }
    }
    sc.addSparkListener(listener)
    try {
      val df = spark.range(0, 1000).toDF("id").repartition(4)
      val n = Prefetch.rows(df, Some(("pf-test-group", "prefetch spec"))).size
      assert(n === 1000)
      // listener events are async — poll until the jobs are visible
      val deadline = System.nanoTime() + 10_000_000_000L
      while (seen.size < 4 && System.nanoTime() < deadline) Thread.sleep(50)
      // every partition job carried the group (4 partitions → ≥4 jobs)
      assert(seen.size >= 4)
      assert(seen.asScala.forall(_ == "pf-test-group"))
    } finally sc.removeSparkListener(listener)
  }

  private implicit class QueueOps(q: java.util.concurrent.ConcurrentLinkedQueue[String]) {
    def asScala: Seq[String] = {
      val b = Vector.newBuilder[String]
      q.forEach(s => b += s)
      b.result()
    }
  }
}
