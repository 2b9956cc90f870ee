package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.storage.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned layout: bucket/day dirs, pruning predicate correctness") {
    val dir = Files.createTempDirectory("graftlayout").toString + "/data"
    val df = (1L to 200L).flatMap(sid =>
      Seq((sid, 86400L * (sid % 3) + 100, sid * 1.0)))
      .toDF("stream_id", "timestamp", "value")
    Layout.writeData(df, dir, buckets = 8)

    val back = Layout.readData(spark, dir)
    assert(back.count() === 200)

    // partition dirs exist for both dimensions
    val dirs = new java.io.File(dir).listFiles.map(_.getName).filter(_.startsWith("sbucket="))
    assert(dirs.nonEmpty && dirs.length <= 8)

    // streamPredicate's precomputed bucket matches the written bucket
    val ids = Seq(7L, 42L, 113L)
    val got = back.filter(Layout.streamPredicate(ids, buckets = 8))
      .select("stream_id").distinct().as[Long].collect().toSet
    assert(got === ids.toSet)

    // pruning is visible in the plan: PartitionFilters on sbucket
    val plan = back.filter(Layout.streamPredicate(ids, buckets = 8))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("sbucket"))
  }
}
