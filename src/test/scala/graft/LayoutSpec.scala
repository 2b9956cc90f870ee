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

  test("dayCol floor-divides: pre-1970 timestamps label the PREVIOUS day (r10 review)") {
    // `div` truncates toward zero: -1s would label 19700101 instead of
    // 19691231, shifting every negative-epoch row against both the old
    // date_format labels and Retention's string cutoffs
    val got = Seq(
        (1L, -1L), (2L, -86400L), (3L, -86401L), (4L, 0L), (5L, 86399L),
        (6L, 86400L))
      .toDF("stream_id", "timestamp")
      .withColumn("day", Layout.dayCol)
      .select("stream_id", "day").as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "19691231", 2L -> "19691231", 3L -> "19691230",
      4L -> "19700101", 5L -> "19700101", 6L -> "19700102"))
    // parity with the tz-free reference: date_format over UTC timestamps
    val ref = spark.conf.get("spark.sql.session.timeZone")
    assert(ref === "UTC")
    val viaFormat = Seq((-1L, 0L)).toDF("timestamp", "x")
      .select(date_format(timestamp_seconds(col("timestamp")), "yyyyMMdd"))
      .as[String].head()
    assert(viaFormat === "19691231")
  }

  test("int-typed stream_id buckets agree with streamPredicate (r10 review)") {
    // collection data tables carry stream_id as INT (CollectionSpec
    // reference parity; Catalog casts allocations to int), and Spark's
    // hash() dispatches on the input type — hashInt and hashLong give
    // DIFFERENT values for the same id. bucketCol casts to long before
    // hashing precisely so an int-typed collection's rows land in the
    // buckets streamPredicate (hashLong) scans; without the cast this
    // query silently returned zero rows for most ids.
    val dir = Files.createTempDirectory("graftlayout_int").toString + "/data"
    val df = (1 to 200).map(sid => (sid, 86400L * (sid % 3) + 100, sid * 1.0))
      .toDF("stream_id", "timestamp", "value")
    assert(df.schema("stream_id").dataType.typeName === "integer")
    Layout.writeData(df, dir, buckets = 8)

    val ids = Seq(7L, 42L, 113L)
    val got = Layout.readData(spark, dir)
      .filter(Layout.streamPredicate(ids, buckets = 8))
      .select("stream_id").distinct().as[Int].collect().toSet
    assert(got === ids.map(_.toInt).toSet)

    // and int-typed and long-typed writers agree on the physical bucket
    // of the same id (one collection's readers/writers may disagree on
    // width after a schema evolution — the layout must not care)
    val bucketsInt = df.withColumn("b", Layout.bucketCol(8))
      .select("stream_id", "b").as[(Int, Int)].collect().toMap
    val bucketsLong = df.withColumn("stream_id", col("stream_id").cast("long"))
      .withColumn("b", Layout.bucketCol(8))
      .select("stream_id", "b").as[(Long, Int)].collect().toMap
    bucketsInt.foreach { case (id, b) => assert(bucketsLong(id.toLong) === b) }
  }
}
