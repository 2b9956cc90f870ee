package graft

import graft.ingest.AmpIcmp
import graft.storage.Retention

/** Port of the reference's parser golden test
  * (/root/reference/tests/IcmpParser_test.py): same raw inputs → same
  * normalized rows, including the lost-measurement, partial-loss and
  * failed-to-run edge cases.
  */
class AmpIcmpSpec extends SparkSpec {
  import spark.implicits._

  // the reference testdata (IcmpParser_test.py:6-66), one batch at ts=0
  private lazy val raw = Seq(
    // lost measurement, lost.example.com
    ("source", "lost.example.com", "192.0.2.1", None: Option[Int], Some(1), false, 84, 0L),
    // lost measurement, good.example.com
    ("source", "good.example.com", "192.0.2.254", None: Option[Int], Some(1), false, 84, 0L),
    // good measurements
    ("source", "good.example.com", "198.51.100.254", Some(1000), Some(0), false, 84, 0L),
    ("source", "good.example.com", "203.0.113.254", Some(2000), Some(0), false, 84, 0L),
    // failed to perform measurement
    ("source", "doesnotexist.invalid", "0.0.0.0", None: Option[Int], None: Option[Int], false, 84, 0L))
    .toDF("source", "target", "address", "rtt", "loss", "random", "packet_size", "timestamp")

  test("icmp normalization matches the reference goldens (IcmpParser_test.py:68-92)") {
    val out = AmpIcmp.normalize(raw).collect()
      .map(r => r.getAs[String]("destination") -> r).toMap
    assert(out.size === 3)

    val lost = out("lost.example.com")
    assert(lost.getAs[Int]("loss") === 1)
    assert(lost.getAs[Seq[Integer]]("rtts") === Seq(null))
    assert(lost.isNullAt(lost.fieldIndex("median")))
    assert(lost.getAs[Int]("results") === 1)
    assert(lost.getAs[Double]("lossrate") === 1.0)

    val good = out("good.example.com")
    assert(good.getAs[Int]("loss") === 1)
    assert(good.getAs[Seq[Integer]]("rtts") === Seq(1000, 2000, null))
    assert(good.getAs[Int]("median") === 1500)
    assert(good.getAs[Int]("results") === 3)
    assert(good.getAs[Double]("lossrate") === 1.0 / 3)

    val failed = out("doesnotexist.invalid")
    assert(failed.isNullAt(failed.fieldIndex("loss")))
    assert(failed.getAs[Seq[Integer]]("rtts") === Seq.empty)
    assert(failed.isNullAt(failed.fieldIndex("median")))
    assert(failed.isNullAt(failed.fieldIndex("results")))
    assert(failed.isNullAt(failed.fieldIndex("lossrate")))
  }

  test("random packet size becomes the 'random' stream key (amp_icmp.py:113-121)") {
    val r = Seq(("s", "t", "1.2.3.4", Some(10), Some(0), true, 84, 0L))
      .toDF("source", "target", "address", "rtt", "loss", "random", "packet_size", "timestamp")
    val out = AmpIcmp.normalize(r).collect()(0)
    assert(out.getAs[String]("packet_size_key") === "random")
    assert(out.getAs[String]("family") === "ipv4")
  }

  test("retention drops old day partitions; streamStats summarizes activity (X5/X8)") {
    val dir = java.nio.file.Files.createTempDirectory("graftret").toString + "/data"
    val df = Seq(
      (1L, 0L, 1.0),             // day 19700101
      (1L, 200L * 86400, 2.0),   // day 19700720
      (2L, 300L * 86400, 3.0))   // day 19701028
      .toDF("stream_id", "timestamp", "value")
    graft.storage.Layout.writeData(df, dir, buckets = 2)
    // cycle 1 TOMBSTONES the aged day: hidden from retention-aware
    // readers immediately, files linger one cycle for in-flight scans
    val dropped = Retention.expireDays(dir, cutoffEpoch = 100L * 86400)
    assert(dropped === Seq("day=19700101"))
    assert(Retention.expiredDays(dir) === Set("19700101"))
    def dayDirs = {
      val b = Seq.newBuilder[String]
      def walk(f: java.io.File): Unit = f.listFiles().foreach { c =>
        if (c.isDirectory) { if (c.getName.startsWith("day=")) b += c.getName else walk(c) }
      }
      walk(new java.io.File(dir)); b.result().distinct.sorted
    }
    assert(dayDirs.contains("day=19700101")) // grace: still on disk
    // cycle 2 GC's the tombstoned files and clears the marker
    assert(Retention.expireDays(dir, cutoffEpoch = 100L * 86400) === Seq())
    assert(Retention.expiredDays(dir) === Set())
    assert(!dayDirs.contains("day=19700101"))
    val left = graft.storage.Layout.readData(spark, dir)
    assert(left.count() === 2)
    val stats = Retention.streamStats(left).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(stats(1L) === ((200L * 86400, 200L * 86400, 1L)))
    assert(stats(2L) === ((300L * 86400, 300L * 86400, 1L)))
  }
}
