package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.schema.Collections
import graft.storage.{LayoutSnapshot, Snapshot}
import graft.streaming.IngestStream

/** Generation-pinned snapshot reads: the same corpus bytes for as long as
  * the grace-GC contract holds, regardless of ingest and maintenance
  * continuing on top — and a CLEAR failure once it doesn't.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graftsnap").toString

  private def batch(src: String, ts: Long) =
    Seq(RawResult(src, "d1", "ping", ts, 1L)).toDF()

  test("pinned read is byte-stable across ingest, compaction, and merge") {
    val dir = tmpDir()
    val spec = Collections.ampExternal
    // two landed epochs, one folded into a cset → snapshot spans a cset
    // AND a raw epoch
    IngestStream.ingestBatch(batch("s1", 1704067200L), spec,
      s"$dir/streams", s"$dir/data", identity, epoch = Some(0L))
    IngestStream.compactToLayout(spark, s"$dir/data", s"$dir/layout",
      settledBelow = 1L, buckets = 8)
    IngestStream.ingestBatch(batch("s2", 1704153600L), spec,
      s"$dir/streams", s"$dir/data", identity, epoch = Some(1L))

    val snap = Snapshot.pin(s"$dir/layout", s"$dir/data")
    assert(snap.csets === Seq(1L) && snap.epochs === Seq(1L))
    def pinned = Snapshot.read(spark, s"$dir/layout", s"$dir/data", snap)
      .select("timestamp").as[Long].collect().sorted.toSeq
    val expected = pinned
    assert(expected === Seq(1704067200L, 1704153600L))

    // the token round-trips — a training job can persist and re-read it
    assert(LayoutSnapshot.fromToken(snap.token) === snap)

    // new ingest grows the LIVE view, not the pinned one
    IngestStream.ingestBatch(batch("s3", 1704240000L), spec,
      s"$dir/streams", s"$dir/data", identity, epoch = Some(2L))
    assert(IngestStream.readCombined(spark, s"$dir/layout", s"$dir/data")
      .count() === 3)
    assert(pinned === expected)

    // minor compaction folds BOTH raw epochs into cset 3; the pinned
    // epoch dir survives the grace cycle, so the snapshot still serves
    IngestStream.compactToLayout(spark, s"$dir/data", s"$dir/layout",
      settledBelow = 3L, buckets = 8)
    assert(pinned === expected)

    // a major merge supersedes the pinned cset; grace keeps it on disk
    IngestStream.mergeCsets(spark, s"$dir/layout", buckets = 8)
    assert(pinned === expected)

    // the NEXT maintenance cycle retires the pinned sources (grace over):
    // the read must fail with the expiry contract, never a partial corpus
    IngestStream.compactToLayout(spark, s"$dir/data", s"$dir/layout",
      settledBelow = 3L, buckets = 8)
    IngestStream.mergeCsets(spark, s"$dir/layout", buckets = 8)
    val e = intercept[IllegalStateException] {
      Snapshot.read(spark, s"$dir/layout", s"$dir/data", snap)
    }
    assert(e.getMessage.contains("snapshot expired"))
    // the live view is unaffected throughout
    assert(IngestStream.readCombined(spark, s"$dir/layout", s"$dir/data")
      .count() === 3)
  }

  test("pin is consistent under a concurrent merge commit") {
    val dir = tmpDir()
    val spec = Collections.ampExternal
    (0 to 2).foreach { i =>
      IngestStream.ingestBatch(batch(s"s${i + 1}", 1704067200L + 86400L * i),
        spec, s"$dir/streams", s"$dir/data", identity, epoch = Some(i.toLong))
      IngestStream.compactToLayout(spark, s"$dir/data", s"$dir/layout",
        settledBelow = i + 1L, buckets = 8)
    }
    // pin while a merge commits in another thread: the snapshot must be a
    // consistent cut (all-old or all-new sources), and every pin taken
    // during the race must read the same 3 rows
    val merger = new Thread(() =>
      IngestStream.mergeCsets(spark, s"$dir/layout", buckets = 8))
    merger.start()
    val snaps = (1 to 20).map { _ =>
      Snapshot.pin(s"$dir/layout", s"$dir/data")
    }
    merger.join()
    snaps.foreach { s =>
      val rows = Snapshot.read(spark, s"$dir/layout", s"$dir/data", s)
        .select("timestamp").as[Long].collect().sorted.toSeq
      assert(rows.size === 3, s"inconsistent cut: $s")
    }
  }
}
