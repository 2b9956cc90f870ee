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

  test("retention-expired day inside a pinned source expires the snapshot cleanly") {
    val dir = tmpDir()
    val spec = Collections.ampExternal
    // two days land and fold into one cset: retention deletes day dirs
    // INSIDE a source whose top-level dir survives, so expiry must be
    // detected per day, not per source dir
    IngestStream.ingestBatch(batch("s1", 1704067200L), spec, // 2024-01-01
      s"$dir/streams", s"$dir/data", identity, epoch = Some(0L))
    IngestStream.ingestBatch(batch("s2", 1717200000L), spec, // 2024-06-01
      s"$dir/streams", s"$dir/data", identity, epoch = Some(1L))
    IngestStream.compactToLayout(spark, s"$dir/data", s"$dir/layout",
      settledBelow = 2L, buckets = 8)

    val snap = Snapshot.pin(s"$dir/layout", s"$dir/data")
    assert(snap.sourceDays("cset=2") === Set("20240101", "20240601"))
    def pinned = Snapshot.read(spark, s"$dir/layout", s"$dir/data", snap)
      .select("timestamp").as[Long].collect().sorted.toSeq
    assert(pinned === Seq(1704067200L, 1717200000L))

    // tombstone cycle: the old day vanishes from LIVE reads immediately,
    // but the pinned read keeps serving it (files linger one grace cycle,
    // and the pin carries its own tombstone set)
    graft.storage.Retention.expireDays(s"$dir/layout",
      cutoffEpoch = 1709251200L) // 2024-03-01
    assert(IngestStream.readCombined(spark, s"$dir/layout", s"$dir/data")
      .count() === 1)
    assert(pinned === Seq(1704067200L, 1717200000L))

    // grace over: the day dir is physically deleted inside the still-live
    // cset — the pinned read must fail the expiry contract, naming the
    // day, never silently serving the hollowed-out source
    graft.storage.Retention.expireDays(s"$dir/layout",
      cutoffEpoch = 1709251200L)
    val e = intercept[IllegalStateException] { pinned }
    assert(e.getMessage.contains("snapshot expired") &&
      e.getMessage.contains("day=20240101"))
  }

  test("registered pin (TTL) survives maintenance cycles, then expires cleanly") {
    val dir = tmpDir()
    val spec = Collections.ampExternal
    IngestStream.ingestBatch(batch("s1", 1704067200L), spec,
      s"$dir/streams", s"$dir/data", identity, epoch = Some(0L))
    IngestStream.compactToLayout(spark, s"$dir/data", s"$dir/layout",
      settledBelow = 1L, buckets = 8)
    IngestStream.ingestBatch(batch("s2", 1704153600L), spec,
      s"$dir/streams", s"$dir/data", identity, epoch = Some(1L))

    // a REGISTERED pin: grace GC defers its sources until the TTL
    val snap = Snapshot.pin(s"$dir/layout", s"$dir/data", ttlMs = 10 * 60 * 1000L)
    def pinned = Snapshot.read(spark, s"$dir/layout", s"$dir/data", snap)
      .select("timestamp").as[Long].collect().sorted.toSeq
    val expected = Seq(1704067200L, 1704153600L)
    assert(pinned === expected)

    // TWO full maintenance cycles — the unregistered contract dies on the
    // second (the first supersedes, the second's grace GC retires); the
    // registered pin must keep serving through both
    (0 until 2).foreach { _ =>
      IngestStream.compactToLayout(spark, s"$dir/data", s"$dir/layout",
        settledBelow = 2L, buckets = 8)
      IngestStream.mergeCsets(spark, s"$dir/layout", buckets = 8)
      IngestStream.gcLayout(s"$dir/layout")
      assert(pinned === expected, "registered pin must survive grace GC")
    }
    // live view unaffected, and the pinned-but-superseded sources are
    // invisible to it
    assert(IngestStream.readCombined(spark, s"$dir/layout", s"$dir/data")
      .count() === 2)

    // TTL passes (rewind the registry entry's expiry rather than sleeping
    // through real cycles): the next cycle's GC retires the sources AND
    // self-cleans the pin file; the read fails the expiry contract
    val pinsDir = new java.io.File(s"$dir/layout", "_pins")
    val pinFile = pinsDir.listFiles().filter(_.getName.startsWith("pin_")).head
    val parts = pinFile.getName.split("_")
    java.nio.file.Files.move(pinFile.toPath,
      new java.io.File(pinsDir,
        s"pin_${System.currentTimeMillis() - 1}_${parts(2)}").toPath)
    IngestStream.compactToLayout(spark, s"$dir/data", s"$dir/layout",
      settledBelow = 2L, buckets = 8)
    IngestStream.mergeCsets(spark, s"$dir/layout", buckets = 8)
    IngestStream.gcLayout(s"$dir/layout")
    val e = intercept[IllegalStateException] { pinned }
    assert(e.getMessage.contains("snapshot expired"))
    assert(pinsDir.listFiles().isEmpty, "expired pin file must self-clean")
    assert(IngestStream.readCombined(spark, s"$dir/layout", s"$dir/data")
      .count() === 2)
  }

  test("malformed pin file cannot wedge maintenance (r10 review)") {
    // pins commit via ATOMIC_MOVE so no live writer produces a partial
    // file — but a corrupted or legacy-partial pin_* must be dropped with
    // a warning, not crash activePins: that helper runs inside
    // compactToLayout, gcLayout AND Retention.expireDays, so one bad file
    // used to wedge every maintenance cycle until the name-embedded
    // expiry passed (up to the full TTL)
    val dir = tmpDir()
    val spec = Collections.ampExternal
    IngestStream.ingestBatch(batch("s1", 1704067200L), spec,
      s"$dir/streams", s"$dir/data", identity, epoch = Some(0L))
    IngestStream.compactToLayout(spark, s"$dir/data", s"$dir/layout",
      settledBelow = 1L, buckets = 8)
    val pinsDir = new java.io.File(s"$dir/layout", "_pins")
    pinsDir.mkdirs()
    val farFuture = System.currentTimeMillis() + 10 * 60 * 1000L
    java.nio.file.Files.writeString(
      new java.io.File(pinsDir, s"pin_${farFuture}_dead").toPath, "")
    java.nio.file.Files.writeString(
      new java.io.File(pinsDir, "pin_notanumber_x").toPath, "garbage")

    // a real pin alongside the junk keeps protecting its sources
    val snap = Snapshot.pin(s"$dir/layout", s"$dir/data", ttlMs = 10 * 60 * 1000L)
    val pins = Snapshot.activePins(s"$dir/layout")
    assert(pins.msets.nonEmpty || pins.csets.nonEmpty)
    // the junk files were dropped, the real pin file survives
    val names = pinsDir.listFiles().map(_.getName).toSet
    assert(!names.exists(_.endsWith("_dead")) && !names.contains("pin_notanumber_x"))
    assert(names.exists(_.startsWith("pin_")))
    // and a full maintenance cycle runs clean with junk re-planted
    java.nio.file.Files.writeString(
      new java.io.File(pinsDir, s"pin_${farFuture}_dead2").toPath, "")
    IngestStream.ingestBatch(batch("s2", 1704153600L), spec,
      s"$dir/streams", s"$dir/data", identity, epoch = Some(1L))
    IngestStream.compactToLayout(spark, s"$dir/data", s"$dir/layout",
      settledBelow = 2L, buckets = 8)
    IngestStream.gcLayout(s"$dir/layout")
    assert(Snapshot.read(spark, s"$dir/layout", s"$dir/data", snap)
      .count() >= 1)
  }

  test("transient pin READ failure aborts the GC consult, never deletes the pin") {
    // a directory named like a pin makes Files.readString throw
    // IOException ("Is a directory") — the stand-in for a disk hiccup on
    // a HEALTHY pin. That must abort activePins (caller retries next
    // cycle), NOT silently drop the pin: deleting it would let the next
    // destructive pass reap data a live snapshot still references.
    val dir = tmpDir()
    val pinsDir = new java.io.File(s"$dir/layout", "_pins")
    pinsDir.mkdirs()
    val farFuture = System.currentTimeMillis() + 10 * 60 * 1000L
    val unreadable = new java.io.File(pinsDir, s"pin_${farFuture}_hiccup")
    unreadable.mkdirs()
    intercept[java.io.IOException] {
      Snapshot.activePins(s"$dir/layout")
    }
    assert(unreadable.exists, "the unreadable pin must be KEPT")
  }

  test("registered pin defers retention's physical day deletion until TTL") {
    val dir = tmpDir()
    val spec = Collections.ampExternal
    IngestStream.ingestBatch(batch("s1", 1704067200L), spec, // 2024-01-01
      s"$dir/streams", s"$dir/data", identity, epoch = Some(0L))
    IngestStream.ingestBatch(batch("s2", 1717200000L), spec, // 2024-06-01
      s"$dir/streams", s"$dir/data", identity, epoch = Some(1L))
    IngestStream.compactToLayout(spark, s"$dir/data", s"$dir/layout",
      settledBelow = 2L, buckets = 8)

    val snap = Snapshot.pin(s"$dir/layout", s"$dir/data", ttlMs = 10 * 60 * 1000L)
    def pinned = Snapshot.read(spark, s"$dir/layout", s"$dir/data", snap)
      .select("timestamp").as[Long].collect().sorted.toSeq

    // tombstone + TWO physical cycles: live queries lose the day at the
    // tombstone; the pinned day dir survives physical GC while pinned
    (0 until 3).foreach { _ =>
      graft.storage.Retention.expireDays(s"$dir/layout", 1709251200L)
      assert(pinned === Seq(1704067200L, 1717200000L))
    }
    assert(IngestStream.readCombined(spark, s"$dir/layout", s"$dir/data")
      .count() === 1)

    // TTL passes → the next physical cycle deletes the day and the read
    // fails the expiry contract, naming the day
    val pinsDir = new java.io.File(s"$dir/layout", "_pins")
    val pinFile = pinsDir.listFiles().filter(_.getName.startsWith("pin_")).head
    java.nio.file.Files.move(pinFile.toPath,
      new java.io.File(pinsDir,
        s"pin_${System.currentTimeMillis() - 1}_x").toPath)
    graft.storage.Retention.expireDays(s"$dir/layout", 1709251200L)
    val e = intercept[IllegalStateException] { pinned }
    assert(e.getMessage.contains("day=20240101"))
  }

  test("pin taken between tombstone and physical deletion never spuriously expires") {
    val dir = tmpDir()
    val spec = Collections.ampExternal
    IngestStream.ingestBatch(batch("s1", 1704067200L), spec, // 2024-01-01
      s"$dir/streams", s"$dir/data", identity, epoch = Some(0L))
    IngestStream.ingestBatch(batch("s2", 1717200000L), spec, // 2024-06-01
      s"$dir/streams", s"$dir/data", identity, epoch = Some(1L))
    IngestStream.compactToLayout(spark, s"$dir/data", s"$dir/layout",
      settledBelow = 2L, buckets = 8)

    // day 20240101 is tombstoned (hidden) but not yet physically deleted
    graft.storage.Retention.expireDays(s"$dir/layout", 1709251200L)
    // the pin must capture the day set NET of the tombstones: the pinned
    // read never serves 20240101, so its later physical deletion is not
    // an expiry of anything this snapshot serves
    val snap = Snapshot.pin(s"$dir/layout", s"$dir/data")
    assert(snap.sourceDays("cset=2") === Set("20240601"))
    def pinned = Snapshot.read(spark, s"$dir/layout", s"$dir/data", snap)
      .select("timestamp").as[Long].collect().sorted.toSeq
    assert(pinned === Seq(1717200000L))
    // physical phase deletes the tombstoned day — the snapshot keeps
    // serving (pre-fix: goneDays flagged the never-served day and threw)
    graft.storage.Retention.expireDays(s"$dir/layout", 1709251200L)
    assert(pinned === Seq(1717200000L))
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
