package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.IngestStream

/** A pinned, reproducible view of one collection's serving state — the
  * time-travel role the generation protocol already pays for.
  *
  * `readCombined` serves the LIVE view: newest merged generation + csets
  * above its cutoff + raw landing epochs. Every maintenance step
  * (compactToLayout, mergeCsets, retention) supersedes sources by writing
  * new ones and deleting the old only one full cycle LATER (grace GC), so
  * the exact source list a reader sees at time T keeps resolving for at
  * least one maintenance cycle. A snapshot captures that list — plus the
  * retention-tombstone set and each source's day partitions, so later
  * expirations can neither leak into nor silently hollow out a pinned
  * read — as a serializable token a training job can persist and re-read:
  * the same corpus bytes while ingest keeps landing epochs on top.
  *
  * Expiry contract (the Delta-Lake time-travel-vs-VACUUM trade): once
  * maintenance has run enough cycles that grace GC retires a pinned
  * source — a whole generation/cset/epoch, or a retention-expired day
  * INSIDE a still-live generation — `read` fails with a clear error
  * instead of serving a partial corpus. An UNREGISTERED pin (ttlMs = 0)
  * therefore lives at most one maintenance cadence — hours in practice —
  * the deliberate price of rename-free storage. A pin with `ttlMs > 0`
  * additionally lands in the layout's pin REGISTRY (`_pins/`): every
  * grace-GC phase (gcLayout, compactToLayout's epoch sweep,
  * Retention.expireDays' physical phase) consults the registry and
  * defers physical deletion of pinned sources until the TTL passes —
  * Delta's time-travel-retention analogue. The trade is disk: superseded
  * generations/csets/epochs and expired days are held for up to the TTL
  * on top of their one grace cycle (see ARCHITECTURE.md). Visibility is
  * unchanged — pinned-but-superseded sources stay invisible to live
  * readers; only the snapshot's own `read` reaches them.
  *
  * The reference has no analogue (its continuous queries serve only the
  * live state); this exists because a 100 TB training pipeline needs
  * "which exact rows did run X read" to be answerable.
  */
case class LayoutSnapshot(
    gen: Option[(Long, Long)],
    csets: Seq[Long],
    epochs: Seq[Long],
    expiredDays: Set[String],
    // day partitions per layout source ("mset=<k>" / "cset=<N>") at pin
    // time: retention's physical phase deletes day dirs INSIDE a source
    // whose top-level dir survives, so expiry must be detectable per day
    sourceDays: Map[String, Set[String]]) {

  /** Compact persistable form; inverse of [[LayoutSnapshot.fromToken]]. */
  def token: String = {
    val g = gen.map { case (k, c) => s"$k:$c" }.getOrElse("")
    val days = sourceDays.toSeq.sortBy(_._1)
      .map { case (src, ds) => s"$src:${ds.toSeq.sorted.mkString("+")}" }
      .mkString(",")
    s"gen=$g|csets=${csets.mkString(",")}|epochs=${epochs.mkString(",")}" +
      s"|expired=${expiredDays.toSeq.sorted.mkString(",")}|days=$days"
  }
}

object LayoutSnapshot {
  def fromToken(t: String): LayoutSnapshot = {
    val fields = t.split("\\|", -1).map { f =>
      val Array(k, v) = f.split("=", 2); k -> v
    }.toMap
    def longs(k: String): Seq[Long] =
      fields(k).split(",").filter(_.nonEmpty).map(_.toLong).toSeq
    LayoutSnapshot(
      gen = Some(fields("gen")).filter(_.nonEmpty).map { g =>
        val Array(k, c) = g.split(":"); (k.toLong, c.toLong)
      },
      csets = longs("csets"),
      epochs = longs("epochs"),
      expiredDays = fields("expired").split(",").filter(_.nonEmpty).toSet,
      sourceDays = fields("days").split(",").filter(_.nonEmpty).map { e =>
        val Array(src, ds) = e.split(":", 2)
        src -> ds.split("\\+").filter(_.nonEmpty).toSet
      }.toMap)
  }
}

object Snapshot {

  /** Pin registry dir under the layout root: one file per TTL'd pin,
    * named `pin_<expiryEpochMs>_<id>`, containing the snapshot token.
    */
  private[graft] val PinsDir = "_pins"

  /** Pin the current serving view as a consistent cut.
    *
    * The swap lock excludes in-JVM merge/GC, but the minor compactor
    * commits cset markers WITHOUT that lock (and other processes hold no
    * lock at all) — so consistency is optimistic: the generation and cset
    * marker sets come from ONE directory listing, the landing epochs are
    * listed against that cut's cutoff, and the marker listing is then
    * repeated; if it changed underneath, retry. A stale-but-consistent
    * cut is fine (the superseded sources live out their grace cycle); a
    * straddled cut is not (a cset plus the raw epochs it covers would
    * double-count).
    *
    * Day sets are captured NET of the already-tombstoned days (the pinned
    * read never serves those via `expiredOverride`), so a later physical
    * deletion of a day that was ALREADY expired at pin time cannot
    * spuriously expire the snapshot.
    *
    * @param ttlMs 0 (default) = unregistered pin: valid until the next
    *   maintenance cycle's grace GC, the original contract. > 0 =
    *   REGISTERED pin: lands in `_pins/` and every grace-GC phase defers
    *   physical deletion of its sources until `ttlMs` from now, after
    *   which the registry entry self-cleans and `read` fails with the
    *   expiry contract. Registration is honored by in-JVM maintenance
    *   unconditionally (the swap lock serializes pin vs gcLayout) and by
    *   the single cross-process maintenance writer on its next cycle.
    */
  def pin(layoutPath: String, dataPath: String, ttlMs: Long = 0L): LayoutSnapshot =
    IngestStream.swapLock(layoutPath).synchronized {
      var attempt = 0
      var out: Option[LayoutSnapshot] = None
      while (out.isEmpty) {
        val (msets, csets) = IngestStream.committedMarkers(layoutPath)
        val newest = msets.lastOption
        val floor = newest.map(_._2).getOrElse(Long.MinValue)
        val liveCsets = csets.filter(_ > floor)
        val cutoff = (csets ++ msets.map(_._2)).foldLeft(0L)(math.max)
        val epochs = {
          val d = new java.io.File(dataPath)
          if (!d.exists || d.listFiles == null) Nil
          else d.listFiles.toSeq
            .filter(f => f.isDirectory &&
              f.getName.startsWith(s"${IngestStream.EpochCol}="))
            .map(_.getName.stripPrefix(s"${IngestStream.EpochCol}=").toLong)
            .filter(_ >= cutoff)
            .sorted
        }
        if (IngestStream.committedMarkers(layoutPath) == ((msets, csets))) {
          val expired = Retention.expiredDays(layoutPath)
          val srcNames = newest.map { case (k, _) => s"mset=$k" }.toSeq ++
            liveCsets.map(c => s"cset=$c")
          out = Some(LayoutSnapshot(
            newest, liveCsets, epochs, expired,
            srcNames.map(n => n -> (dayDirs(s"$layoutPath/$n") -- expired)).toMap))
        } else {
          attempt += 1
          if (attempt > 5) throw new IllegalStateException(
            s"Snapshot.pin: the committed marker set of $layoutPath kept " +
              "changing across 5 attempts — compactor running hot; retry " +
              "when maintenance is not committing continuously")
        }
      }
      val snap = out.get
      if (ttlMs > 0) {
        val dir = new java.io.File(layoutPath, PinsDir)
        dir.mkdirs()
        val id = java.util.UUID.randomUUID().toString.take(8)
        // write-then-ATOMIC_MOVE: a pin_* name must never be visible
        // half-written — activePins runs lock-free from every maintenance
        // cycle (and from other processes), and a truncated token there
        // would wedge compaction/retention until this pin's expiry
        val tmp = new java.io.File(dir, s".pin_tmp_$id").toPath
        java.nio.file.Files.writeString(tmp, snap.token)
        java.nio.file.Files.move(
          tmp,
          new java.io.File(dir,
            s"pin_${System.currentTimeMillis() + ttlMs}_$id").toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      snap
    }

  /** The union of sources protected by unexpired registry pins. Expired
    * pin files are deleted here — every GC consult is also the registry's
    * self-clean, so a pin expires without a dedicated reaper.
    */
  private[graft] case class PinnedSources(
      msets: Set[Long], csets: Set[Long], epochs: Set[Long], days: Set[String]) {
    def isEmpty: Boolean =
      msets.isEmpty && csets.isEmpty && epochs.isEmpty && days.isEmpty
  }

  private[graft] def activePins(
      layoutPath: String,
      nowMs: Long = System.currentTimeMillis()): PinnedSources = {
    val dir = new java.io.File(layoutPath, PinsDir)
    val files =
      if (!dir.exists || dir.listFiles == null) Seq.empty[java.io.File]
      else dir.listFiles.toSeq.filter(_.getName.startsWith("pin_"))
    var acc = PinnedSources(Set.empty, Set.empty, Set.empty, Set.empty)
    files.foreach { f =>
      // a pin that fails to parse (name or token) can only be a corrupted
      // file or a dead partial write from before pins committed via
      // ATOMIC_MOVE — no live writer produces one. Remove it and keep the
      // maintenance cycle alive: an exception here used to wedge
      // compaction AND retention for the pin's full TTL.
      try {
        val expiry = f.getName.split("_")(1).toLong
        if (expiry <= nowMs) f.delete() // clean expiry
        else {
          // a transient READ failure (disk hiccup, interrupt, fd
          // exhaustion) on a healthy pin must neither delete it NOR let
          // this GC consult run without its exclusions — either way the
          // next destructive pass could reap data a live snapshot still
          // references. Rethrow: the caller's maintenance cycle aborts
          // and retries next round (transient errors self-heal; only a
          // read that SUCCEEDED but does not parse is a corrupt pin,
          // and only THAT repeats every cycle — the wedge the delete
          // below exists for).
          val token =
            try java.nio.file.Files.readString(f.toPath)
            catch {
              case io: java.io.IOException =>
                throw new java.io.IOException(
                  s"pin ${f.getName} unreadable (transient?) — " +
                    "aborting this GC consult, pins kept", io)
            }
          val snap = LayoutSnapshot.fromToken(token)
          acc = PinnedSources(
            acc.msets ++ snap.gen.map(_._1),
            acc.csets ++ snap.csets,
            acc.epochs ++ snap.epochs,
            acc.days ++ snap.sourceDays.values.flatten)
        }
      } catch {
        case io: java.io.IOException => throw io
        case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[snapshot] dropping malformed pin ${f.getName}: ${e.getMessage}")
          f.delete()
      }
    }
    acc
  }

  /** Read EXACTLY the pinned sources. Fails fast with the expiry contract
    * in the message when grace GC has retired any of them — a whole
    * source dir, or a retention-expired day inside one. The plan build
    * holds the swap lock for the same reason readCombined's does: an
    * in-JVM merge's grace GC must not delete a just-verified source
    * between the existence check and Spark's file listing.
    */
  def read(
      spark: SparkSession,
      layoutPath: String,
      dataPath: String,
      snap: LayoutSnapshot): DataFrame =
    IngestStream.swapLock(layoutPath).synchronized {
      val pinnedDirs =
        snap.gen.map { case (k, _) => s"$layoutPath/mset=$k" }.toSeq ++
          snap.csets.map(c => s"$layoutPath/cset=$c") ++
          snap.epochs.map(e => s"$dataPath/${IngestStream.EpochCol}=$e")
      val gone = pinnedDirs.filterNot(p => new java.io.File(p).exists)
      val goneDays = snap.sourceDays.toSeq.flatMap { case (src, days) =>
        val now = dayDirs(s"$layoutPath/$src")
        (days -- now).toSeq.sorted.map(d => s"$src/day=$d")
      }
      if (gone.nonEmpty || goneDays.nonEmpty) throw new IllegalStateException(
        s"snapshot expired: maintenance GC retired pinned sources " +
          s"${(gone ++ goneDays).mkString(", ")} — snapshots outlive at " +
          "most one maintenance cycle (grace-GC contract); re-pin and re-read")
      val settled = IngestStream.readLayoutSources(
        spark, layoutPath, snap.gen, snap.csets,
        expiredOverride = Some(snap.expiredDays))
      val raw =
        if (snap.epochs.isEmpty) None
        else Some(
          spark.read
            .option("basePath", dataPath)
            .parquet(snap.epochs.map(e =>
              s"$dataPath/${IngestStream.EpochCol}=$e"): _*)
            .drop(IngestStream.EpochCol))
      (settled, raw) match {
        case (Some(s), Some(r)) => s.unionByName(r, allowMissingColumns = true)
        case (Some(s), None)    => s
        case (None, Some(r))    => r
        case (None, None) =>
          throw new NoSuchElementException(
            s"snapshot of $layoutPath/$dataPath pinned no sources")
      }
    }

  /** Day partitions of one layout source dir (layout shape:
    * `<src>/sbucket=<b>/day=<yyyyMMdd>/…`).
    */
  private def dayDirs(srcPath: String): Set[String] = {
    val d = new java.io.File(srcPath)
    if (!d.exists || d.listFiles == null) Set.empty
    else d.listFiles.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("sbucket="))
      .flatMap { b =>
        val fs = b.listFiles
        if (fs == null) Seq.empty[java.io.File] else fs.toSeq
      }
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
      .map(_.getName.stripPrefix("day="))
      .toSet
  }
}
