package graft.storage

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retention + stream-activity statistics over the Layout scheme.
  *
  *   - X5 retention (influx.py:236-274; conf/nntsc.conf:25): raw 365 d,
  *     1-h rollups 48 h, 1-min rollups 2 h. Under day-partitioned parquet
  *     an expiry is a METADATA operation — whole `day=` directories are
  *     dropped, no rewrite of surviving data.
  *   - X8 last-timestamp cache (streamcache.py:55-142): the per-stream
  *     first/last timestamps the reference kept in memcached fall out of a
  *     single grouped scan (or, at query time, parquet min/max footers do
  *     the pruning for free — the stats table exists for the RRD-resume and
  *     activity-report use cases).
  */
object Retention {

  private val DayFmt = DateTimeFormatter.ofPattern("yyyyMMdd")

  /** Expire day partitions strictly older than `cutoffEpoch`'s UTC day,
    * with the same TOMBSTONE-then-grace-delete discipline as the layout
    * merge protocol (deleting a directory a recent reader plan still
    * lists breaks its scan; object stores have no safer rename):
    *
    *   - phase A: physically delete the day dirs tombstoned by a
    *     PREVIOUS cycle (their `_expired_day_<day>` marker is at least
    *     one maintenance cycle old — the reader grace window);
    *   - phase B: write tombstone markers for newly aged days. The
    *     marker IS the visibility flip: the serving reader
    *     (`IngestStream.readCombined`) prunes tombstoned days as a
    *     metadata-only partition filter, so the data disappears from
    *     queries NOW while the files linger one cycle for in-flight
    *     scans.
    *
    * Returns the newly tombstoned partition names (the cycle's
    * visibility change). Late re-arrivals of an already-GC'd day become
    * visible until the next cycle re-tombstones them — the reference's
    * retention behaves the same way.
    *
    * Registry-pinned days (Snapshot.pin ttlMs > 0) defer PHYSICAL
    * deletion only: the tombstone still hides them from live queries
    * immediately; their dirs (and their markers, so a later cycle
    * retries) survive until the pin's TTL passes. The pin's day set is
    * the union across its sources — deliberately coarse: a day name
    * pinned by any source defers that day everywhere in this layout,
    * which can only over-retain, never leak.
    */
  def expireDays(path: String, cutoffEpoch: Long): Seq[String] = {
    val cutoffDay = LocalDate.ofEpochDay(cutoffEpoch / 86400).format(DayFmt)
    val root = new java.io.File(path)
    if (!root.exists) return Nil

    // phase A: grace elapsed — delete dirs, then their markers. Holds the
    // layout's swap lock: in-JVM readers (readCombined, Snapshot.read)
    // build their plans under that lock on the contract that no GC can
    // delete a just-verified source mid-listing — retention's physical
    // deletion is GC like any other and must honor the same exclusion
    // (tombstoned days are pruned from reader plans AFTER Spark lists the
    // partition dirs, so an unlocked delete here could race the listing).
    val prior = expiredDays(path)
    if (prior.nonEmpty)
      graft.streaming.IngestStream.swapLock(path).synchronized {
        val pinnedDays = Snapshot.activePins(path).days
        val deletable = prior -- pinnedDays
        def gc(dir: java.io.File): Unit =
          files(dir).foreach { f =>
            if (f.isDirectory) {
              if (f.getName.startsWith("day=") &&
                  deletable(f.getName.stripPrefix("day="))) delete(f)
              else gc(f)
            }
          }
        gc(root)
        deletable.foreach(d => new java.io.File(root, s"$MarkerPrefix$d").delete())
      }

    // phase B: tombstone newly aged days
    val aged = scala.collection.mutable.SortedSet.empty[String]
    def walk(dir: java.io.File): Unit =
      files(dir).foreach { f =>
        if (f.isDirectory) {
          val name = f.getName
          if (name.startsWith("day=") && name.stripPrefix("day=") < cutoffDay)
            aged += name.stripPrefix("day=")
          else walk(f)
        }
      }
    walk(root)
    aged.foreach(d => new java.io.File(root, s"$MarkerPrefix$d").createNewFile())
    aged.toSeq.map(d => s"day=$d")
  }

  private val MarkerPrefix = "_expired_day_"

  /** Days tombstoned by a previous [[expireDays]] cycle — hidden from
    * queries, files pending grace-period GC.
    */
  def expiredDays(path: String): Set[String] = {
    val root = new java.io.File(path)
    if (!root.exists || root.listFiles == null) Set.empty
    else root.listFiles.toSeq
      .map(_.getName)
      .filter(_.startsWith(MarkerPrefix))
      .map(_.stripPrefix(MarkerPrefix))
      .toSet
  }

  /** listFiles() returns null on I/O error or when the directory vanishes
    * between the isDirectory check and the listing (a concurrent
    * compactor's own GC on an overlapping tree) — every walker here must
    * tolerate that, like the delete helpers elsewhere in the codebase do.
    */
  private def files(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) files(f).foreach(delete)
    f.delete()
  }

  /** Per-stream activity stats (first/last timestamp + row count). */
  def streamStats(data: DataFrame): DataFrame =
    data
      .groupBy("stream_id")
      .agg(
        min("timestamp").as("first_timestamp"),
        max("timestamp").as("last_timestamp"),
        count(lit(1)).as("n_rows"))
}
