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
  * retention-tombstone set, so later expirations don't leak into a pinned
  * read — as a serializable token a training job can persist and re-read:
  * the same corpus bytes while ingest keeps landing epochs on top.
  *
  * Expiry contract (the Delta-Lake time-travel-vs-VACUUM trade): once
  * maintenance has run enough cycles that grace GC retires a pinned
  * source, `read` fails with a clear error instead of serving a partial
  * corpus. Pin lifetime is therefore the maintenance cadence — hours in
  * practice — which is the deliberate price of rename-free storage; jobs
  * needing longer pins re-pin per run.
  *
  * The reference has no analogue (its continuous queries serve only the
  * live state); this exists because a 100 TB training pipeline needs
  * "which exact rows did run X read" to be answerable.
  */
case class LayoutSnapshot(
    gen: Option[(Long, Long)],
    csets: Seq[Long],
    epochs: Seq[Long],
    expiredDays: Set[String]) {

  /** Compact persistable form; inverse of [[LayoutSnapshot.fromToken]]. */
  def token: String = {
    val g = gen.map { case (k, c) => s"$k:$c" }.getOrElse("")
    s"gen=$g|csets=${csets.mkString(",")}|epochs=${epochs.mkString(",")}" +
      s"|expired=${expiredDays.toSeq.sorted.mkString(",")}"
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
      expiredDays = fields("expired").split(",").filter(_.nonEmpty).toSet)
  }
}

object Snapshot {

  /** Pin the current serving view. Runs under the layout's swap lock —
    * the same exclusion every live plan-build uses — so the captured
    * source list is a consistent cut, never halfway through a merge
    * commit or a GC sweep.
    */
  def pin(layoutPath: String, dataPath: String): LayoutSnapshot =
    IngestStream.swapLock(layoutPath).synchronized {
      val cutoff = IngestStream.layoutCutoff(layoutPath)
      val (newest, csets) = IngestStream.visibleSources(layoutPath)
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
      LayoutSnapshot(newest, csets, epochs, Retention.expiredDays(layoutPath))
    }

  /** Read EXACTLY the pinned sources. Fails fast with the expiry contract
    * in the message when grace GC has retired any of them.
    */
  def read(
      spark: SparkSession,
      layoutPath: String,
      dataPath: String,
      snap: LayoutSnapshot): DataFrame = {
    val missing =
      snap.gen.map { case (k, _) => s"$layoutPath/mset=$k" }.toSeq ++
        snap.csets.map(c => s"$layoutPath/cset=$c") ++
        snap.epochs.map(e => s"$dataPath/${IngestStream.EpochCol}=$e")
    val gone = missing.filterNot(p => new java.io.File(p).exists)
    if (gone.nonEmpty) throw new IllegalStateException(
      s"snapshot expired: maintenance GC retired pinned sources " +
        s"${gone.mkString(", ")} — snapshots outlive at most one " +
        "maintenance cycle (grace-GC contract); re-pin and re-read")
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
}
