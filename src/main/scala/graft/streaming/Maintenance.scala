package graft.streaming

import org.apache.spark.sql.SparkSession

/** One-call periodic storage upkeep for a collection — the reference's
  * cron-side maintenance (Postgres vacuum/partition drops, Influx CQ +
  * retention enforcement, influx.py:236-274) as a single idempotent entry
  * point a scheduler invokes between micro-batches:
  *
  *   1. minor compaction: settled ingest epochs fold into the Layout
  *      table ([[IngestStream.compactToLayout]]);
  *   2. major compaction: once the committed cset count passes
  *      `mergeWhenCsetsExceed`, fold them into one
  *      ([[IngestStream.mergeCsets]] — bounds directory/file growth);
  *   3. streams dimension: per-batch append files fold into one
  *      ([[IngestStream.compactStreams]]);
  *   4. rollup tiers: partial epochs fold into their running fold
  *      ([[RollupStream.compact]]);
  *   5. retention: day partitions older than the horizon drop as a
  *      metadata-only delete ([[graft.storage.Retention.expireDays]]).
  *
  * Every step is individually crash-atomic (commit markers / WAL intent /
  * swap-and-restore), so a crash mid-run loses nothing and the next run
  * converges. Single maintenance writer per collection across processes —
  * the same deployment contract as the underlying compactors.
  */
object Maintenance {

  /** @param settledBelow ingest epochs strictly below this are settled
    *                     (the streaming query's retry window has passed)
    * @param retainCutoffEpoch drop day partitions strictly older than
    *                          this epoch's UTC day, when set
    */
  final case class Config(
      streamsPath: String,
      dataPath: String,
      layoutPath: String,
      settledBelow: Long,
      tierPaths: Seq[String] = Nil,
      buckets: Int = graft.storage.Layout.DefaultBuckets,
      mergeWhenCsetsExceed: Int = 8,
      retainCutoffEpoch: Option[Long] = None)

  /** Run one maintenance cycle; returns the day partitions retention
    * dropped (empty when retention is off or nothing aged out).
    */
  def run(spark: SparkSession, cfg: Config): Seq[String] = {
    IngestStream.compactToLayout(
      spark, cfg.dataPath, cfg.layoutPath, cfg.settledBelow, cfg.buckets)
    // grace-period GC runs EVERY cycle (not only when a merge triggers),
    // so a committed merge's covered csets retire one cycle later even in
    // steady state; the trigger counts only the VISIBLE unmerged csets
    IngestStream.gcLayout(cfg.layoutPath)
    if (IngestStream.visibleSources(cfg.layoutPath)._2.size > cfg.mergeWhenCsetsExceed)
      IngestStream.mergeCsets(spark, cfg.layoutPath, cfg.buckets)
    IngestStream.compactStreams(spark, cfg.streamsPath)
    cfg.tierPaths.foreach(p => RollupStream.compact(spark, p))
    cfg.retainCutoffEpoch
      .map(graft.storage.Retention.expireDays(cfg.layoutPath, _))
      .getOrElse(Nil)
  }
}
