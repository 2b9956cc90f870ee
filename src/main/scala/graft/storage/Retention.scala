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

  /** Drop day partitions strictly older than `cutoffEpoch`'s UTC day.
    * Returns the dropped partition directory names.
    */
  def expireDays(path: String, cutoffEpoch: Long): Seq[String] = {
    val cutoffDay = LocalDate.ofEpochDay(cutoffEpoch / 86400).format(DayFmt)
    val root = new java.io.File(path)
    if (!root.exists) return Nil
    val dropped = Seq.newBuilder[String]
    def walk(dir: java.io.File): Unit =
      dir.listFiles().foreach { f =>
        if (f.isDirectory) {
          val name = f.getName
          if (name.startsWith("day=") && name.stripPrefix("day=") < cutoffDay) {
            delete(f)
            dropped += name
          } else walk(f)
        }
      }
    walk(root)
    dropped.result().distinct.sorted
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
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
