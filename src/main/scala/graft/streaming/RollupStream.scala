package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.OracleParity

/** Streaming rollup maintenance — the Spark-native form of the reference's
  * InfluxDB continuous queries (X4, /root/reference/libnntsc/influx.py:183-195):
  * 1-min bins recomputed every minute over a trailing 15 min, 1-h bins
  * hourly over a trailing 3 h — i.e. bounded late-data tolerance via
  * re-aggregation.
  *
  * Here: event-time tumbling windows with a watermark equal to the
  * reference's recompute horizon (15 min short / 3 h long). Late rows inside
  * the watermark update their bin; later rows are dropped from rollups
  * (raw appends still accept them, matching the reference: history sees
  * all data, rollups only what arrived within the horizon).
  *
  * Partials kept are the exact-decimal set of `graft.rollup.Rollup.build`
  * (count, Σv, Σv², min, max), so merged results equal raw aggregation —
  * see Rollup's scaladoc for why this beats the reference's (mean,
  * magiccount) partials.
  */
object RollupStream {

  /** Attach to a streaming frame with (stream_id, timestamp epoch-s, value)
    * and produce the streaming rollup aggregation. Caller writes it with
    * outputMode("update") (bin rows re-emitted as late data arrives) or
    * "append" (bin emitted once the watermark passes).
    */
  def rollup(events: DataFrame, binsize: Long, watermark: String, valueCol: String): DataFrame = {
    val v = col(valueCol)
    val d = OracleParity.dec(v)
    events
      .withColumn("__ts", timestamp_seconds(col("timestamp")))
      .withWatermark("__ts", watermark)
      .groupBy(
        col("stream_id"),
        window(col("__ts"), s"$binsize seconds").as("__w"))
      .agg(
        count(v).as("cnt"),
        sum(d).as("s1"),
        sum(d * d).as("s2"),
        min(v).as("mn"),
        max(v).as("mx"),
        max("timestamp").as("ts"))
      .select(
        col("stream_id"),
        col("__w.start").cast("long").as("binstart"),
        col("cnt"), col("s1"), col("s2"), col("mn"), col("mx"), col("ts"))
  }

  /** The reference's two tiers (influx.py:183-195). */
  def shortRollup(events: DataFrame, valueCol: String): DataFrame =
    rollup(events, 60, "14 minutes", valueCol)
  def longRollup(events: DataFrame, valueCol: String): DataFrame =
    rollup(events, 3600, "2 hours", valueCol)

  /** File-backed tier maintenance without watermark latency: each
    * micro-batch appends ITS OWN exact partials per (stream, bin) under an
    * `__epoch` partition (idempotent on replay, same mechanism as
    * IngestStream) — a late row simply lands another partial row in its
    * bin. The exact-partial set (cnt, Σv, Σv², min, max, ts) is closed
    * under addition, so any number of partial rows per bin folds to the
    * same numbers raw aggregation gives.
    */
  def appendPartials(
      batch: DataFrame,
      binsize: Long,
      valueCol: String,
      path: String,
      epoch: Long): Unit =
    graft.rollup.Rollup.build(batch, binsize, valueCol)
      .withColumn(IngestStream.EpochCol, lit(epoch))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(IngestStream.EpochCol)
      .parquet(path)

  /** Fold accumulated per-epoch partials back to ONE row per (stream, bin)
    * and atomically swap the tier — the reference's trailing-window CQ
    * recompute (influx.py:183-195) as a tidy periodic batch job. Readers
    * (`Rollup.merge`) are agnostic: the merge is associative, so querying
    * an uncompacted tier gives identical results; compaction only buys
    * back file count and scan width.
    *
    * Single-writer contract: run between ingest triggers (the reference's
    * CQs are likewise serialized per tier). The two-rename swap is not
    * crash-atomic on plain files — a transactional table format provides
    * that at production scale; the fold itself is what this encodes.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val df = IngestStream.readData(spark, path)
    val folded = df
      .groupBy("stream_id", "binstart")
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("s1")).cast(df.schema("s1").dataType).as("s1"),
        sum(col("s2")).cast(df.schema("s2").dataType).as("s2"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"),
        max(col("ts")).as("ts"))
      .withColumn(IngestStream.EpochCol, lit(0L))
    val tmp = path + ".compact"
    folded.write.mode("overwrite")
      .partitionBy(IngestStream.EpochCol).parquet(tmp)
    val dst = new java.io.File(path)
    val bak = new java.io.File(path + ".old")
    if (bak.exists) { bak.listFiles.foreach(deleteRec); bak.delete() }
    dst.renameTo(bak)
    new java.io.File(tmp).renameTo(dst)
    bak.listFiles.foreach(deleteRec); bak.delete()
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory && f.listFiles != null) f.listFiles.foreach(deleteRec)
    f.delete()
  }
}
