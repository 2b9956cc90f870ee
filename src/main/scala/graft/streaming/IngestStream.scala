package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.Catalog
import graft.schema.CollectionSpec

/** Structured-Streaming ingest — the Spark-native form of the reference's
  * RabbitMQ consumer loop (S1, /root/reference/libnntsc/parsers/amp.py:181-273
  * + pikaqueue.py) and its transactional batch-commit contract (X9).
  *
  * Shape: source stream → per-batch (foreachBatch):
  *   1. resolve/register streams (X6, database.py:731-787): anti-join the
  *      batch's property tuples against the streams dimension, allocate ids
  *      for new tuples, rewrite the (broadcast-size) dimension;
  *   2. normalize rows (the per-collection A15-A17 reductions, applied by
  *      the caller's `normalize` function);
  *   3. append to the partitioned data table.
  *
  * Exactly-once: checkpointed offsets + idempotent append per epoch replace
  * the reference's commit+ack (at-least-once with redelivery,
  * amp.py:190-273). `commitfreq`-style batching maps to the micro-batch
  * trigger.
  *
  * The RRD file scraper (S2, parsers/rrd.py:107-238) is the same shape with
  * a file source: `spark.readStream.schema(…).parquet/csv(dir)` +
  * `Trigger.ProcessingTime("30 seconds")` — checkpointed file offsets
  * replace the reference's lasttimestamp/revert bookkeeping.
  */
object IngestStream {

  /** Streams-dimension storage: tiny parquet table rewritten per batch
    * (dimension is broadcast-size by design; the fact table is the big one).
    */
  def readStreams(spark: SparkSession, path: String, spec: CollectionSpec): DataFrame = {
    val p = new java.io.File(path)
    if (p.exists && p.listFiles != null && p.listFiles.exists(_.getName.endsWith(".parquet")))
      spark.read.parquet(path)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], spec.streamSchema)
  }

  private def writeStreams(streams: DataFrame, path: String): Unit = {
    // small dimension: collect → rewrite atomically via temp dir rename
    val spark = streams.sparkSession
    val rows = streams.collect().toSeq
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), streams.schema)
    val tmp = path + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    val dst = new java.io.File(path)
    if (dst.exists) {
      dst.listFiles.foreach(_.delete()); dst.delete()
    }
    new java.io.File(tmp).renameTo(dst)
  }

  /** Start the ingest query. `raw` is a streaming DataFrame of decoded
    * results carrying the collection's stream-property columns plus
    * measurement columns; `normalize` maps a static batch of raw rows to
    * normalized data rows (must keep the property columns for stream
    * resolution).
    */
  def start(
      raw: DataFrame,
      spec: CollectionSpec,
      streamsPath: String,
      dataPath: String,
      checkpointPath: String,
      normalize: DataFrame => DataFrame = identity,
      // continuous micro-batches by default; pass Trigger.AvailableNow()
      // for run-to-completion backfill jobs (it snapshots the offsets
      // available AT START — data arriving later waits for the next run)
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    raw.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, spec, streamsPath, dataPath, normalize)
      }
      .start()

  /** One transactional micro-batch (also callable on static frames for
    * backfill). */
  def ingestBatch(
      batch: DataFrame,
      spec: CollectionSpec,
      streamsPath: String,
      dataPath: String,
      normalize: DataFrame => DataFrame): Unit = {
    val spark = batch.sparkSession
    val existing = readStreams(spark, streamsPath, spec)
    val updated = Catalog.registerStreams(existing, batch, spec)
    writeStreams(updated, streamsPath)
    val streams = spark.read.parquet(streamsPath)
    val resolved = Catalog.resolveStreamIds(normalize(batch), streams, spec)
    val dataCols = spec.dataSchema.fieldNames.filter(resolved.columns.contains)
    resolved
      .select(dataCols.map(col): _*)
      .write
      .mode("append")
      .parquet(dataPath)
  }
}
