package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the ingest-side gate of a training-data
  * pipeline: a document stream is admitted only the first time its content
  * is seen, BEFORE it costs downstream storage/compute. Batch dedup
  * (`Dedup.exact`) cleans a corpus after the fact; this keeps one from
  * accumulating.
  *
  * Spark-native shape: the fused `TextFingerprint` normalizes and hashes
  * each document in one pass (formatting noise collapses to the same
  * fingerprint), then Structured Streaming's stateful `dropDuplicates`
  * keeps one state-store entry per fingerprint. State grows with distinct
  * content; at 100 TB use the watermarked variant — duplicates of a
  * document arriving within the horizon are dropped, state older than the
  * horizon is evicted (the standard unbounded-state escape hatch; the
  * RocksDB state backend carries it on a real cluster).
  */
object StreamingDedup {

  val FingerprintCol = "fingerprint"

  /** Admit only the first document per normalized-content fingerprint,
    * forever (state never evicted — bounded-corpus / backfill use).
    */
  def exactDedupStream(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn(FingerprintCol, graft.functions.TextFingerprint(col(textCol)))
      .dropDuplicates(FingerprintCol)

  /** Watermarked variant: `eventTimeCol` (timestamp type) carries the
    * document's event time; duplicates arriving within `horizon` of each
    * other are dropped, and fingerprint state older than the watermark is
    * evicted — state stays bounded by the horizon's distinct-content rate.
    */
  def exactDedupStreamWithin(
      docs: DataFrame,
      textCol: String,
      eventTimeCol: String,
      horizon: String): DataFrame =
    docs
      .withColumn(FingerprintCol, graft.functions.TextFingerprint(col(textCol)))
      .withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark(FingerprintCol)
}
