package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus batched per-partition
  * "decode"/feature-extract operators.
  *
  * The decode step is a clearly-marked STUB — the container has no
  * image/audio codecs — producing deterministic fake features. Everything
  * around it (schema, binary columns, partition-batched execution shape,
  * metadata struct) is the real 100 TB design: payloads never shuffle except
  * where a transform requires it, and feature extraction runs as a
  * per-partition batch (the Scala analogue of `mapInPandas` batching).
  */
object Multimodal {

  final case class MediaRow(media_id: Long, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Int,
      byte_sum: Long,
      head_byte: Int)

  /** Synthesize a media table from the documents corpus: payload = UTF-8
    * bytes standing in for encoded media; meta = typed metadata struct.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("n_chars").as("size_bytes"),
        col("source").as("origin"),
        col("lang").as("codec")).as("meta"))

  /** Column-level metadata extraction — pure codegen'd expressions, no
    * shuffle, payload column pruned if the caller drops it.
    */
  def extractMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      length(col("payload")).as("n_bytes"),
      substring(col("payload"), 1, 8).cast("string").as("header"),
      md5(col("payload")).as("checksum"),
      col("meta.origin").as("origin"))

  /** Batched per-partition feature extraction (the mapInPandas-shaped
    * path). ===== DECODE STUB =====: a real implementation would hand each
    * partition's payload batch to a codec (JPEG decode, resample, …); this
    * container has none, so features are a deterministic fake (byte sum /
    * head byte). The iterator-in/iterator-out shape, encoder-backed schema
    * and partition batching are the real design.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          var s = 0L
          var i = 0
          while (i < r.payload.length) { s += r.payload(i) & 0xff; i += 1 }
          MediaFeatures(
            r.media_id,
            r.payload.length,
            s,
            if (r.payload.nonEmpty) r.payload(0) & 0xff else -1)
        }
      }
  }

  /** "Resize" analogue: average-pool the payload down to a FIXED target
    * length — stands in for image resizing to a model's input resolution
    * (every row leaves with the same shape, the property resize exists
    * for). ===== DECODE STUB =====: a real implementation decodes and
    * resamples pixels; the fixed-output-shape contract, binary batching
    * and per-partition execution are the real design.
    */
  def resizeStub(spark: SparkSession, media: DataFrame, targetLen: Int): DataFrame = {
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val out = new Array[Byte](targetLen)
        val n = r.payload.length
        if (n > 0) {
          var b = 0
          while (b < targetLen) {
            val lo = (b.toLong * n / targetLen).toInt
            val hi = math.max(lo + 1, ((b + 1).toLong * n / targetLen).toInt)
            var s = 0L
            var i = lo
            while (i < hi) { s += r.payload(i) & 0xff; i += 1 }
            out(b) = (s / (hi - lo)).toByte
            b += 1
          }
        }
        (r.media_id, out)
      })
      .toDF("media_id", "resized")
  }

  /** "Frame sampling" analogue: keep every k-th byte of the payload —
    * stands in for temporal downsampling of audio/video, preserving the
    * binary-in/binary-out operator shape.
    */
  def sampleBytes(spark: SparkSession, media: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val out = Array.newBuilder[Byte]
        var i = 0
        while (i < r.payload.length) { out += r.payload(i); i += k }
        (r.media_id, out.result())
      })
      .toDF("media_id", "sampled")
  }
}
