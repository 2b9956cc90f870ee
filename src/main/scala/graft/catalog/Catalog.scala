package graft.catalog

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.{Collections, CollectionSpec}

/** Collection/stream catalog — the Spark-native registry replacing the
  * reference's `collections` table and per-collection streams tables
  * (/root/reference/libnntsc/database.py:296-364, 558-618).
  *
  * Streams tables are broadcast-size dimensions (thousands of rows); the
  * fact tables are partitioned by stream_id bucket + time, so stream
  * membership predicates prune partitions instead of synthesizing UNIONs
  * (dbselect.py:633-647 → obsolete).
  */
object Catalog {

  /** The collections registry (id, module, modsubtype) — ids assigned by
    * registry order, as the reference's serial column would.
    */
  def collectionsTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Collections.all.zipWithIndex
      .map { case (s, i) => (i + 1, s.module, s.modsubtype) }
      .toDF("id", "module", "modsubtype")
  }

  /** Stream registration with property-tuple dedupe (X6,
    * database.py:731-787): incoming candidate streams are anti-joined
    * against the existing dimension on the collection's unique columns;
    * genuinely-new tuples get ids above the current maximum, assigned
    * deterministically by unique-column order. Returns the updated streams
    * table. Run inside the ingest `foreachBatch` transaction at scale.
    */
  def registerStreams(
      existing: DataFrame,
      incoming: DataFrame,
      spec: CollectionSpec): DataFrame =
    existing.unionByName(newStreams(existing, incoming, spec))

  /** Just the genuinely-new streams of a batch, with ids assigned above the
    * existing maximum — the incremental-dimension-append building block:
    * the ingest hot path appends ONLY these rows (O(|new|) per batch)
    * instead of rewriting the dimension (O(|dimension|), and it collected
    * the whole table to the driver first).
    */
  def newStreams(
      existing: DataFrame,
      incoming: DataFrame,
      spec: CollectionSpec): DataFrame = {
    val keys = spec.uniqueColumns
    val fresh = incoming
      .select(keys.map(col): _*)
      .distinct()
      .join(existing, keys, "left_anti")
    val maxId = existing
      .agg(coalesce(max(col("stream_id")), lit(0)).as("m"))
      .collect()(0).getAs[Number]("m").intValue()
    // distributed deterministic allocation (no single-partition window —
    // first backfill may register millions of streams in one batch)
    Ids
      .assignSequential(fresh, keys, maxId.toLong, "stream_id")
      .withColumn("stream_id", col("stream_id").cast("int"))
      .select(existing.columns.toIndexedSeq.map(col): _*)
  }

  /** Resolve stream ids for result rows by their property tuple (the
    * ingest-path lookup, parsers/common.py:177-215) — a broadcast join.
    */
  def resolveStreamIds(
      rows: DataFrame,
      streams: DataFrame,
      spec: CollectionSpec): DataFrame =
    rows.join(broadcast(streams), spec.uniqueColumns)
}
