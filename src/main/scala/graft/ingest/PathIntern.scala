package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Traceroute path/AS-path dimension interning — the Spark-native form of
  * the reference's "join-or-insert" CTE upsert
  * (/root/reference/libnntsc/parsers/amp_traceroute.py:279-340) and its
  * in-memory TTL cache (X7, amp_traceroute.py:51-54, 536-559).
  *
  * A path dimension row is (path_id, path: array, length); data rows carry
  * only path_id (J2's query-side left joins re-expand them). Interning a
  * batch = anti-join new distinct paths against the dimension, allocate ids
  * deterministically, union. Runs inside the ingest foreachBatch — at
  * scale this is Delta MERGE WHEN NOT MATCHED; on plain parquet the
  * dimension table is rewritten like the streams table (broadcast-size).
  */
object PathIntern {

  /** Upsert: returns the updated dimension (path_id, path, length). */
  def intern(existing: DataFrame, batchPaths: DataFrame, pathCol: String = "path"): DataFrame = {
    val fresh = batchPaths
      .select(col(pathCol).as("path"))
      .filter(col("path").isNotNull)
      .distinct()
      .join(existing.select(col("path")), Seq("path"), "left_anti")
    val maxId = existing
      .agg(coalesce(max(col("path_id")), lit(0)).as("m"))
      .collect()(0).getAs[Number]("m").intValue()
    // distributed deterministic allocation (no single-partition window —
    // a traceroute backfill can intern millions of new paths in batch 1)
    val assigned = graft.catalog.Ids
      .assignSequential(fresh, Seq("path"), maxId.toLong, "path_id")
      .withColumn("path_id", col("path_id").cast("int"))
      .withColumn("length", size(col("path")))
      .select("path_id", "path", "length")
    existing.select("path_id", "path", "length").unionByName(assigned)
  }

  /** Resolve data rows' path arrays to interned ids (the ingest-side
    * lookup, equi-join on the array value, amp_traceroute.py:289-309).
    */
  def resolve(rows: DataFrame, dim: DataFrame, pathCol: String = "path"): DataFrame =
    rows.join(
      broadcast(dim.select(col("path_id"), col("path").as(pathCol))),
      Seq(pathCol),
      "left_outer")

  /** Query-side expansion (J2, amp_traceroute.py:662-703): data LEFT JOIN
    * paths LEFT JOIN aspaths exposing the reference's output columns.
    */
  def expand(data: DataFrame, paths: DataFrame, aspaths: DataFrame): DataFrame =
    data
      .join(broadcast(paths.select(
        col("path_id"), col("path"), col("length"))), Seq("path_id"), "left_outer")
      .join(broadcast(aspaths.select(
        col("aspath_id"), col("aspath"), col("aspath_length"),
        col("uniqueas"), col("responses"))), Seq("aspath_id"), "left_outer")
}
