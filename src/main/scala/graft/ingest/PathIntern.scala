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

  /** X7 — the ingest-side path→id memo with the reference's lifecycle
    * (amp_traceroute.py:51-54, 530-543, 536-559):
    *
    *   - lookups against the durable dimension are memoized so repeat
    *     paths in later batches skip the anti-join entirely (the common
    *     case: routes are stable);
    *   - ids allocated in a batch are PENDING until `commit()` — a failed
    *     batch cannot poison the cache with ids that never reached storage
    *     (the reference's pending_paths → post_commit promotion);
    *   - `flush(now)` evicts entries unused for longer than the TTL
    *     (hourly in the reference; 3× for IP paths), bounding driver
    *     memory however many distinct paths a 100 TB backfill interns.
    *
    * Driver-side by design, like the streams dimension: the memo fronts a
    * broadcast-size dimension, it is not the data path.
    */
  final class TtlCache(ttlSeconds: Long) {
    private val committed = scala.collection.mutable.HashMap[Seq[Any], (Int, Long)]()
    private val pending = scala.collection.mutable.HashMap[Seq[Any], Int]()

    /** Known committed id for a path, refreshing its last-used time. */
    def lookup(path: Seq[Any], now: Long): Option[Int] =
      committed.get(path).map { case (id, _) =>
        committed.update(path, (id, now))
        id
      }

    /** Record ids allocated this batch; invisible until commit(). */
    def stage(path: Seq[Any], id: Int): Unit = pending.update(path, id)

    /** Batch committed: promote pending entries (post_commit analog). */
    def commit(now: Long): Unit = {
      pending.foreach { case (p, id) => committed.update(p, (id, now)) }
      pending.clear()
    }

    /** Batch failed: drop staged ids (they never reached storage). */
    def abort(): Unit = pending.clear()

    /** Evict entries idle past the TTL (amp_traceroute.py:544-559). */
    def flush(now: Long): Unit =
      committed.filterInPlace { case (_, (_, last)) => last + ttlSeconds >= now }

    def size: Int = committed.size
  }

  /** Cache-fronted upsert: paths already memoized skip the dimension
    * anti-join; only genuinely-unseen paths go through `intern`, and their
    * new ids are staged in the cache for post-commit promotion.
    */
  def internCached(
      existing: DataFrame,
      batchPaths: DataFrame,
      cache: TtlCache,
      now: Long,
      pathCol: String = "path"): DataFrame = {
    val distinctPaths = batchPaths
      .select(col(pathCol))
      .filter(col(pathCol).isNotNull)
      .distinct()
      .collect()
      .map(_.getSeq[Any](0))
    val unknown = distinctPaths.filter(p => cache.lookup(p, now).isEmpty)
    if (unknown.isEmpty) existing
    else {
      val spark = existing.sparkSession
      import scala.jdk.CollectionConverters._
      val fresh = spark.createDataFrame(
        unknown.map(p => org.apache.spark.sql.Row(p)).toList.asJava,
        new org.apache.spark.sql.types.StructType().add(
          pathCol, existing.schema(pathCol).dataType))
      val updated = intern(existing, fresh, pathCol)
      updated
        .join(fresh.withColumnRenamed(pathCol, "path"), Seq("path"), "left_semi")
        .collect()
        .foreach(r => cache.stage(
          r.getSeq[Any](r.fieldIndex("path")), r.getInt(r.fieldIndex("path_id"))))
      updated
    }
  }

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
