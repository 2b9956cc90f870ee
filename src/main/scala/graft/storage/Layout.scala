package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout of a collection's data table — the 100 TB replacement
  * for the reference's table-per-stream scheme (database.py:621-632) and
  * its hand-rolled pruning (dbselect.py:576-612, 674-723):
  *
  *   path/sbucket=<hash(stream_id) % B>/day=<yyyyMMdd>/part-*.parquet
  *
  *   - stream-bucket partitioning bounds partition counts at any stream
  *     cardinality (thousands of streams → B buckets, not B tables) while
  *     `stream_id IN (…)` predicates still prune to |ids| buckets;
  *   - day partitioning prunes time ranges at the directory level; inside
  *     files, rows are sorted by (stream_id, timestamp) so parquet row-group
  *     min/max statistics prune further (the reference's memcached
  *     first/last-timestamp cache, for free);
  *   - writers `sortWithinPartitions` to keep row groups tight and files
  *     few (the reference's per-stream-table timestamp index,
  *     database.py:880-882, becomes the sort order).
  */
object Layout {

  val DefaultBuckets = 64

  /** Bucket hash over stream_id CAST TO LONG: `hash()` dispatches on the
    * input type (Murmur3 hashInt vs hashLong give different values for
    * the same id), and collection data tables carry stream_id as INT
    * (CollectionSpec reference parity) while `streamPredicate` precomputes
    * with hashLong — without the cast an int-typed collection's rows land
    * in buckets the predicate never scans (silent row loss; the specs
    * masked it by building test frames from Longs).
    */
  def bucketCol(buckets: Int): org.apache.spark.sql.Column =
    pmod(hash(col("stream_id").cast("long")), lit(buckets))

  /** Day label via timezone-free date arithmetic (epoch days), NOT
    * date_format over a timestamp: that goes through the SESSION timezone,
    * and a non-UTC writer would shift day boundaries against
    * Retention.expireDays' UTC cutoff (early deletion) and split one UTC
    * day across two labels between differently-zoned writers.
    */
  def dayCol: org.apache.spark.sql.Column =
    date_format(
      date_add(
        lit("1970-01-01").cast("date"),
        // FLOOR division: `div` truncates toward zero, which would
        // mislabel every pre-1970 timestamp by one day (-1s is
        // 1969-12-31, not 1970-01-01) — shifting those rows against
        // both the old date_format labels and Retention's cutoffs
        expr("(timestamp - pmod(timestamp, 86400)) div 86400").cast("int")),
      "yyyyMMdd")

  /** Write a data frame (stream_id, timestamp, metrics…) into the layout. */
  def writeData(df: DataFrame, path: String, buckets: Int = DefaultBuckets): Unit =
    df.withColumn("sbucket", bucketCol(buckets))
      .withColumn("day", dayCol)
      .repartition(col("sbucket"), col("day"))
      .sortWithinPartitions("stream_id", "timestamp")
      .write
      .mode("append")
      .partitionBy("sbucket", "day")
      .parquet(path)

  /** Read the table back as the logical (stream_id, timestamp, …) view,
    * with a helper predicate that makes stream filters prune buckets.
    */
  def readData(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Stream-membership predicate that prunes partitions: combines the
    * bucket restriction (directory pruning) with the exact id filter.
    */
  def streamPredicate(ids: Seq[Long], buckets: Int = DefaultBuckets): org.apache.spark.sql.Column = {
    val bucketSet = ids.map(id => // same hash as bucketCol, precomputed
      math.floorMod(org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashLong(id, 42), buckets))
      .distinct
    col("sbucket").isin(bucketSet: _*) && col("stream_id").isInCollection(ids)
  }
}
