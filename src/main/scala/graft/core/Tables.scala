package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the test corpus plus the adapter that shapes
  * the generic `events` table into the engine's time-series contract:
  * `(stream_id BIGINT, timestamp BIGINT /*epoch s*/, metric columns…)`.
  *
  * In the reference every collection stores rows keyed by
  * `(stream_id, timestamp)` (see /root/reference/libnntsc/database.py:868-882);
  * here a single partitioned columnar table replaces table-per-stream, and
  * Parquet min/max skipping + partition pruning replace the reference's
  * hand-rolled stream-activity pruning (dbselect.py:576-612).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events → NNTSC-shaped data frame. The corpus generator has shipped
    * `ts` under three physical encodings across refreshes — TIMESTAMP(NANOS)
    * (read as raw nanos LONG via `spark.sql.legacy.parquet.nanosAsLong`),
    * TIMESTAMP_MICROS (Spark `TimestampType`, LTZ), and TIMESTAMP_NTZ
    * (pandas/pyarrow default, no tz) — so this adapter matches on the full
    * set rather than hardcoding one, mirroring the reference's dynamic
    * schema discovery at query time (dbselect.py:112-139). All branches
    * truncate to epoch seconds, matching `CAST(floor(epoch(ts)) AS BIGINT)`
    * in the DuckDB oracle.
    */
  def tsEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    // defensive: callers (e.g. the driver's smoke test) may hand us a
    // session without this conf; it is runtime-settable and required to
    // read TIMESTAMP(NANOS) parquet at all
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = load(spark, dir, "events")
    val tsSec = ev.schema("ts").dataType match {
      // Integer ts: dispatch on magnitude, not assumption — TIMESTAMP(NANOS)
      // parquet reads as nanos-long under the session conf, but a raw
      // BIGINT column could as easily carry epoch micros/millis/seconds,
      // and a blind nanos divide would silently zero them. 2001-era epochs
      // land at ~1e9 s / 1e12 ms / 1e15 us / 1e18 ns, three orders apart,
      // so the thresholds are unambiguous for any plausible corpus.
      // `div` = exact integer division (a double `/` would lose precision
      // on 1.7e18-scale nano values: doubles only hold 53 mantissa bits)
      case LongType =>
        when(col("ts") >= 100000000000000000L, expr("ts div 1000000000"))
          .when(col("ts") >= 100000000000000L, expr("ts div 1000000"))
          .when(col("ts") >= 100000000000L, expr("ts div 1000"))
          .otherwise(col("ts"))
      // NTZ has no direct cast to BIGINT, and routing via TimestampType
      // goes through the SESSION timezone — a non-UTC caller would shift
      // every epoch by its offset (and pinning the session to UTC here
      // would mutate caller-global state for the rest of the session).
      // Date arithmetic over the wall clock is timezone-free: days since
      // epoch × 86400 + time of day, correct for pre-1970 values too.
      case _: TimestampNTZType =>
        datediff(col("ts").cast(DateType), lit("1970-01-01").cast(DateType))
          .cast("long") * 86400L +
          hour(col("ts")) * 3600L + minute(col("ts")) * 60L + second(col("ts"))
      // TimestampType (LTZ micros) and anything numeric-castable
      case _ => col("ts").cast("long")
    }
    // width-pinning casts (no-ops today, elided by SimplifyCasts): if a
    // future corpus refresh narrows the integer ids to int32 or value to
    // float32, the engine contract stays (BIGINT ids, DOUBLE value) — the
    // oracle view applies the same casts (SparkEntry.OracleEvents)
    ev.select(
      col("user_id").cast("long").as("stream_id"),
      tsSec.cast("long").as("timestamp"),
      col("event_id").cast("long").as("event_id"),
      col("event_type"),
      col("value").cast("double").as("value"),
      col("props"))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
