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

  /** Input-skew remediation for the FACT tables (optimization guide §2.5:
    * "one huge unsplittable file … repartition immediately after the
    * read"): the test corpus writes each table as ONE parquet file with
    * ONE row group, so the scan — and every fused map kernel, regex pass
    * and decimal aggregation above it — runs as a single task while the
    * other `defaultParallelism − 1` cores idle until the first exchange.
    *
    * The round-robin repartition is applied ONLY when the input is small
    * enough that reshuffling it is trivially cheap (`graft.fanout
    * .maxInputBytes`, default 64 MiB — a sub-second shuffle locally) AND
    * the file would produce fewer splits than cores. At production scale
    * a fact table is many row groups across many files, the scan already
    * fans out, and this is the identity — the threshold exists so the
    * remediation can never add a corpus-sized shuffle. Parallelism
    * follows `defaultParallelism`, so the driver's reduced-core bench
    * sees the same adaptive behaviour. Set `graft.fanout.maxInputBytes=0`
    * to disable.
    *
    * The spread uses HASH partitioning on the table's unique key, not
    * round-robin: keyless `repartition(n)` first pays a local sort of the
    * (single, whole-table) input partition (SPARK-23207), which is most
    * of what the fan-out is trying to escape; hashing a deterministic
    * high-cardinality id is sort-free, deterministic under retries, and
    * skew-free. Every declared query's result is invariant to input
    * partitioning (verified against the DuckDB oracle at sf0.01/sf0.1 in
    * the r19 optimization round).
    */
  private def fanOutSmall(
      spark: SparkSession,
      df: DataFrame,
      path: String,
      key: org.apache.spark.sql.Column): DataFrame = {
    // byte-string parse (64m etc.), matching every adjacent Spark size
    // conf — a bare toLong threw on the format maxPartitionBytes accepts
    // three lines below (ADVICE r19)
    val maxBytes = spark.conf.getOption("graft.fanout.maxInputBytes")
      .map(v => org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v))
      .getOrElse(64L << 20)
    if (maxBytes <= 0) return df
    val par = spark.sparkContext.defaultParallelism
    if (par <= 1) return df
    // the gate sizes PLAIN FILES only. A directory-layout dataset (the
    // standard multi-file Spark output) previously measured as its dirent
    // size (~4 KB) and slipped under the gate — at production scale that
    // is exactly the corpus-sized shuffle the threshold exists to forbid
    // (ADVICE r19). A directory with ONE visible data file is the
    // single-file corpus in directory clothing (sized by that file);
    // more than one data file already scans as multiple splits → identity.
    // Non-local filesystems (length 0 / not a File) stay identity too.
    val len = try {
      val f = new java.io.File(path)
      if (f.isFile) f.length()
      else if (f.isDirectory) {
        val data = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(c => c.isFile &&
            !c.getName.startsWith("_") && !c.getName.startsWith("."))
        if (data.length == 1) data(0).length() else 0L
      } else 0L
    } catch { case _: Throwable => 0L }
    val splitBytes = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
      .map(v => org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v))
      .getOrElse(128L << 20)
    if (len > 0 && len < maxBytes && len / splitBytes + 1 < par)
      df.repartition(par, key)
    else df
  }

  /** Fact-table load with the small-input fan-out (dimension tables keep
    * the plain single-task load — they broadcast, and fanning them out
    * only adds empty tasks).
    */
  private def loadFact(
      spark: SparkSession, dir: String, name: String, key: String): DataFrame = {
    val df = load(spark, dir, name)
    fanOutSmall(spark, df, s"$dir/$name.parquet", col(key))
  }

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
    // event_id (unique) as the spread key: measured better than
    // stream-keyed spreading (tier builds +0.9 s under stream keying at
    // sf0.1 — 1500 streams hash unevenly into 32 partitions, and the
    // hoped-for window-exchange elision never paid for it).
    fanOutSmall(spark, ev, s"$dir/events.parquet", col("event_id")).select(
      col("user_id").cast("long").as("stream_id"),
      tsSec.cast("long").as("timestamp"),
      col("event_id").cast("long").as("event_id"),
      col("event_type"),
      col("value").cast("double").as("value"),
      col("props"))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    loadFact(spark, dir, "lineitem", "l_orderkey")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame =
    loadFact(spark, dir, "documents", "doc_id")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    loadFact(spark, dir, "embeddings", "vec_id")
}
