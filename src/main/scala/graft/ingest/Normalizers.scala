package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-collection ingest normalizers for the remaining reference parsers —
  * thin row transforms over the shared primitives in `Normalize` (the
  * heavyweight grouped reductions live in AmpIcmp / AmpTraceroute).
  * Citations point at each parser's normalization site.
  */
object Normalizers {

  /** amp-throughput (amp_throughput.py:139-145): rate = bytes/runtime,
    * 0.0 when runtime == 0, NULL when runtime is NULL.
    */
  def throughput(df: DataFrame): DataFrame =
    df.withColumn(
      "rate",
      when(col("runtime").isNull, lit(null).cast("double"))
        .when(col("runtime") > 0, col("bytes").cast("double") / col("runtime"))
        .otherwise(lit(0.0)))

  /** amp-fastping (amp_fastping.py:118-127): median = percentiles[8]
    * (the 90th-ish index the reference hard-codes), lossrate =
    * 1 − samples/packet_count; all NULL when the rtt block is missing.
    */
  def fastping(df: DataFrame, packetCountCol: String = "packet_count"): DataFrame =
    df.withColumn(
        "median",
        when(col("percentiles").isNotNull, element_at(col("percentiles"), 9).cast("int")))
      .withColumn(
        "lossrate",
        when(
          col("samples").isNotNull && col(packetCountCol).isNotNull,
          lit(1.0) - col("samples").cast("double") / col(packetCountCol)))

  /** rrd-smokeping (rrd_smokeping.py:99-130): seconds→ms with 6dp rounding
    * for median + per-ping values, pingsent = ping-column count, lossrate
    * guarded on sent/loss.
    */
  def smokeping(df: DataFrame): DataFrame =
    df.withColumn("median", Normalize.secondsToMillis(col("median_s")))
      .withColumn("pings", transform(col("pings_s"), p => round(p * 1000, 6)))
      .withColumn("pingsent", size(col("pings_s")))
      .withColumn(
        "lossrate",
        when(
          col("pingsent") > 0 && col("loss").isNotNull,
          col("loss").cast("double") / col("pingsent")))

  /** amp-udpstream (amp_udpstream.py:179-204): percentile columns filled
    * from a (possibly short) percentile array by stepped reuse.
    */
  def udpstream(df: DataFrame, pctCol: String = "percentiles"): DataFrame = {
    val spread = Normalize.spreadPercentiles(col(pctCol))
    (0 until 10).foldLeft(df.withColumn("__spread", spread)) { (d, i) =>
      d.withColumn(s"jitter_percentile_${(i + 1) * 10}", element_at(col("__spread"), i + 1))
    }.drop("__spread")
  }

  /** amp-dns (amp_dns.py:150-170): requests count + lossrate from
    * responses/requests, NULL-guarded.
    */
  def dns(df: DataFrame): DataFrame =
    df.withColumn(
      "lossrate",
      when(
        col("requests").isNotNull && col("requests") > 0,
        (col("requests") - col("responses")).cast("double") / col("requests")))
}
