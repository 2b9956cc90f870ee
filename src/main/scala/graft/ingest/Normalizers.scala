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

  /** amp-http (amp_http.py:85-147 `_stream_key` + `_mangle_result`): the
    * AMPsave field names are mangled onto the storage columns — destination
    * is the URL, `keep_alive`→`persist`, `pipelining_maxrequests`→
    * `pipelining_max_requests` — and duration is truncated to int; bytes /
    * server_count / object_count pass through.
    */
  def http(df: DataFrame): DataFrame =
    df.withColumn("destination", col("url"))
      .withColumn("persist", col("keep_alive"))
      .withColumn("pipelining_max_requests", col("pipelining_maxrequests"))
      .withColumn("duration", col("duration").cast("int"))

  /** amp-youtube (amp_youtube.py:109-131 `_mangle_result`): destination is
    * the video id, `requested_quality`→`quality`, and the six timing
    * counters are truncated to int.
    */
  def youtube(df: DataFrame): DataFrame = {
    val ints = Seq(
      "total_time", "pre_time", "initial_buffering", "playing_time",
      "stall_time", "stall_count")
    ints.foldLeft(
      df.withColumn("destination", col("video"))
        .withColumn("quality", col("requested_quality")))(
      (d, c) => d.withColumn(c, col(c).cast("int")))
  }

  /** amp-sip (amp_sip.py:132-196 `process_data`): each result fans out into
    * an rx and a tx row; the shared timing fields ride along on both, the
    * per-direction block (packets/bytes/lost/discarded/reordered/duplicated
    * + mos.itu_mos) and the rtt block flatten to columns — all NULL when
    * the block is missing (struct access on a NULL struct is NULL). The
    * proxy list collapses to a comma-joined string (:139).
    *
    * Input structs: rtt{maximum,minimum,mean,sd},
    * rx/tx{packets,bytes,lost,discarded,reordered,duplicated,mos{itu_mos}}.
    */
  def sip(df: DataFrame): DataFrame =
    df.withColumn("destination", col("uri"))
      .withColumn("proxy", concat_ws(",", col("proxy")))
      .withColumn("response_time", col("time_till_first_response"))
      .withColumn("connect_time", col("time_till_connected"))
      .withColumn("rtt_max", col("rtt.maximum"))
      .withColumn("rtt_min", col("rtt.minimum"))
      .withColumn("rtt_mean", col("rtt.mean"))
      .withColumn("rtt_sd", col("rtt.sd"))
      .withColumn(
        "__dir",
        explode(array(
          struct(lit("rx").as("direction"), col("rx").as("block")),
          struct(lit("tx").as("direction"), col("tx").as("block")))))
      .withColumn("direction", col("__dir.direction"))
      .withColumn("packets", col("__dir.block.packets"))
      .withColumn("bytes", col("__dir.block.bytes"))
      .withColumn("lost", col("__dir.block.lost"))
      .withColumn("discarded", col("__dir.block.discarded"))
      .withColumn("reordered", col("__dir.block.reordered"))
      .withColumn("duplicated", col("__dir.block.duplicated"))
      .withColumn("mos", col("__dir.block.mos.itu_mos"))
      .withColumn("unused", lit(true))
      .drop("__dir", "rx", "tx", "rtt", "uri",
        "time_till_first_response", "time_till_connected")

  /** amp-external (amp_external.py:84-99): a result with no destination
    * uses the source as its destination; the measurement value passes
    * through untouched (NULL = test failed to run).
    */
  def external(df: DataFrame): DataFrame =
    df.withColumn("destination", coalesce(col("destination"), col("source")))
}
