package graft.schema

import org.apache.spark.sql.types._

/** Declarative column spec, mirroring the reference's parser-declared
  * schema dicts ({"name", "type", "null", "default"}, e.g.
  * /root/reference/libnntsc/parsers/amp_icmp.py:47-71) and the generic DDL
  * generator (database.py:821-903). Types map per SURVEY.md §1.3.
  */
final case class ColumnSpec(name: String, sqlType: String, nullable: Boolean = true) {
  def dataType: DataType = ColumnSpec.toSpark(sqlType)
  def field: StructField = StructField(name, dataType, nullable)
}

object ColumnSpec {
  /** Reference SQL type → Spark type (SURVEY §1.3). `inet` stays a
    * validated string; epoch timestamps stay integral.
    */
  def toSpark(t: String): DataType = t match {
    case "varchar" | "inet"     => StringType
    case "integer" | "serial"   => IntegerType
    case "smallint"             => ShortType
    case "bigint"               => LongType
    case "float"                => FloatType
    case "double precision"     => DoubleType
    case "boolean"              => BooleanType
    case "timestamp"            => LongType // epoch seconds end-to-end
    case "integer[]"            => ArrayType(IntegerType)
    case "double precision[]"   => ArrayType(DoubleType)
    case "varchar[]" | "inet[]" => ArrayType(StringType)
    case other => throw new IllegalArgumentException(s"unmapped type: $other")
  }
}

/** One collection = one (module, modsubtype) pair with a streams schema and
  * a data schema (README:79-81; database.py:558-564). In this engine a
  * collection maps to ONE partitioned columnar data table (partitioned by
  * stream_id range / bucketed, replacing the reference's table-per-stream,
  * database.py:621-632) plus a broadcast-size streams dimension table.
  */
final case class CollectionSpec(
    module: String,
    modsubtype: String,
    streamColumns: Seq[ColumnSpec],
    uniqueColumns: Seq[String],
    dataColumns: Seq[ColumnSpec]) {

  def name: String = s"$module-$modsubtype"

  /** streams_<collection>: stream_id + descriptive properties
    * (database.py:884-903).
    */
  def streamSchema: StructType =
    StructType(
      StructField("stream_id", IntegerType, nullable = false) +:
        streamColumns.map(_.field))

  /** data_<collection>: (stream_id, timestamp, metrics…) (database.py:868-882). */
  def dataSchema: StructType =
    StructType(
      Seq(
        StructField("stream_id", IntegerType, nullable = false),
        StructField("timestamp", LongType, nullable = false)) ++
        dataColumns.map(_.field))

  /** The decoded result-message shape (the parser input, before stream
    * resolution): property columns + timestamp + measurement columns, names
    * deduplicated (a column like packet_size can be both a stream property
    * and a measurement).
    */
  def rawSchema: StructType = {
    val fields = streamColumns.map(_.field) ++
      Seq(StructField("timestamp", LongType, nullable = false)) ++
      dataColumns.map(_.field)
    StructType(
      fields.foldLeft(Vector.empty[StructField])((acc, f) =>
        if (acc.exists(_.name == f.name)) acc else acc :+ f))
  }
}

/** The 14 collections of SURVEY.md §2.11 (13 AMP parsers + smokeping),
  * column lists from the cited parser sources.
  */
object Collections {
  private def c(n: String, t: String, nullable: Boolean = true) = ColumnSpec(n, t, nullable)

  private val ampStreamBase = Seq(
    c("source", "varchar", nullable = false),
    c("destination", "varchar", nullable = false))

  /** amp-icmp (amp_icmp.py:35-71). */
  val ampIcmp: CollectionSpec = CollectionSpec(
    "amp", "icmp",
    ampStreamBase ++ Seq(c("family", "varchar", nullable = false), c("packet_size", "varchar", nullable = false)),
    Seq("source", "destination", "family", "packet_size"),
    Seq(
      c("median", "integer"), c("packet_size", "smallint", nullable = false),
      c("loss", "smallint"), c("results", "smallint"),
      c("lossrate", "double precision"), c("rtts", "integer[]")))

  /** amp-tcpping (amp_tcpping.py:35-77). */
  val ampTcpping: CollectionSpec = CollectionSpec(
    "amp", "tcpping",
    ampStreamBase ++ Seq(c("port", "integer", nullable = false), c("family", "varchar", nullable = false), c("packet_size", "varchar", nullable = false)),
    Seq("source", "destination", "port", "family", "packet_size"),
    Seq(
      c("median", "integer"), c("packet_size", "smallint", nullable = false),
      c("loss", "smallint"), c("results", "smallint"), c("icmperrors", "smallint"),
      c("lossrate", "double precision"), c("rtts", "integer[]")))

  /** amp-dns (amp_dns.py:35-101). */
  val ampDns: CollectionSpec = CollectionSpec(
    "amp", "dns",
    ampStreamBase ++ Seq(
      c("instance", "varchar", nullable = false), c("address", "inet", nullable = false),
      c("query", "varchar", nullable = false), c("query_type", "varchar", nullable = false),
      c("query_class", "varchar", nullable = false), c("udp_payload_size", "integer", nullable = false),
      c("recurse", "boolean", nullable = false), c("dnssec", "boolean", nullable = false),
      c("nsid", "boolean", nullable = false)),
    Seq("source", "destination", "query", "address", "query_type", "query_class",
      "udp_payload_size", "recurse", "dnssec", "nsid", "instance"),
    Seq(
      c("response_size", "integer"), c("rtt", "integer"), c("ttl", "smallint"),
      c("query_len", "smallint"), c("total_answer", "smallint"),
      c("total_authority", "smallint"), c("total_additional", "smallint"),
      c("opcode", "smallint"), c("rcode", "smallint"),
      c("flag_rd", "boolean"), c("flag_tc", "boolean"), c("flag_rd2", "boolean"),
      c("flag_ra", "boolean"), c("flag_ad", "boolean"), c("flag_cd", "boolean"),
      c("requests", "integer"), c("lossrate", "double precision")))

  /** amp-traceroute, IP path variant (amp_traceroute.py:40-118). */
  val ampTraceroute: CollectionSpec = CollectionSpec(
    "amp", "traceroute",
    ampStreamBase ++ Seq(c("family", "varchar", nullable = false), c("packet_size", "varchar", nullable = false)),
    Seq("source", "destination", "family", "packet_size"),
    Seq(
      c("path_id", "integer", nullable = false), c("aspath_id", "integer"),
      c("packet_size", "smallint", nullable = false), c("error_type", "smallint"),
      c("error_code", "smallint"), c("hop_rtt", "integer[]")))

  /** amp-astraceroute (amp_traceroute.py:65-70). */
  val ampAstraceroute: CollectionSpec = CollectionSpec(
    "amp", "astraceroute",
    ampTraceroute.streamColumns, ampTraceroute.uniqueColumns,
    Seq(
      c("aspath_id", "integer"), c("packet_size", "smallint", nullable = false),
      c("errors", "smallint"), c("addresses", "smallint")))

  /** amp-traceroute_pathlen (amp_traceroute_pathlen.py:36-54). */
  val ampTraceroutePathlen: CollectionSpec = CollectionSpec(
    "amp", "traceroute_pathlen",
    ampTraceroute.streamColumns, ampTraceroute.uniqueColumns,
    Seq(c("path_length", "double precision")))

  /** amp-throughput (amp_throughput.py:34-80). */
  val ampThroughput: CollectionSpec = CollectionSpec(
    "amp", "throughput",
    ampStreamBase ++ Seq(
      c("direction", "varchar", nullable = false), c("address", "inet", nullable = false),
      c("duration", "bigint"), c("writesize", "bigint"), c("tcpreused", "boolean"),
      c("protocol", "varchar")),
    Seq("source", "destination", "direction", "address", "duration", "writesize",
      "tcpreused", "protocol"),
    Seq(
      c("bytes", "bigint"), c("packets", "bigint"), c("rate", "double precision"),
      c("runtime", "integer")))

  /** amp-http (amp_http.py:34-82). */
  val ampHttp: CollectionSpec = CollectionSpec(
    "amp", "http",
    Seq(
      c("source", "varchar", nullable = false), c("destination", "varchar", nullable = false),
      c("max_connections", "integer", nullable = false),
      c("max_connections_per_server", "integer", nullable = false),
      c("max_persistent_connections_per_server", "integer", nullable = false),
      c("pipelining_max_requests", "integer", nullable = false),
      c("persist", "boolean"), c("pipelining", "boolean"), c("caching", "boolean")),
    Seq("source", "destination", "max_connections", "max_connections_per_server",
      "max_persistent_connections_per_server", "pipelining_max_requests",
      "persist", "pipelining", "caching"),
    Seq(
      c("server_count", "integer"), c("object_count", "integer"),
      c("duration", "integer"), c("bytes", "bigint")))

  /** amp-udpstream (amp_udpstream.py:35-99). */
  val ampUdpstream: CollectionSpec = CollectionSpec(
    "amp", "udpstream",
    ampStreamBase ++ Seq(
      c("address", "inet", nullable = false), c("direction", "varchar", nullable = false),
      c("packet_size", "smallint", nullable = false), c("packet_spacing", "integer", nullable = false),
      c("packet_count", "integer", nullable = false), c("dscp", "varchar", nullable = false)),
    Seq("source", "destination", "address", "direction", "packet_size",
      "packet_spacing", "packet_count", "dscp"),
    Seq(
      c("mean_rtt", "integer"), c("mean_jitter", "integer"),
      c("min_jitter", "integer"), c("max_jitter", "integer"),
      c("jitter_percentile_10", "integer"), c("jitter_percentile_20", "integer"),
      c("jitter_percentile_30", "integer"), c("jitter_percentile_40", "integer"),
      c("jitter_percentile_50", "integer"), c("jitter_percentile_60", "integer"),
      c("jitter_percentile_70", "integer"), c("jitter_percentile_80", "integer"),
      c("jitter_percentile_90", "integer"), c("jitter_percentile_100", "integer"),
      c("packets_sent", "integer"), c("packets_recvd", "integer"),
      c("itu_mos", "double precision"), c("lossrate", "double precision")))

  /** amp-youtube (amp_youtube.py:35-81). */
  val ampYoutube: CollectionSpec = CollectionSpec(
    "amp", "youtube",
    Seq(
      c("source", "varchar", nullable = false), c("destination", "varchar", nullable = false),
      c("quality", "smallint", nullable = false)),
    Seq("source", "destination", "quality"),
    Seq(
      c("total_time", "integer"), c("pre_time", "integer"),
      c("initial_buffering", "integer"), c("playing_time", "integer"),
      c("stall_time", "integer"), c("stall_count", "integer")))

  /** amp-fastping (amp_fastping.py:35-79). */
  val ampFastping: CollectionSpec = CollectionSpec(
    "amp", "fastping",
    ampStreamBase ++ Seq(
      c("family", "varchar", nullable = false), c("packet_size", "smallint", nullable = false),
      c("packet_rate", "bigint", nullable = false), c("packet_count", "bigint", nullable = false),
      c("preprobe", "boolean", nullable = false)),
    Seq("source", "destination", "family", "packet_size", "packet_rate",
      "packet_count", "preprobe"),
    Seq(
      c("median", "integer"), c("percentiles", "integer[]"),
      c("lossrate", "double precision")))

  /** amp-sip (amp_sip.py:35-114). */
  val ampSip: CollectionSpec = CollectionSpec(
    "amp", "sip",
    Seq(
      c("source", "varchar", nullable = false), c("destination", "varchar", nullable = false),
      c("proxy", "varchar", nullable = false), c("filename", "varchar", nullable = false),
      c("repeat", "boolean"), c("max_duration", "integer"), c("dscp", "varchar")),
    Seq("source", "destination", "proxy", "filename", "repeat", "max_duration", "dscp"),
    Seq(
      c("response_time", "integer"), c("connect_time", "integer"),
      c("duration", "integer"), c("rtt_mean", "integer"), c("rtt_max", "integer"),
      c("rx_packets", "integer"), c("rx_loss", "integer"), c("rx_discarded", "integer"),
      c("rx_jitter_mean", "integer"), c("rx_mos", "double precision"),
      c("tx_packets", "integer"), c("tx_loss", "integer"), c("tx_discarded", "integer"),
      c("tx_jitter_mean", "integer"), c("tx_mos", "double precision")))

  /** amp-external (amp_external.py:35-71). */
  val ampExternal: CollectionSpec = CollectionSpec(
    "amp", "external",
    ampStreamBase :+ c("command", "varchar", nullable = false),
    Seq("source", "destination", "command"),
    Seq(c("value", "bigint")))

  /** rrd-smokeping (rrd_smokeping.py:35-78). */
  val rrdSmokeping: CollectionSpec = CollectionSpec(
    "rrd", "smokeping",
    Seq(
      c("filename", "varchar", nullable = false), c("source", "varchar", nullable = false),
      c("host", "varchar", nullable = false), c("minres", "integer"),
      c("highrows", "integer")),
    Seq("filename", "source", "host"),
    Seq(
      c("loss", "smallint"), c("pingsent", "smallint"),
      c("median", "double precision"), c("lossrate", "double precision"),
      c("pings", "double precision[]")))

  val all: Seq[CollectionSpec] = Seq(
    ampIcmp, ampTcpping, ampDns, ampTraceroute, ampAstraceroute,
    ampTraceroutePathlen, ampThroughput, ampHttp, ampUdpstream, ampYoutube,
    ampFastping, ampSip, ampExternal, rrdSmokeping)

  val byName: Map[String, CollectionSpec] = all.map(s => s.name -> s).toMap
}
