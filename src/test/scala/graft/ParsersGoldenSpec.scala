package graft

import org.apache.spark.sql.functions._

import graft.ingest.{AmpTcpping, AmpTraceroute, AmpTraceroutePathlen, Normalizers}

// sip result blocks (file-scope so Spark can derive Encoders)
case class SipRtt(maximum: Option[Int], minimum: Option[Int], mean: Option[Int], sd: Option[Int])
case class SipMos(itu_mos: Option[Double])
case class SipBlk(packets: Option[Long], bytes: Option[Long], lost: Option[Long],
    discarded: Option[Long], reordered: Option[Long], duplicated: Option[Long],
    mos: Option[SipMos])

/** Ports of the reference parser golden tests for the collections that were
  * schema-only in round 1: tcpping, http, youtube, sip, external and
  * traceroute_pathlen (/root/reference/tests/TcppingParser_test.py,
  * HttpParser_test.py, YoutubeParser_test.py, SipParser_test.py,
  * ExternalParser_test.py, TraceroutePathlenParser_test.py), plus the
  * AS-traceroute stream reduction (amp_traceroute.py:408-478).
  */
class ParsersGoldenSpec extends SparkSpec {
  import spark.implicits._

  test("tcpping goldens (TcppingParser_test.py:6-103)") {
    val raw = Seq(
      // (source, target, address, rtt, loss, random, packet_size, port, icmptype, ts)
      ("source", "lost.example.com", "192.0.2.1", None: Option[Int], Some(1), false, 84, 80, None: Option[Int], 0L),
      ("source", "good.example.com", "192.0.2.254", None: Option[Int], Some(1), false, 84, 80, None: Option[Int], 0L),
      ("source", "good.example.com", "198.51.100.254", Some(1000), Some(0), false, 84, 80, Some(0), 0L),
      ("source", "good.example.com", "203.0.113.254", Some(2000), Some(0), false, 84, 80, Some(0), 0L),
      ("source", "doesnotexist.invalid", "0.0.0.0", None: Option[Int], None: Option[Int], false, 84, 80, None: Option[Int], 0L))
      .toDF("source", "target", "address", "rtt", "loss", "random",
        "packet_size", "port", "icmptype", "timestamp")

    val out = AmpTcpping.normalize(raw).collect()
      .map(r => r.getAs[String]("destination") -> r).toMap
    assert(out.size === 3)

    val lost = out("lost.example.com")
    assert(lost.getAs[Int]("loss") === 1)
    assert(lost.getAs[Seq[Integer]]("rtts") === Seq(null))
    assert(lost.isNullAt(lost.fieldIndex("median")))
    assert(lost.getAs[Int]("results") === 1)
    assert(lost.getAs[Double]("lossrate") === 1.0)
    assert(lost.isNullAt(lost.fieldIndex("icmperrors")))

    val good = out("good.example.com")
    assert(good.getAs[Int]("loss") === 1)
    assert(good.getAs[Seq[Integer]]("rtts") === Seq(1000, 2000, null))
    assert(good.getAs[Int]("median") === 1500)
    assert(good.getAs[Int]("results") === 3)
    assert(good.getAs[Double]("lossrate") === 1.0 / 3)
    assert(good.getAs[Int]("icmperrors") === 0)

    val failed = out("doesnotexist.invalid")
    assert(failed.isNullAt(failed.fieldIndex("loss")))
    assert(failed.getAs[Seq[Integer]]("rtts") === Seq.empty)
    assert(failed.isNullAt(failed.fieldIndex("results")))
    assert(failed.isNullAt(failed.fieldIndex("lossrate")))
    assert(failed.isNullAt(failed.fieldIndex("icmperrors")))
  }

  test("tcpping: non-zero icmptype counts as an error and pads rtts") {
    val raw = Seq(
      ("s", "t", "1.2.3.4", Some(100), Some(0), false, 84, 80, Some(0), 0L),
      ("s", "t", "1.2.3.5", None: Option[Int], Some(0), false, 84, 80, Some(3), 0L))
      .toDF("source", "target", "address", "rtt", "loss", "random",
        "packet_size", "port", "icmptype", "timestamp")
    val r = AmpTcpping.normalize(raw).collect()(0)
    assert(r.getAs[Int]("icmperrors") === 1)
    assert(r.getAs[Seq[Integer]]("rtts") === Seq(100, null)) // error pad, no loss pad
  }

  test("http goldens (HttpParser_test.py:6-58)") {
    val raw = Seq(
      ("source", "http://doesnotexist.invalid/", None: Option[Double], None: Option[Long], 1, 0, true, false, false, 4, 0L),
      ("source", "http://good.example.com/", Some(200.0), Some(606L), 1, 1, true, false, false, 4, 0L))
      .toDF("source", "url", "duration", "bytes", "server_count",
        "object_count", "keep_alive", "pipelining", "caching",
        "pipelining_maxrequests", "timestamp")
    val out = Normalizers.http(raw).collect()
      .map(r => r.getAs[String]("destination") -> r).toMap
    val bad = out("http://doesnotexist.invalid/")
    assert(bad.isNullAt(bad.fieldIndex("duration")) && bad.isNullAt(bad.fieldIndex("bytes")))
    assert(bad.getAs[Int]("server_count") === 1 && bad.getAs[Int]("object_count") === 0)
    val good = out("http://good.example.com/")
    assert(good.getAs[Int]("duration") === 200) // ms, int-truncated
    assert(good.getAs[Long]("bytes") === 606L)
    assert(good.getAs[Int]("object_count") === 1)
    assert(good.getAs[Boolean]("persist")) // keep_alive → persist
    assert(good.getAs[Int]("pipelining_max_requests") === 4)
  }

  test("youtube goldens (YoutubeParser_test.py:6-58)") {
    val raw = Seq(
      ("source", "abcde12345", 0, "missing codecs", 1000.0, 100.0, 900.0, 0.0, 0.0, 0.0, 0L),
      ("source", "abcde12345", 0, "worked", 5000.0, 100.0, 900.0, 3990.0, 10.0, 1.0, 0L))
      .toDF("source", "video", "requested_quality", "title", "total_time",
        "pre_time", "initial_buffering", "playing_time", "stall_time",
        "stall_count", "timestamp")
    val out = Normalizers.youtube(raw).collect()
      .map(r => r.getAs[String]("title") -> r).toMap
    val failed = out("missing codecs")
    assert(failed.getAs[String]("destination") === "abcde12345")
    assert(failed.getAs[Int]("quality") === 0)
    assert(failed.getAs[Int]("total_time") === 1000)
    assert(failed.getAs[Int]("stall_count") === 0)
    assert(failed.getAs[Int]("playing_time") === 0)
    val good = out("worked")
    assert(good.getAs[Int]("total_time") === 5000)
    assert(good.getAs[Int]("stall_count") === 1)
    assert(good.getAs[Int]("playing_time") === 3990)
    assert(good.getAs[Int]("pre_time") === 100)
    assert(good.getAs[Int]("initial_buffering") === 900)
  }

  test("sip goldens: rx/tx fan-out + block flattening (SipParser_test.py:6-160)") {
    val raw = Seq(
      ("source", "sip:user@lost.example.com", Seq("lost.example.com"), "192.0.2.1",
        "default.wav", None: Option[Int], None: Option[Int], None: Option[Int],
        None: Option[SipRtt], None: Option[SipBlk], None: Option[SipBlk], 0L),
      ("source", "sip:user@good.example.com", Seq("good.example.com"), "192.0.2.254",
        "default.wav", Some(100), Some(150), Some(10000),
        Some(SipRtt(Some(60), Some(40), Some(50), Some(3))),
        Some(SipBlk(Some(50000L), Some(3000000L), Some(50L), Some(0L), Some(5L), Some(10L),
          Some(SipMos(Some(3.8))))),
        Some(SipBlk(Some(60000L), Some(4000000L), Some(60L), Some(10L), Some(15L), Some(20L),
          Some(SipMos(Some(2.8))))), 0L))
      .toDF("source", "uri", "proxy", "address", "filename",
        "time_till_first_response", "time_till_connected", "duration",
        "rtt", "rx", "tx", "timestamp")

    val out = Normalizers.sip(raw).collect()
      .map(r => (r.getAs[String]("destination"), r.getAs[String]("direction")) -> r).toMap
    assert(out.size === 4) // 2 results × rx/tx

    val lostRx = out(("sip:user@lost.example.com", "rx"))
    assert(lostRx.getAs[String]("proxy") === "lost.example.com")
    Seq("response_time", "connect_time", "duration", "rtt_max", "rtt_min",
      "rtt_mean", "rtt_sd", "packets", "bytes", "lost", "discarded",
      "reordered", "duplicated", "mos")
      .foreach(c => assert(lostRx.isNullAt(lostRx.fieldIndex(c)), s"$c should be NULL"))
    assert(lostRx.getAs[Boolean]("unused"))

    val goodRx = out(("sip:user@good.example.com", "rx"))
    assert(goodRx.getAs[Int]("response_time") === 100)
    assert(goodRx.getAs[Int]("connect_time") === 150)
    assert(goodRx.getAs[Int]("duration") === 10000)
    assert(goodRx.getAs[Int]("rtt_max") === 60 && goodRx.getAs[Int]("rtt_min") === 40)
    assert(goodRx.getAs[Long]("packets") === 50000L)
    assert(goodRx.getAs[Long]("bytes") === 3000000L)
    assert(goodRx.getAs[Long]("lost") === 50L)
    assert(goodRx.getAs[Double]("mos") === 3.8)

    val goodTx = out(("sip:user@good.example.com", "tx"))
    assert(goodTx.getAs[Long]("packets") === 60000L)
    assert(goodTx.getAs[Long]("discarded") === 10L)
    assert(goodTx.getAs[Double]("mos") === 2.8)
    // shared fields identical across directions
    assert(goodTx.getAs[Int]("response_time") === 100)
  }

  test("external goldens (ExternalParser_test.py:6-38)") {
    val raw = Seq(
      ("source", "foo", Some("lost.example.com"), Some(0L), 0L),
      ("source", "foo", Some("good.example.com"), Some(12345L), 0L),
      ("source", "foo", Some("doesnotexist.invalid"), None: Option[Long], 0L),
      ("source", "foo", None: Option[String], Some(7L), 0L)) // no destination
      .toDF("source", "command", "destination", "value", "timestamp")
    val out = Normalizers.external(raw).collect()
      .map(r => r.getAs[String]("destination") -> r).toMap
    assert(out("lost.example.com").getAs[Long]("value") === 0L)
    assert(out("good.example.com").getAs[Long]("value") === 12345L)
    assert(out("doesnotexist.invalid").isNullAt(
      out("doesnotexist.invalid").fieldIndex("value")))
    assert(out.contains("source")) // destination falls back to source
  }

  test("pathlen goldens (TraceroutePathlenParser_test.py:6-60)") {
    val raw = Seq(
      // lost: 5 no-response hops → 5 + 0.5 − 5 = 0.5
      (1L, Seq[Option[String]](None, None, None, None, None).map(_.orNull), Some(5), 0L),
      // good: complete 2-hop path → 2.0
      (2L, Seq[Option[String]](Some("203.0.113.254"), Some("192.0.2.1")).map(_.orNull), Some(2), 0L),
      // failed: NULL path → NULL length
      (3L, null: Seq[String], None: Option[Int], 0L))
      .toDF("stream_id", "path", "length", "timestamp")

    val adjusted = raw.withColumn(
      "path_length",
      AmpTraceroutePathlen.ipPathLength(col("path"), col("length")))
    val out = AmpTraceroutePathlen
      .reduce(adjusted, Seq("stream_id", "timestamp"), "path_length")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("path_length") === 0.5)
    assert(out(1L).getAs[Long]("count") === 1L)
    assert(out(2L).getAs[Double]("path_length") === 2.0)
    assert(out(3L).isNullAt(out(3L).fieldIndex("path_length")))
    assert(out(3L).getAs[Long]("count") === 1L)
  }

  test("pathlen: partial trailing nulls + empty path + AS variant") {
    val raw = Seq(
      // 4 hops, last 2 unanswered: 4 + 0.5 − 2 = 2.5
      (1L, Seq("a", "b", null, null), Some(4), 0L),
      (2L, Seq.empty[String], Some(0), 0L)) // empty → 0.5
      .toDF("stream_id", "path", "length", "timestamp")
    val got = raw.select(
      col("stream_id"),
      AmpTraceroutePathlen.ipPathLength(col("path"), col("length")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 2.5)
    assert(got(2L) === 0.5)

    // AS variant: trailing "-1" RLE segment marks incomplete
    val as = Seq(
      (1L, Seq("2.100", "1.-1"), Some(2)),
      (2L, Seq("3.200"), Some(3)),
      (3L, Seq.empty[String], Some(0)),
      (4L, null: Seq[String], None: Option[Int]))
      .toDF("stream_id", "aspath", "responses")
    val gotAs = as.select(
      col("stream_id"),
      AmpTraceroutePathlen.asResponsesLength(col("aspath"), col("responses")).as("l"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(gotAs(1L) === Some(2.5))
    assert(gotAs(2L) === Some(3.0))
    assert(gotAs(3L) === Some(0.5))
    assert(gotAs(4L) === None)
  }

  test("dual-collection routing: shared streams, split IP/AS data (amp_traceroute.py:507-518)") {
    val batch = Seq(
      (1L, Some(1), Some(0), "ip result"),          // ip flag set → IP
      (1L, Some(0), Some(1), "as result"),          // ip=0, as=1 → AS
      (2L, Some(0), Some(0), "neither"),            // ip=0, as=0 → dropped
      (3L, None: Option[Int], Some(1), "null ip"))  // null ip → IP (old ampsave)
      .toDF("stream_id", "ip", "as", "tag")
    val (ip, as) = AmpTraceroute.routeDual(batch)
    assert(ip.select("tag").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("ip result", "null ip"))
    assert(as.select("tag").collect().map(_.getString(0)).toSeq === Seq("as result"))

    // no ip column at all → everything is an IP traceroute
    val legacy = Seq((1L, "x")).toDF("stream_id", "tag")
    val (ipL, asL) = AmpTraceroute.routeDual(legacy)
    assert(ipL.count() === 1 && asL.count() === 0)

    // live routing: same stream id, two collections, per-subscription split
    val live = Seq(
      (1L, 100L, "amp-traceroute"), (1L, 100L, "amp-astraceroute"))
      .toDF("stream_id", "timestamp", "collection")
    val ipLive = AmpTraceroute.liveForCollection(live, "collection", "amp-traceroute")
    assert(ipLive.collect().map(_.getString(2)).toSeq === Seq("amp-traceroute"))
  }

  test("X7 TTL path cache: memoized lookups, pending commit, flush (amp_traceroute.py:536-559)") {
    import graft.ingest.PathIntern
    val cache = new PathIntern.TtlCache(ttlSeconds = 3600)
    val dim0 = Seq.empty[(Int, Seq[String], Int)].toDF("path_id", "path", "length")

    val b1 = Seq(Tuple1(Seq("a", "b")), Tuple1(Seq("c"))).toDF("path")
    val dim1 = PathIntern.internCached(dim0, b1, cache, now = 1000L)
    assert(dim1.count() === 2)
    assert(cache.size === 0) // staged, not yet visible
    cache.commit(now = 1000L)
    assert(cache.size === 2)

    // same paths again: resolved from the memo, no new dimension rows
    val dim2 = PathIntern.internCached(dim1, b1, cache, now = 2000L)
    assert(dim2.count() === 2)

    // a failed batch's staged ids vanish
    val b2 = Seq(Tuple1(Seq("d"))).toDF("path")
    PathIntern.internCached(dim2, b2, cache, now = 2500L)
    cache.abort()
    assert(cache.size === 2)

    // flush evicts entries idle past the TTL ("a","b"/"c" last used 2000)
    cache.flush(now = 2000L + 3601L)
    assert(cache.size === 0)
  }

  test("AS-traceroute stream reduction (amp_traceroute.py:408-478)") {
    val rows = Seq(
      // stream 1: two results with the same aspath, one error, real addrs
      (1L, "1.2.3.4", None: Option[Int], None: Option[Int], 84,
        Seq("2.100", "1.200"), Some(3), Some(2), Some(3), 0L),
      (1L, "1.2.3.5", Some(1), None: Option[Int], 84,
        Seq("2.100", "1.200"), Some(3), Some(2), Some(3), 0L),
      (1L, "1.2.3.6", None: Option[Int], None: Option[Int], 84,
        Seq("3.300"), Some(3), Some(1), Some(3), 0L),
      // stream 2: null address, no aspath → everything NULL, errors NULL
      (2L, "0.0.0.0", None: Option[Int], None: Option[Int], 84,
        null: Seq[String], None: Option[Int], None: Option[Int], None: Option[Int], 0L))
      .toDF("stream_id", "address", "error_type", "error_code", "packet_size",
        "aspath", "aspath_length", "uniqueas", "responses", "timestamp")

    val out = AmpTraceroute.asStreamReduce(rows, Seq("stream_id", "timestamp"))
      .collect().map(r => r.getLong(0) -> r).toMap

    val s1 = out(1L)
    assert(s1.getAs[Int]("addresses") === 3)
    assert(s1.getAs[Int]("errors") === 1)
    assert(s1.getAs[Seq[String]]("aspath") === Seq("2.100", "1.200")) // mode
    assert(s1.getAs[Int]("uniqueas") === 2)

    val s2 = out(2L)
    assert(s2.isNullAt(s2.fieldIndex("addresses")))
    assert(s2.isNullAt(s2.fieldIndex("errors")))
    assert(s2.isNullAt(s2.fieldIndex("aspath")))
  }
}
