package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.serve.{Service, WireClient, WireServer}
import graft.streaming.Markers

/** Drives `WireClient` against a live `WireServer` — the reference's
  * client loop (exporter.py:641-657) closed end to end: paged stream
  * listing, request/reply queries, and a full subscribe lifecycle
  * (history → ack → live → PUSH) consumed by the CLIENT.
  */
class WireClientSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables.tsEvents(spark, sf("sf0.001"))

  test("streams paging: client pages 2500 streams until more=false (exporter.py:641-657)") {
    // 2500 streams → 3 pages at the server's 1000-row page size. Ids
    // START AT 0: events-derived dimensions contain id 0, and the
    // strict-greater minid paging must not skip it (the client's opening
    // minid sits below every legal id)
    val bigDim = spark.range(0, 2500).select(col("id").as("stream_id"))
    val svc = new Service(
      spark,
      data = Map("amp-external" -> events),
      streams = Map("amp-external" -> bigDim))
    val server = new WireServer(svc)
    try {
      val client = new WireClient("127.0.0.1", server.boundPort)
      val rows = client.streams("amp-external")
      assert(rows.size === 2500)
      val ids = rows.map(r => r("stream_id").asInstanceOf[Long])
      assert(ids === ids.sorted)
      assert(ids.head === 0L && ids.last === 2499L)
      assert(ids.distinct.size === 2500) // page seams neither drop nor repeat
    } finally server.close()
  }

  test("truncated reply raises a typed failure, not a silent partial result") {
    // a fake server that writes half a frame header and drops the
    // connection: the client must NOT treat the mid-frame EOF as a clean
    // end-of-reply
    val fake = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      val s = fake.accept()
      s.getOutputStream.write(Array[Byte](graft.serve.Wire.Version.toByte, 0, 1))
      s.getOutputStream.flush()
      s.close()
    })
    t.setDaemon(true); t.start()
    try {
      val client = new WireClient("127.0.0.1", fake.getLocalPort)
      val e = intercept[WireClient.WireClientException](client.collections())
      assert(e.getMessage.contains("mid-frame"))
    } finally fake.close()
  }

  test("client request/reply: collections, schema, aggregate, matrix") {
    val svc = new Service(
      spark,
      data = Map("amp-external" -> events),
      streams = Map("amp-external" -> events.select("stream_id").distinct()))
    val server = new WireServer(svc)
    try {
      val client = new WireClient("127.0.0.1", server.boundPort)
      assert(client.collections().size === 14)
      val (streamFields, dataFields) = client.schema("amp-icmp")
      assert(streamFields.map(_._1).contains("source"))
      assert(dataFields.take(2).map(_._1) === Seq("stream_id", "timestamp"))

      val labels = Map("a" -> Seq(0L, 1L), "b" -> Seq(8L, 9L))
      val chunks = client.aggregate(
        "amp-external", labels, Seq(("value", "avg"), ("value", "count")),
        1704067200L, 1706745600L, binsize = 604800)
      assert(chunks.map(_.label).distinct.sorted === Seq("a", "b"))
      assert(chunks.forall(_.freq > 0))
      assert(chunks.flatMap(_.rows).forall(r => r.contains("value_avg")))

      val m = client.matrix(
        "amp-external", labels, Seq(("value", "count")), 1704067200L, 1706745600L)
      assert(m.size === 2)
      assert(m.map(_("nntsclabel")).toSet === Set("a", "b"))

      // protocol errors surface as typed client exceptions
      intercept[WireClient.WireClientException](client.schema("missing"))

      // arrow opt-in: same HistoryChunk surface, value-identical rows
      // (the client sniffs per frame, so JSON-fallback chunks also work)
      val arrowChunks = client.aggregate(
        "amp-external", labels, Seq(("value", "avg"), ("value", "count")),
        1704067200L, 1706745600L, binsize = 604800, arrow = true)
      def canon(cs: Seq[WireClient.HistoryChunk]) =
        cs.map(c => (c.label, c.freq,
          c.rows.map(_.toSeq.sortBy(_._1.toString)))).sortBy(_._1)
      assert(canon(arrowChunks) === canon(chunks))
    } finally server.close()
  }

  test("subscribe lifecycle: history → ack → live → PUSH consumed by the client") {
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val svc = new Service(
      spark,
      data = Map("amp-external" -> events),
      streams = Map("amp-external" -> events.select("stream_id").distinct()))
    val mbus = new Markers.MarkerBus
    val lbus = new Markers.LiveBus
    val server = new WireServer(svc, markers = Some(mbus), live = Some(lbus))
    try {
      val client = new WireClient("127.0.0.1", server.boundPort)
      val sub = client.subscribe(
        "amp-external", Map("a" -> Seq(0L, 1L, 2L)), Seq("value"),
        start = 1704067200L, stop = 0L)
      try {
        // backfill fully consumed before the handle returns
        assert(sub.history.nonEmpty)
        assert(sub.history.map(_.label).distinct === Seq("a"))
        val lastHist = sub.lastHistory("a")
        assert(lastHist > 1704067200L)

        // a committed batch: rows ride as Live, then the PUSH marker —
        // arrival order preserved through the client
        val schema = StructType(Seq(
          StructField("stream_id", LongType), StructField("timestamp", LongType),
          StructField("value", DoubleType)))
        def row(sid: Long, ts: Long, v: Double) =
          new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
            Array[Any](sid, ts, v), schema)
        lbus.publish(Markers.LiveBatch("amp-external",
          Seq(row(1L, lastHist + 60, 7.5), row(99L, lastHist + 60, 8.5))))
        mbus.publish(Markers.Marker("amp-external", lastHist + 60, 1L))

        val e1 = sub.next()
        val live = e1.asInstanceOf[WireClient.LiveRows]
        assert(live.label === "a")
        assert(live.rows.map(_("timestamp").asInstanceOf[Long])
          === Seq(lastHist + 60)) // stream 99 filtered out server-side
        val e2 = sub.next()
        val push = e2.asInstanceOf[WireClient.Push]
        assert(push.collection === "amp-external")
        assert(push.timestamp === lastHist + 60)
      } finally sub.close()
    } finally server.close()
  }

  test("a server closing without any reply frame surfaces as the typed client error") {
    // accept-then-close stand-in for a crashed server / dropping proxy
    val srv = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      try { val s = srv.accept(); s.close() } catch { case _: Throwable => () }
    })
    t.start()
    try {
      val client = new WireClient("127.0.0.1", srv.getLocalPort)
      val e = intercept[WireClient.WireClientException] { client.collections() }
      // the failure now surfaces at the greeting stage (the server closed
      // before sending the version check) — still the typed client error
      assert(e.getMessage.contains("connection closed by server"))
    } finally { srv.close(); t.join(2000) }
  }
}
