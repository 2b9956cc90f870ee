package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket

import graft.core.Tables
import graft.serve.{Service, Wire, WireServer}

/** Drives the S6 wire layer end-to-end over a real TCP socket: framed JSON
  * requests in, framed (and, for history, zlib-compressed) replies out.
  */
class WireServerSpec extends SparkSpec {

  private lazy val events = Tables.tsEvents(spark, sf("sf0.001"))
  private lazy val svc = new Service(
    spark,
    data = Map("amp-external" -> events),
    streams = Map("amp-external" -> events.select("stream_id").distinct()))

  private def roundtrip(server: WireServer, request: String): Seq[Wire.Message] = {
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      out.write(Wire.pack(0, request.getBytes("UTF-8")))
      out.flush()
      sock.shutdownOutput() // one request per connection in the test
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      // split concatenated frames
      var bytes = buf.toByteArray
      val msgs = Seq.newBuilder[Wire.Message]
      while (bytes.length >= Wire.HeaderLen) {
        val m = Wire.unpack(bytes)
        msgs += m
        bytes = bytes.drop(Wire.HeaderLen + m.body.length)
      }
      // every connection opens with the version-check greeting
      val all = msgs.result()
      assert(all.head.msgType === Wire.VersionCheck)
      assert(new String(all.head.body, "UTF-8").contains(Wire.ClientApiVersion))
      all.tail
    } finally sock.close()
  }

  test("collections / schema / streams over the socket") {
    val server = new WireServer(svc)
    try {
      val cols = roundtrip(server, """{"request":"collections"}""")
      assert(cols.length === 1 && cols.head.msgType === Wire.Collections)
      val colsJson = new String(cols.head.body, "UTF-8")
      assert(colsJson.contains(""""module":"amp"""") && colsJson.contains("icmp"))

      val sch = roundtrip(server,
        """{"request":"schema","collection":"amp-icmp"}""")
      assert(new String(sch.head.body, "UTF-8").contains(""""name":"stream_id""""))

      val streams = roundtrip(server,
        """{"request":"streams","collection":"amp-external","minid":5}""")
      val sJson = new String(streams.head.body, "UTF-8")
      assert(streams.head.msgType === Wire.Streams)
      assert(sJson.contains(""""more":false"""))
      assert(!sJson.contains(""""stream_id":5""") && sJson.contains(""""stream_id":6"""))
    } finally server.close()
  }

  test("aggregate streams chunked, compressed history frames") {
    val server = new WireServer(svc)
    try {
      val frames = roundtrip(server,
        """{"request":"aggregate","collection":"amp-external",
          |"labels":{"a":[0,1,2,3,4,5,6,7],"b":[8,9,10,11,12,13,14]},
          |"start":1704067200,"stop":1706745600,"binsize":604800,
          |"aggs":[["value","avg"],["value","count"]]}""".stripMargin)
      assert(frames.nonEmpty)
      assert(frames.forall(_.msgType === Wire.History))
      val bodies = frames.map(f => new String(Wire.decompress(f.body), "UTF-8"))
      assert(bodies.exists(_.contains(""""label":"a"""")))
      assert(bodies.exists(_.contains(""""label":"b"""")))
      assert(bodies.forall(_.contains(""""freq":""")))
      assert(bodies.forall(_.contains("value_avg")))
    } finally server.close()
  }

  test("arrow frames: codec roundtrip incl. nulls, arrays, and sniffing") {
    import graft.serve.ArrowFrames
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("stream_id", LongType),
      StructField("v", DoubleType),
      StructField("tag", StringType),
      StructField("ok", BooleanType),
      StructField("grid", ArrayType(DoubleType))))
    def r(vals: Any*) =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        vals.toArray, schema)
    val rows: Seq[Row] = Seq(
      r(1L, 2.5, "a", true, Seq(1.0, 2.0)),
      r(2L, null, null, false, null),
      r(3L, Double.NaN, "", true, Seq(3.0)))
    val body = ArrowFrames.encode("lab", more = true, freq = 60L, schema, rows)
    assert(ArrowFrames.isArrow(body))
    assert(!ArrowFrames.isArrow(Wire.compress("{}".getBytes("UTF-8"))))
    val d = ArrowFrames.decode(body)
    assert(d.label === "lab" && d.more && d.freq === 60L)
    assert(d.schema.fieldNames.toSeq === schema.fieldNames.toSeq)
    assert(d.rows.length === 3)
    assert(d.rows(0).toSeq === Seq(1L, 2.5, "a", true, Seq(1.0, 2.0)))
    assert(d.rows(1).toSeq === Seq(2L, null, null, false, null))
    assert(d.rows(2).getLong(0) === 3L)
    assert(d.rows(2).getDouble(1).isNaN)

    // IPC buffer compression: zstd and lz4-frame bodies stay sniffable
    // (the continuation marker precedes the compressed buffers) and
    // decode through the SAME reader path to identical rows. lz4 is
    // encoded here via the raw CodecType: the server never OFFERS it
    // (commons-compress's pure-java encoder measured ~270x slower than
    // zstd-jni), but frames from other writers must still decode.
    import org.apache.arrow.vector.compression.CompressionUtil.CodecType
    Seq("zstd" -> CodecType.ZSTD, "lz4" -> CodecType.LZ4_FRAME).foreach {
      case (name, ct) =>
        val cbody = ArrowFrames.encode(
          "lab", more = true, freq = 60L, schema, rows, Some(ct))
        assert(ArrowFrames.isArrow(cbody), name)
        val cd = ArrowFrames.decode(cbody)
        assert(cd.label === d.label && cd.more === d.more && cd.freq === d.freq, name)
        assert(cd.rows.length === d.rows.length, name)
        assert(cd.rows(0).toSeq === d.rows(0).toSeq, name)
        assert(cd.rows(1).toSeq === d.rows(1).toSeq, name)
        assert(cd.rows(2).getDouble(1).isNaN, name)
    }
    // the encoding-tag map: zstd only; unknown suffixes (and the
    // deliberately-unoffered lz4) degrade to uncompressed, not an error
    assert(ArrowFrames.codecOf("arrow+zstd").contains(CodecType.ZSTD))
    assert(ArrowFrames.codecOf("arrow+lz4").isEmpty)
    assert(ArrowFrames.codecOf("arrow+snappy").isEmpty)
    assert(ArrowFrames.codecOf("arrow").isEmpty)
  }

  test("arrow-encoded aggregate matches the JSON path row-for-row") {
    import graft.serve.ArrowFrames
    val server = new WireServer(svc)
    try {
      val req =
        """{"request":"aggregate","collection":"amp-external",
          |"labels":{"a":[0,1,2,3,4,5,6,7],"b":[8,9,10,11,12,13,14]},
          |"start":1704067200,"stop":1706745600,"binsize":604800,
          |"aggs":[["value","avg"],["value","count"]]%s}""".stripMargin
      val jsonFrames = roundtrip(server, req.format(""))
      val arrowFrames = roundtrip(server, req.format(""","encoding":"arrow""""))
      assert(arrowFrames.forall(_.msgType === Wire.History))
      assert(arrowFrames.forall(f => ArrowFrames.isArrow(f.body)))
      // zstd-compressed variant: identical decoded rows, smaller bodies
      val zstdFrames = roundtrip(server, req.format(""","encoding":"arrow+zstd""""))
      assert(zstdFrames.forall(f => ArrowFrames.isArrow(f.body)))
      val plainRows = arrowFrames.map(f => ArrowFrames.decode(f.body))
        .map(d => d.label -> d.rows.map(_.toSeq)).sortBy(_._1)
      val zstdRows = zstdFrames.map(f => ArrowFrames.decode(f.body))
        .map(d => d.label -> d.rows.map(_.toSeq)).sortBy(_._1)
      assert(zstdRows === plainRows)
      // no size assertion here: sf0.001 chunks are so small that the
      // per-buffer compression framing outweighs the saving — the byte
      // win is measured at scale in ProfScale `wirearrow`
      // decode both sides to (label, rows-as-value-seqs) and compare
      def jsonRows(frames: Seq[Wire.Message]): Seq[(String, String)] =
        frames.map { f =>
          val s = new String(Wire.decompress(f.body), "UTF-8")
          val m = """"label":"([ab])"""".r.findFirstMatchIn(s).get.group(1)
          (m, s)
        }
      val arrowSide = arrowFrames.map(f => ArrowFrames.decode(f.body))
      val jsonSide = jsonRows(jsonFrames)
      assert(arrowSide.map(_.label).sorted === jsonSide.map(_._1).sorted)
      arrowSide.foreach { d =>
        val json = jsonSide.find(_._1 == d.label).get._2
        d.rows.foreach { row =>
          // every arrow row's (binstart, count) pair appears in the JSON body
          val bi = row.schema.fieldIndex("binstart")
          val ci = row.schema.fieldIndex("value_count")
          assert(json.contains(s""""binstart":${row.getLong(bi)}"""))
          assert(json.contains(s""""value_count":${row.getLong(ci)}"""))
        }
        assert(json.split(""""binstart":""").length - 1 === d.rows.length,
          s"row count mismatch for label ${d.label}")
      }
    } finally server.close()
  }

  test("subscribe: history frames, then live PUSH markers on one connection") {
    import graft.streaming.Markers
    val bus = new Markers.MarkerBus
    val server = new WireServer(svc, markers = Some(bus))
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      sock.setSoTimeout(30000)
      out.write(Wire.pack(0,
        """{"request":"subscribe","collection":"amp-external",
          |"labels":{"a":[0,1,2]},"columns":["value"],
          |"start":1704067200,"stop":1704672000}""".stripMargin.getBytes("UTF-8")))
      out.flush()

      def readFrame(): Wire.Message = {
        val header = new Array[Byte](Wire.HeaderLen)
        in.readFully(header)
        val len = java.nio.ByteBuffer.wrap(header, 3, 4).getInt
        val body = new Array[Byte](len)
        in.readFully(body)
        Wire.Message(header(0) & 0xff, ((header(1) & 0xff) << 8) | (header(2) & 0xff), body)
      }

      // greeting, then history (zero or more frames), then the ack
      assert(readFrame().msgType === Wire.VersionCheck)
      var m = readFrame()
      var sawHistory = false
      while (m.msgType == Wire.History) { sawHistory = true; m = readFrame() }
      assert(m.msgType === Wire.Subscribe)
      assert(sawHistory) // window overlaps data → at least one chunk

      // a batch commits → marker flows to the subscribed client
      bus.publish(Markers.Marker("amp-external", 1704070000L, 3L))
      val push = readFrame()
      assert(push.msgType === Wire.Push)
      val body = new String(push.body, "UTF-8")
      assert(body.contains(""""collection":"amp-external""""))
      assert(body.contains("1704070000"))
    } finally { sock.close(); server.close() }
  }

  test("subscribe: history rows, then live data frames, then PUSH — one socket") {
    import graft.streaming.Markers
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, DoubleType, StructField, StructType}
    val mbus = new Markers.MarkerBus
    val lbus = new Markers.LiveBus
    val server = new WireServer(svc, markers = Some(mbus), live = Some(lbus))
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      sock.setSoTimeout(30000)
      out.write(Wire.pack(0,
        """{"request":"subscribe","collection":"amp-external",
          |"labels":{"a":[0,1,2]},"columns":["value"],
          |"start":1704067200,"stop":0}""".stripMargin.getBytes("UTF-8")))
      out.flush()

      def readFrame(): Wire.Message = {
        val header = new Array[Byte](Wire.HeaderLen)
        in.readFully(header)
        val len = java.nio.ByteBuffer.wrap(header, 3, 4).getInt
        val body = new Array[Byte](len)
        in.readFully(body)
        Wire.Message(header(0) & 0xff, ((header(1) & 0xff) << 8) | (header(2) & 0xff), body)
      }

      // 1. greeting, then history frames, then the ack
      assert(readFrame().msgType === Wire.VersionCheck)
      var m = readFrame()
      var sawHistory = false
      while (m.msgType == Wire.History) { sawHistory = true; m = readFrame() }
      assert(m.msgType === Wire.Subscribe)
      assert(sawHistory)

      // 2. a batch commits → its rows arrive as a live data frame,
      //    filtered to the subscribed streams (99 is not subscribed) and
      //    restricted to the subscribed columns
      val schema = StructType(Seq(
        StructField("stream_id", LongType), StructField("timestamp", LongType),
        StructField("value", DoubleType), StructField("secret", DoubleType)))
      def row(sid: Long, ts: Long, v: Double) =
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array[Any](sid, ts, v, 1.23), schema)
      lbus.publish(Markers.LiveBatch("amp-external",
        Seq(row(1L, 1906745601L, 7.5), row(99L, 1906745602L, 8.5))))
      val liveFrame = readFrame()
      assert(liveFrame.msgType === Wire.Live)
      val liveJson = new String(liveFrame.body, "UTF-8")
      assert(liveJson.contains(""""label":"a""""))
      assert(liveJson.contains(""""stream_id":1""") && liveJson.contains("7.5"))
      assert(!liveJson.contains(""""stream_id":99""") && !liveJson.contains("8.5"))
      assert(!liveJson.contains("secret")) // column filter (P6/X2)

      // 3. then the batch's PUSH marker on the same connection
      mbus.publish(Markers.Marker("amp-external", 1906745601L, 9L))
      val push = readFrame()
      assert(push.msgType === Wire.Push)
      assert(new String(push.body, "UTF-8").contains("1906745601"))
    } finally { sock.close(); server.close() }
  }

  test("live relay: rows during backfill buffer and release across the seam") {
    import graft.serve.{WireServer => _}
    import graft.streaming.Markers
    // Unit-level via the bus: subscribe with a history window covering the
    // corpus; publish a batch BEFORE the server finishes backfill is racy
    // over a socket, so instead verify the seam rule end to end: a live row
    // with a timestamp inside the history range (<= lasthist) must NOT be
    // re-delivered after backfill, one beyond it must.
    import org.apache.spark.sql.types.{LongType, DoubleType, StructField, StructType}
    val lbus = new Markers.LiveBus
    val server = new WireServer(svc, live = Some(lbus))
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      sock.setSoTimeout(30000)
      out.write(Wire.pack(0,
        """{"request":"subscribe","collection":"amp-external",
          |"labels":{"a":[0]},"columns":["value"],
          |"start":1704067200,"stop":0}""".stripMargin.getBytes("UTF-8")))
      out.flush()
      def readFrame(): Wire.Message = {
        val header = new Array[Byte](Wire.HeaderLen)
        in.readFully(header)
        val len = java.nio.ByteBuffer.wrap(header, 3, 4).getInt
        val body = new Array[Byte](len)
        in.readFully(body)
        Wire.Message(header(0) & 0xff, ((header(1) & 0xff) << 8) | (header(2) & 0xff), body)
      }
      assert(readFrame().msgType === Wire.VersionCheck)
      var m = readFrame()
      var lastHist = Long.MinValue
      while (m.msgType == Wire.History) {
        val body = new String(Wire.decompress(m.body), "UTF-8")
        """"timestamp":(\d+)""".r.findAllMatchIn(body)
          .foreach(mm => lastHist = math.max(lastHist, mm.group(1).toLong))
        m = readFrame()
      }
      assert(m.msgType === Wire.Subscribe)
      assert(lastHist > 0)

      val schema = StructType(Seq(
        StructField("stream_id", LongType), StructField("timestamp", LongType),
        StructField("value", DoubleType)))
      def row(ts: Long) =
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array[Any](0L, ts, 1.0), schema)
      // one stale row (== lastHist, already served in history) and one new:
      // only the new one comes through
      lbus.publish(Markers.LiveBatch("amp-external", Seq(row(lastHist))))
      lbus.publish(Markers.LiveBatch("amp-external", Seq(row(lastHist + 10))))
      val live = readFrame()
      assert(live.msgType === Wire.Live)
      val json = new String(live.body, "UTF-8")
      assert(json.contains(s""""timestamp":${lastHist + 10}"""))
      assert(!json.contains(s""""timestamp":$lastHist,"""))
    } finally { sock.close(); server.close() }
  }

  test("two concurrent subscribers each get only their own live rows") {
    import graft.streaming.Markers
    import org.apache.spark.sql.types.{LongType, DoubleType, StructField, StructType}
    val lbus = new Markers.LiveBus
    val server = new WireServer(svc, live = Some(lbus))
    def connect(streams: Seq[Long]): (Socket, DataInputStream) = {
      val sock = new Socket("127.0.0.1", server.boundPort)
      sock.setSoTimeout(30000)
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      out.write(Wire.pack(0,
        s"""{"request":"subscribe","collection":"amp-external",
           |"labels":{"x":[${streams.mkString(",")}]},"columns":["value"],
           |"start":1704067200,"stop":0}""".stripMargin.getBytes("UTF-8")))
      out.flush()
      def readFrame(): Wire.Message = {
        val header = new Array[Byte](Wire.HeaderLen)
        in.readFully(header)
        val len = java.nio.ByteBuffer.wrap(header, 3, 4).getInt
        val body = new Array[Byte](len)
        in.readFully(body)
        Wire.Message(header(0) & 0xff, ((header(1) & 0xff) << 8) | (header(2) & 0xff), body)
      }
      assert(readFrame().msgType === Wire.VersionCheck)
      var m = readFrame()
      while (m.msgType == Wire.History) m = readFrame()
      assert(m.msgType === Wire.Subscribe)
      (sock, in)
    }
    val (s1, in1) = connect(Seq(1L))
    val (s2, in2) = connect(Seq(2L))
    try {
      val schema = StructType(Seq(
        StructField("stream_id", LongType), StructField("timestamp", LongType),
        StructField("value", DoubleType)))
      def row(sid: Long, ts: Long, v: Double) =
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array[Any](sid, ts, v), schema)
      lbus.publish(Markers.LiveBatch("amp-external",
        Seq(row(1L, 1906745601L, 1.5), row(2L, 1906745602L, 2.5))))
      def readLive(in: DataInputStream): String = {
        val header = new Array[Byte](Wire.HeaderLen)
        in.readFully(header)
        val len = java.nio.ByteBuffer.wrap(header, 3, 4).getInt
        val body = new Array[Byte](len)
        in.readFully(body)
        assert((header(0) & 0xff) === Wire.Version)
        new String(body, "UTF-8")
      }
      val j1 = readLive(in1)
      val j2 = readLive(in2)
      assert(j1.contains(""""stream_id":1""") && !j1.contains(""""stream_id":2"""))
      assert(j2.contains(""""stream_id":2""") && !j2.contains(""""stream_id":1"""))
    } finally { s1.close(); s2.close(); server.close() }
  }

  test("oversized or bad-version frames drop the connection, no allocation") {
    val server = new WireServer(svc)
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      sock.setSoTimeout(30000)
      // header claiming a ~2GB body: server must close without reading it
      val buf = java.nio.ByteBuffer.allocate(Wire.HeaderLen)
      buf.put(Wire.Version.toByte).putShort(0).putInt(Int.MaxValue - 7)
      out.write(buf.array()); out.flush()
      // the greeting was already written at connect; after it, EOF
      val greet = new Array[Byte](Wire.HeaderLen)
      in.readFully(greet)
      val glen = java.nio.ByteBuffer.wrap(greet, 3, 4).getInt
      in.readFully(new Array[Byte](glen))
      assert(in.read() === -1) // EOF: connection dropped
    } finally { sock.close(); server.close() }
  }

  test("malformed frames dead-letter; the connection survives body-layer failures") {
    val dl = java.nio.file.Files.createTempDirectory("graftwiredl").toString
    val server = new WireServer(svc, deadLetterPath = Some(dl))
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      sock.setSoTimeout(30000)
      def readFrame(): Wire.Message = {
        val header = new Array[Byte](Wire.HeaderLen)
        in.readFully(header)
        val len = java.nio.ByteBuffer.wrap(header, 3, 4).getInt
        val body = new Array[Byte](len)
        in.readFully(body)
        Wire.unpack(header ++ body)
      }
      assert(readFrame().msgType === Wire.VersionCheck)
      // a validly-framed but undecodable body: error reply names the
      // capture, and the SAME socket keeps serving
      val junk = """{"request": this is not json"""
      out.write(Wire.pack(0, junk.getBytes("UTF-8"))); out.flush()
      val err = readFrame()
      assert(err.msgType === Wire.QueryCancelled)
      assert(new String(err.body, "UTF-8").contains("dead-letter"))
      // right shape, wrong arg types: also captured, also survivable
      out.write(Wire.pack(0,
        """{"request":"streams","collection":"amp-external","minid":"x"}"""
          .getBytes("UTF-8"))); out.flush()
      assert(readFrame().msgType === Wire.QueryCancelled)
      // the connection is still alive: a valid request round-trips
      out.write(Wire.pack(0, """{"request":"collections"}""".getBytes("UTF-8")))
      out.flush()
      assert(readFrame().msgType === Wire.Collections)
      // both bad bodies landed verbatim with their errors
      val files = new java.io.File(dl).listFiles().map(_.getName).sorted
      assert(files.count(_.endsWith(".raw")) === 2)
      assert(files.count(_.endsWith(".err")) === 2)
      val raws = new java.io.File(dl).listFiles().filter(_.getName.endsWith(".raw"))
        .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")).toSet
      assert(raws.contains(junk))

      // header-layer failure: captured too, but the connection must drop
      // (a corrupt length cannot be resynced)
      val sock2 = new Socket("127.0.0.1", server.boundPort)
      try {
        val out2 = new DataOutputStream(sock2.getOutputStream)
        val in2 = new DataInputStream(sock2.getInputStream)
        sock2.setSoTimeout(30000)
        val buf = java.nio.ByteBuffer.allocate(Wire.HeaderLen)
        buf.put(99.toByte).putShort(0).putInt(4)
        out2.write(buf.array()); out2.flush()
        // greeting first, then EOF
        val greet = new Array[Byte](Wire.HeaderLen)
        in2.readFully(greet)
        in2.readFully(new Array[Byte](java.nio.ByteBuffer.wrap(greet, 3, 4).getInt))
        assert(in2.read() === -1)
        val errs = new java.io.File(dl).listFiles().filter(_.getName.endsWith(".err"))
          .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
        assert(errs.exists(_.contains("bad frame header")))
      } finally sock2.close()
    } finally { sock.close(); server.close() }
  }

  test("matrix request returns one summary row per label") {
    val server = new WireServer(svc)
    try {
      val frames = roundtrip(server,
        """{"request":"matrix","collection":"amp-external",
          |"labels":{"a":[0,1,2],"b":[8,9]},
          |"start":1704067200,"stop":1706745600,
          |"aggs":[["value","avg"],["value","max"]]}""".stripMargin)
      val body = new String(Wire.decompress(frames.head.body), "UTF-8")
      assert(body.contains(""""nntsclabel":"a"""") && body.contains(""""nntsclabel":"b""""))
      assert(body.contains("value_avg") && body.contains("value_max"))
    } finally server.close()
  }

  test("unsubscribe drops streams from a live subscription without disconnecting") {
    import graft.serve.WireClient
    import graft.streaming.Markers
    import org.apache.spark.sql.types.{LongType, DoubleType, StructField, StructType}
    val lbus = new Markers.LiveBus
    val server = new WireServer(svc, live = Some(lbus))
    val client = new WireClient("127.0.0.1", server.boundPort)
    val sub = client.subscribe(
      "amp-external", Map("x" -> Seq(1L, 2L)), Seq("value"),
      start = 1704067200L, stop = 0L)
    try {
      assert(lbus.subscriberCount("amp-external") === 1)
      val schema = StructType(Seq(
        StructField("stream_id", LongType), StructField("timestamp", LongType),
        StructField("value", DoubleType)))
      def row(sid: Long, ts: Long) =
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array[Any](sid, ts, 1.0), schema)
      // both streams live before the unsubscribe
      lbus.publish(Markers.LiveBatch("amp-external",
        Seq(row(1L, 1906745601L), row(2L, 1906745602L))))
      val before = sub.next()
      assert(before.isInstanceOf[WireClient.LiveRows])
      val beforeRows = before.asInstanceOf[WireClient.LiveRows].rows
      assert(beforeRows.map(r => r("stream_id").asInstanceOf[Long]).sorted
        === Seq(1L, 2L))
      // drop stream 1; the ack rides the event stream
      sub.unsubscribe(Seq(1L))
      assert(sub.next() === WireClient.Unsubscribed(1L))
      // only stream 2's rows arrive now
      lbus.publish(Markers.LiveBatch("amp-external",
        Seq(row(1L, 1906745611L), row(2L, 1906745612L))))
      val after = sub.next().asInstanceOf[WireClient.LiveRows]
      assert(after.rows.map(r => r("stream_id").asInstanceOf[Long]) === Seq(2L))
      // dropping the LAST stream deregisters the subscription from the bus
      sub.unsubscribe(Seq(2L))
      assert(sub.next() === WireClient.Unsubscribed(0L))
      assert(lbus.subscriberCount("amp-external") === 0)
      // the CONNECTION survives: a fresh subscribe on the same server works
    } finally { sub.close(); server.close() }
  }

  test("unsubscribe ack counts DISTINCT remaining streams across overlapping subscriptions") {
    import graft.streaming.Markers
    val lbus = new Markers.LiveBus
    val server = new WireServer(svc, live = Some(lbus))
    val sock = new Socket("127.0.0.1", server.boundPort)
    sock.setSoTimeout(30000)
    try {
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      def readFrame(): Wire.Message = {
        val header = new Array[Byte](Wire.HeaderLen)
        in.readFully(header)
        val len = java.nio.ByteBuffer.wrap(header, 3, 4).getInt
        val body = new Array[Byte](len)
        in.readFully(body)
        Wire.Message(header(0) & 0xff, ((header(1) & 0xff) << 8) | (header(2) & 0xff), body)
      }
      def subscribe(streams: Seq[Long]): Unit = {
        out.write(Wire.pack(0,
          s"""{"request":"subscribe","collection":"amp-external",
             |"labels":{"x":[${streams.mkString(",")}]},"columns":["value"],
             |"start":1704067200,"stop":0}""".stripMargin.getBytes("UTF-8")))
        out.flush()
        var m = readFrame()
        while (m.msgType == Wire.History) m = readFrame()
        assert(m.msgType === Wire.Subscribe)
      }
      def unsubscribe(streams: Seq[Long]): String = {
        out.write(Wire.pack(0,
          s"""{"request":"unsubscribe","collection":"amp-external",
             |"streams":[${streams.mkString(",")}]}""".stripMargin.getBytes("UTF-8")))
        out.flush()
        var m = readFrame()
        while (m.msgType != Wire.Unsubscribe) m = readFrame()
        new String(m.body, "UTF-8")
      }
      assert(readFrame().msgType === Wire.VersionCheck)
      // two subscriptions sharing stream 2: {1, 2} and {2}
      subscribe(Seq(1L, 2L))
      subscribe(Seq(2L))
      // dropping stream 1 leaves stream 2 subscribed in BOTH subs — the
      // ack counts it ONCE (a sum would say 2)
      assert(unsubscribe(Seq(1L)).contains("\"remaining\":1"))
      // dropping stream 2 empties both: 0 now unambiguously means "no
      // stream of this collection is still live on this connection"
      assert(unsubscribe(Seq(2L)).contains("\"remaining\":0"))
      assert(lbus.subscriberCount("amp-external") === 0)
    } finally { sock.close(); server.close() }
  }

  test("unsubscribe deregisters markers-only subscriptions too (no live bus)") {
    import graft.serve.{Wire, WireClient}
    import graft.streaming.Markers
    val mbus = new Markers.MarkerBus
    val server = new WireServer(svc, markers = Some(mbus)) // live = None
    val client = new WireClient("127.0.0.1", server.boundPort)
    val sub = client.subscribe(
      "amp-external", Map("x" -> Seq(1L)), Seq("value"),
      start = 1704067200L, stop = 0L)
    try {
      assert(mbus.subscriberCount("amp-external") === 1)
      mbus.publish(Markers.Marker("amp-external", 1906745601L, 1L))
      assert(sub.next().isInstanceOf[WireClient.Push])
      // dropping the LAST stream must close the PUSH-marker handle even
      // though there is no relay — the ack must not claim deregistration
      // while markers keep flowing
      sub.unsubscribe(Seq(1L))
      assert(sub.next() === WireClient.Unsubscribed(0L))
      assert(mbus.subscriberCount("amp-external") === 0)
    } finally { sub.close(); server.close() }
  }

  test("version-check greeting: client validates; mismatch is a typed failure") {
    import graft.serve.WireClient
    val server = new WireServer(svc)
    try {
      // happy path: WireClient consumed the greeting inside collections()
      val client = new WireClient("127.0.0.1", server.boundPort)
      assert(client.collections().nonEmpty)
    } finally server.close()
    // mismatch path: a fake server greeting a different API version
    val fake = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      val s = fake.accept()
      s.getOutputStream.write(Wire.pack(
        Wire.VersionCheck, """{"apiversion":"99.0"}""".getBytes("UTF-8")))
      s.getOutputStream.flush()
    })
    t.setDaemon(true); t.start()
    try {
      val client = new WireClient("127.0.0.1", fake.getLocalPort)
      val e = intercept[WireClient.WireClientException](client.collections())
      assert(e.getMessage.contains("99.0"))
    } finally fake.close()
  }

  test("unknown requests and errors come back as protocol errors") {
    val server = new WireServer(svc)
    try {
      val bad = roundtrip(server, """{"request":"nope"}""")
      assert(bad.head.msgType === Wire.QueryCancelled)
      val badColl = roundtrip(server,
        """{"request":"schema","collection":"missing"}""")
      assert(badColl.head.msgType === Wire.QueryCancelled)
    } finally server.close()
  }
}
