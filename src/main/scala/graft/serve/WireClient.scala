package graft.serve

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket

/** Client-side driver for the export protocol — the JVM twin of the
  * reference's NNTSCClient loop (/root/reference/libnntsc/exporter.py:
  * 641-657 pages streams until `more=false`; the client library consumes
  * history → ack → live → PUSH frames off one socket). `WireServer` speaks
  * the same frames; this class closes the loop so a JVM consumer (or a
  * spec) can drive the full protocol without hand-rolling framing.
  *
  * Connection model mirrors the reference clients:
  *   - request/reply calls (collections, schema, streams page, aggregate,
  *     matrix) use one short-lived connection per request — the reply's end
  *     is the socket's end, so no frame counting is needed;
  *   - `subscribe` keeps its connection open and exposes the frame stream
  *     (history chunks until the ack, then live/PUSH events) for the
  *     subscription's lifetime.
  */
final class WireClient(host: String, port: Int) {
  import WireClient._

  /** NNTSC_REQ_COLLECTION. */
  def collections(): Seq[Map[String, Any]] =
    requestAll("""{"request":"collections"}""").head.body match {
      case b => JsonMini.parse(s"""{"rows":${new String(b, "UTF-8")}}""")("rows")
        .asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[String, Any]])
    }

  /** NNTSC_REQ_SCHEMA → (stream fields, data fields) as (name, type). */
  def schema(collection: String): (Seq[(String, String)], Seq[(String, String)]) = {
    val body = new String(
      requestAll(s"""{"request":"schema","collection":${JsonMini.str(collection)}}""")
        .head.body, "UTF-8")
    val m = JsonMini.parse(body)
    def fields(k: String) = m(k).asInstanceOf[Seq[Any]].map { f =>
      val fm = f.asInstanceOf[Map[String, Any]]
      (fm("name").asInstanceOf[String], fm("type").asInstanceOf[String])
    }
    (fields("streams"), fields("data"))
  }

  /** Incremental stream listing, paged until `more=false`
    * (exporter.py:641-657): each page's max stream id seeds the next
    * request's `minid`, exactly the reference client's loop.
    */
  def streams(collection: String): Seq[Map[String, Any]] = {
    val out = Seq.newBuilder[Map[String, Any]]
    // the server filter is STRICTLY greater (stream_id > minid), so the
    // opening page must start below every legal id — 0 would silently
    // skip a stream with id 0 (ids are Int-ranged by the server contract)
    var minid = Int.MinValue.toLong
    var more = true
    while (more) {
      val body = new String(
        requestAll(
          s"""{"request":"streams","collection":${JsonMini.str(collection)},"minid":$minid}""")
          .head.body, "UTF-8")
      val m = JsonMini.parse(body)
      val rows = m("rows").asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[String, Any]])
      out ++= rows
      more = m("more").asInstanceOf[Boolean]
      if (more) {
        require(rows.nonEmpty, "server reported more=true with an empty page")
        minid = rows.map(r => JsonMini.asLong(r("stream_id"))).max
      }
    }
    out.result()
  }

  /** NNTSC_AGGREGATE: all history chunks, decompressed and parsed.
    * `arrow = true` opts into Arrow IPC bodies for the bulk frames
    * (decoded transparently — same HistoryChunk out, ~2x the rows/s on
    * large backfills); the server falls back to JSON per frame for
    * chunks Arrow cannot carry, which parseChunk sniffs.
    */
  def aggregate(
      collection: String,
      labels: Map[String, Seq[Long]],
      aggs: Seq[(String, String)],
      start: Long,
      stop: Long,
      binsize: Long,
      arrow: Boolean = false,
      arrowCodec: String = ""): Seq[HistoryChunk] =
    requestAll(
      s"""{"request":"aggregate","collection":${JsonMini.str(collection)},
         |"labels":${labelsJson(labels)},"start":$start,"stop":$stop,
         |"binsize":$binsize,"aggs":${aggsJson(aggs)}${encJson(arrow, arrowCodec)}}""".stripMargin)
      .filter(_.msgType == Wire.History)
      .map(parseChunk)

  /** NNTSC_MATRIX: one summary row per label. */
  def matrix(
      collection: String,
      labels: Map[String, Seq[Long]],
      aggs: Seq[(String, String)],
      start: Long,
      stop: Long): Seq[Map[String, Any]] = {
    val m = requestAll(
      s"""{"request":"matrix","collection":${JsonMini.str(collection)},
         |"labels":${labelsJson(labels)},"start":$start,"stop":$stop,
         |"aggs":${aggsJson(aggs)}}""".stripMargin).head
    JsonMini.parse(new String(Wire.decompress(m.body), "UTF-8"))("rows")
      .asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[String, Any]])
  }

  /** NNTSC_SUBSCRIBE: open a long-lived subscription. Blocks until the
    * backfill is fully consumed (history frames up to the ack), then
    * returns the handle whose `next()` yields post-ack events in arrival
    * order — Live row batches and PUSH markers.
    */
  def subscribe(
      collection: String,
      labels: Map[String, Seq[Long]],
      columns: Seq[String],
      start: Long,
      stop: Long,
      arrow: Boolean = false,
      arrowCodec: String = ""): Subscription = {
    val sock = new Socket(host, port)
    try {
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      expectGreeting(in)
      out.write(Wire.pack(0,
        s"""{"request":"subscribe","collection":${JsonMini.str(collection)},
           |"labels":${labelsJson(labels)},"columns":${columnsJson(columns)},
           |"start":$start,"stop":$stop${encJson(arrow, arrowCodec)}}""".stripMargin.getBytes("UTF-8")))
      out.flush()
      val history = Seq.newBuilder[HistoryChunk]
      var m = readFrame(in)
      while (m.msgType == Wire.History) {
        history += parseChunk(m)
        m = readFrame(in)
      }
      m.msgType match {
        case Wire.Subscribe => new Subscription(sock, in, collection, history.result())
        case Wire.QueryCancelled => // e.g. backfill timeout: typed failure
          throw new WireClientException(new String(m.body, "UTF-8"))
        case other =>
          throw new WireClientException(
            s"expected subscribe ack after history, got msgType $other")
      }
    } catch {
      // no Subscription handle exists on any failure path — the socket
      // would leak without this (protocol errors, truncated backfill, IO)
      case e: Throwable => sock.close(); throw e
    }
  }

  // ---- plumbing -------------------------------------------------------

  private def encJson(arrow: Boolean, codec: String = ""): String =
    if (!arrow) ""
    else if (codec.isEmpty) ""","encoding":"arrow""""
    else s""","encoding":"arrow+$codec""""

  /** Consume and validate the server's on-connect VersionCheck greeting
    * (exporter.py:1152-1157) — the first frame on EVERY connection. A
    * missing greeting or an incompatible API version is a typed failure
    * BEFORE any request is sent, like the reference client's disconnect.
    */
  private def expectGreeting(in: DataInputStream): Unit = {
    val m = readFrame(in)
    if (m.msgType != Wire.VersionCheck)
      throw new WireClientException(
        s"expected version-check greeting, got msgType ${m.msgType}")
    val v = JsonMini.parse(new String(m.body, "UTF-8"))("apiversion")
    if (v != Wire.ClientApiVersion)
      throw new WireClientException(
        s"server client-API version $v; this client speaks ${Wire.ClientApiVersion}")
  }

  /** One request on a fresh connection; the reply is every frame up to the
    * server's EOF (half-close signals end-of-request like the spec
    * harness and the reference's short-lived request clients).
    */
  private def requestAll(json: String): Seq[Wire.Message] = {
    val sock = new Socket(host, port)
    try {
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      expectGreeting(in)
      out.write(Wire.pack(0, json.getBytes("UTF-8")))
      out.flush()
      sock.shutdownOutput()
      val msgs = Seq.newBuilder[Wire.Message]
      var open = true
      while (open) readFrameOpt(in) match {
        case Some(m) => msgs += m
        case None    => open = false // clean EOF at a frame boundary
      }
      val out0 = msgs.result()
      out0.find(_.msgType == Wire.QueryCancelled).foreach { e =>
        throw new WireClientException(new String(e.body, "UTF-8"))
      }
      // a server (or proxy) that accepts and closes without writing ANY
      // frame must surface as the typed protocol error, not as the
      // callers' `.head` blowing up on an empty list
      if (out0.isEmpty)
        throw new WireClientException("connection closed with no reply frame")
      out0
    } finally sock.close()
  }
}

object WireClient {

  final class WireClientException(msg: String) extends RuntimeException(msg)

  final case class HistoryChunk(
      label: String,
      more: Boolean,
      freq: Long,
      rows: Seq[Map[String, Any]])

  sealed trait Event
  final case class LiveRows(label: String, rows: Seq[Map[String, Any]]) extends Event
  final case class Push(collection: String, timestamp: Long) extends Event
  /** Ack for an in-flight [[Subscription.unsubscribe]]: `remaining` is
    * how many DISTINCT streams this connection is still subscribed to
    * for the collection (a stream held by several subscriptions counts
    * once — 0 means none left).
    */
  final case class Unsubscribed(remaining: Long) extends Event

  /** A live subscription: backfill already consumed (`history`); `next()`
    * blocks for the next post-ack event. Close when done.
    */
  final class Subscription(
      sock: Socket,
      in: DataInputStream,
      collection: String,
      val history: Seq[HistoryChunk]) {

    /** NNTSC_UNSUBSCRIBE: drop streams from this live subscription
      * without disconnecting (exporter.py:894-906). Fire-and-read: the
      * server's ack arrives in the event stream as [[Unsubscribed]] —
      * consume events until it appears to know the deregistration took
      * effect (live frames already in flight may precede it).
      */
    def unsubscribe(streams: Seq[Long]): Unit = {
      val out = new java.io.DataOutputStream(sock.getOutputStream)
      out.write(Wire.pack(0,
        (s"""{"request":"unsubscribe","collection":${JsonMini.str(collection)},""" +
          s""""streams":${streams.mkString("[", ",", "]")}}""").getBytes("UTF-8")))
      out.flush()
    }

    /** Last timestamp per label over the whole backfill — the client-side
      * seam bookkeeping (the reference client tracks it to resume plots).
      */
    val lastHistory: Map[String, Long] =
      history
        .groupBy(_.label)
        .view.mapValues(_.flatMap(_.rows)
          .flatMap(r => r.get("timestamp").collect { case v if v != null => JsonMini.asLong(v) })
          .maxOption.getOrElse(Long.MinValue))
        .toMap

    def next(): Event = {
      val m = readFrame(in)
      m.msgType match {
        case Wire.Live =>
          val b = JsonMini.parse(new String(m.body, "UTF-8"))
          LiveRows(
            b("label").asInstanceOf[String],
            b("rows").asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[String, Any]]))
        case Wire.Push =>
          val b = JsonMini.parse(new String(m.body, "UTF-8"))
          Push(b("collection").asInstanceOf[String], JsonMini.asLong(b("timestamp")))
        case Wire.Unsubscribe =>
          val b = JsonMini.parse(new String(m.body, "UTF-8"))
          Unsubscribed(JsonMini.asLong(b("remaining")))
        case other =>
          throw new WireClientException(s"unexpected frame in live mode: $other")
      }
    }

    def close(): Unit = sock.close()
  }

  private def readFrame(in: DataInputStream): Wire.Message =
    readFrameOpt(in).getOrElse(
      throw new WireClientException("connection closed by server"))

  /** None on a CLEAN end-of-stream (EOF before the first header byte);
    * an EOF anywhere inside a frame is a truncated reply and raises a
    * typed failure — treating it as end-of-reply would silently hand the
    * caller a partial result.
    */
  private def readFrameOpt(in: DataInputStream): Option[Wire.Message] = {
    val first = in.read()
    if (first < 0) None
    else {
      val header = new Array[Byte](Wire.HeaderLen)
      header(0) = first.toByte
      try {
        in.readFully(header, 1, Wire.HeaderLen - 1)
        val version = header(0) & 0xff
        require(version == Wire.Version, s"bad frame version $version")
        val len = java.nio.ByteBuffer.wrap(header, 3, 4).getInt
        require(len >= 0 && len <= Wire.MaxFrameLen, s"bad frame length $len")
        val body = new Array[Byte](len)
        in.readFully(body)
        Some(Wire.Message(version, ((header(1) & 0xff) << 8) | (header(2) & 0xff), body))
      } catch {
        case _: java.io.EOFException =>
          throw new WireClientException("connection dropped mid-frame (truncated reply)")
      }
    }
  }

  /** Sniffs the body encoding per frame (Arrow IPC marker vs zlib):
    * a server may legitimately mix encodings in one reply stream.
    */
  private def parseChunk(m: Wire.Message): HistoryChunk = {
    if (ArrowFrames.isArrow(m.body)) {
      val d = ArrowFrames.decode(m.body)
      val names = d.schema.fieldNames
      return HistoryChunk(
        d.label, d.more, d.freq,
        d.rows.map(r => names.zip(r.toSeq).toMap))
    }
    val b = JsonMini.parse(new String(Wire.decompress(m.body), "UTF-8"))
    HistoryChunk(
      // aggregate's empty reply carries label null
      Option(b("label")).map(_.asInstanceOf[String]).getOrElse(""),
      b("more").asInstanceOf[Boolean],
      b.get("freq").map(JsonMini.asLong).getOrElse(0L),
      b("rows").asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[String, Any]]))
  }

  private def labelsJson(labels: Map[String, Seq[Long]]): String =
    labels.toSeq.sortBy(_._1)
      .map { case (l, ids) => s"${JsonMini.str(l)}:${ids.mkString("[", ",", "]")}" }
      .mkString("{", ",", "}")

  private def aggsJson(aggs: Seq[(String, String)]): String =
    aggs.map { case (c, f) => s"[${JsonMini.str(c)},${JsonMini.str(f)}]" }
      .mkString("[", ",", "]")

  private def columnsJson(cols: Seq[String]): String =
    cols.map(JsonMini.str).mkString("[", ",", "]")
}
