package graft.serve

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** S6 — the export protocol endpoint: the reference serves clients over a
  * TCP socket with length-framed request/reply messages
  * (/root/reference/libnntsc/exporter.py:NNTSCExporter + clientthreads).
  * This is the Spark-native service bound to that wire contract: requests
  * are `Wire`-framed JSON commands, replies are `Wire`-framed JSON bodies
  * (history compressed, like the reference), dispatching onto `Service`.
  *
  * Deliberately minimal concurrency: one daemon accept loop, one thread
  * per client (the reference likewise threads per client). The heavy
  * lifting is Spark's; the server only frames results.
  *
  * Request vocabulary (JSON, one object per frame):
  *   {"request":"collections"}
  *   {"request":"schema","collection":"amp-icmp"}
  *   {"request":"streams","collection":"amp-external","minid":0}
  *   {"request":"aggregate","collection":...,"labels":{"g0":[1,2]},
  *    "start":...,"stop":...,"binsize":...,"aggs":[["value","avg"],...]}
  */
final class WireServer(
    service: Service,
    port: Int = 0,
    // X3-over-the-wire: subscribe replies keep the connection open and
    // forward this bus's push markers for the subscribed collection
    markers: Option[graft.streaming.Markers.MarkerBus] = None) {

  private val server = new ServerSocket(port)
  @volatile private var running = true

  def boundPort: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), s"graft-wire-client")
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable if !running => () case _: Throwable => () }
    }
  }, "graft-wire-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = { running = false; server.close() }

  private def handle(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    try {
      var open = true
      while (open) {
        val header = new Array[Byte](Wire.HeaderLen)
        try in.readFully(header)
        catch { case _: java.io.EOFException => open = false }
        if (open) {
          val len = java.nio.ByteBuffer.wrap(header, 3, 4).getInt
          val body = new Array[Byte](len)
          in.readFully(body)
          val reply = dispatch(new String(body, "UTF-8"), out)
          out.synchronized { out.write(reply); out.flush() }
        }
      }
    } catch {
      case _: Throwable => () // client went away; the reference drops it too
    } finally sock.close()
  }

  private def dispatch(request: String, out: DataOutputStream): Array[Byte] =
    try {
      val req = JsonMini.parse(request)
      req("request") match {
        case "subscribe" =>
          // X1-X3 over the wire: backfill history frames now, then keep
          // forwarding the collection's PUSH markers on this connection
          // (exporter.py: subscribe -> history -> live/push stream)
          val coll = req("collection").asInstanceOf[String]
          val labels = req("labels").asInstanceOf[Map[String, Any]]
            .map { case (k, v) =>
              k -> v.asInstanceOf[Seq[Any]].map(_.asInstanceOf[Double].toLong)
            }
          val columns = req("columns").asInstanceOf[Seq[Any]].map(_.asInstanceOf[String])
          val chunks = service.history(
            coll, labels, columns,
            req("start").asInstanceOf[Double].toLong,
            req("stop").asInstanceOf[Double].toLong)
          chunks.foreach { c =>
            val body =
              s"""{"label":${JsonMini.str(c.label)},"more":${c.more},""" +
                s""""freq":${c.freq},"rows":${JsonMini.rows(c.rows)}}"""
            val frame = Wire.pack(Wire.History, Wire.compress(body.getBytes("UTF-8")))
            out.synchronized { out.write(frame); out.flush() }
          }
          markers.foreach(_.subscribe(coll) { m =>
            val frame = Wire.pack(
              Wire.Push,
              s"""{"collection":${JsonMini.str(m.collection)},"timestamp":${m.timestamp}}"""
                .getBytes("UTF-8"))
            try out.synchronized { out.write(frame); out.flush() }
            catch { case _: Throwable => () } // client gone; exporter drops it too
          })
          Wire.pack(Wire.Subscribe, """{"subscribed":true}""".getBytes("UTF-8"))
        case "collections" =>
          val body = service.collections()
            .map { case (id, m, s) =>
              s"""{"id":$id,"module":${JsonMini.str(m)},"modsubtype":${JsonMini.str(s)}}"""
            }.mkString("[", ",", "]")
          Wire.pack(Wire.Collections, body.getBytes("UTF-8"))
        case "schema" =>
          val (ss, ds) = service.schema(req("collection").asInstanceOf[String])
          def fields(st: StructType) = st.fields
            .map(f => s"""{"name":${JsonMini.str(f.name)},"type":${JsonMini.str(f.dataType.simpleString)}}""")
            .mkString("[", ",", "]")
          Wire.pack(Wire.Schemas,
            s"""{"streams":${fields(ss)},"data":${fields(ds)}}""".getBytes("UTF-8"))
        case "streams" =>
          val coll = req("collection").asInstanceOf[String]
          val minid = req.getOrElse("minid", 0d).asInstanceOf[Double].toInt
          val page = service.streamsPage(coll, minid)
          val body =
            s"""{"rows":${JsonMini.rows(page.rows)},"more":${page.more}}"""
          Wire.pack(Wire.Streams, body.getBytes("UTF-8"))
        case "aggregate" =>
          val coll = req("collection").asInstanceOf[String]
          val labels = req("labels").asInstanceOf[Map[String, Any]]
            .map { case (k, v) =>
              k -> v.asInstanceOf[Seq[Any]].map(_.asInstanceOf[Double].toLong)
            }
          val aggs = req("aggs").asInstanceOf[Seq[Any]]
            .map(_.asInstanceOf[Seq[Any]])
            .map(p => graft.query.AggSpec(p(0).asInstanceOf[String], p(1).asInstanceOf[String]))
          val chunks = service.aggregate(
            coll, labels, aggs,
            req("start").asInstanceOf[Double].toLong,
            req("stop").asInstanceOf[Double].toLong,
            req("binsize").asInstanceOf[Double].toLong)
          // one frame per chunk (the reference's chunked HISTORY stream),
          // compressed like the reference's history bodies
          chunks.map { c =>
            val body =
              s"""{"label":${JsonMini.str(c.label)},"more":${c.more},""" +
                s""""freq":${c.freq},"rows":${JsonMini.rows(c.rows)}}"""
            Wire.pack(Wire.History, Wire.compress(body.getBytes("UTF-8")))
          }.reduceOption(_ ++ _).getOrElse(
            Wire.pack(Wire.History,
              Wire.compress("""{"label":null,"more":false,"rows":[]}""".getBytes("UTF-8"))))
        case "matrix" =>
          val coll = req("collection").asInstanceOf[String]
          val labels = req("labels").asInstanceOf[Map[String, Any]]
            .map { case (k, v) =>
              k -> v.asInstanceOf[Seq[Any]].map(_.asInstanceOf[Double].toLong)
            }
          val aggs = req("aggs").asInstanceOf[Seq[Any]]
            .map(_.asInstanceOf[Seq[Any]])
            .map(p => graft.query.AggSpec(p(0).asInstanceOf[String], p(1).asInstanceOf[String]))
          val rows = service.matrix(
            coll, labels, aggs,
            req("start").asInstanceOf[Double].toLong,
            req("stop").asInstanceOf[Double].toLong)
          Wire.pack(Wire.History,
            Wire.compress(s"""{"rows":${JsonMini.rows(rows)}}""".getBytes("UTF-8")))
        case other =>
          Wire.pack(Wire.QueryCancelled,
            s"""{"error":"unknown request ${other}"}""".getBytes("UTF-8"))
      }
    } catch {
      case e: Service.QueryCancelledException =>
        Wire.pack(Wire.QueryCancelled,
          s"""{"error":${JsonMini.str(e.getMessage)}}""".getBytes("UTF-8"))
      case e: Throwable =>
        Wire.pack(Wire.QueryCancelled,
          s"""{"error":${JsonMini.str(String.valueOf(e.getMessage))}}""".getBytes("UTF-8"))
    }
}

/** Tiny JSON helpers — enough for the protocol surface, no dependencies.
  * Parsing accepts the request vocabulary above (objects, arrays, strings,
  * numbers, booleans); numbers surface as Double (callers convert).
  */
private[serve] object JsonMini {

  def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def value(v: Any): String = v match {
    case null => "null"
    case s: String => str(s)
    case b: Boolean => b.toString
    case d: Double => if (d.isNaN || d.isInfinite) "null" else d.toString
    case f: Float => value(f.toDouble)
    case n: Number => n.toString
    case seq: scala.collection.Seq[_] => seq.map(value).mkString("[", ",", "]")
    case r: Row => row(r)
    case other => str(String.valueOf(other))
  }

  def row(r: Row): String =
    r.schema.fieldNames.zipWithIndex
      .map { case (n, i) => s"${str(n)}:${value(if (r.isNullAt(i)) null else r.get(i))}" }
      .mkString("{", ",", "}")

  def rows(rs: Seq[Row]): String = rs.map(row).mkString("[", ",", "]")

  /** Minimal recursive-descent parser for the request vocabulary. */
  def parse(s: String): Map[String, Any] = {
    val p = new P(s)
    val v = p.value()
    v.asInstanceOf[Map[String, Any]]
  }

  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = { ws(); require(s.charAt(i) == c, s"expected $c at $i"); i += 1 }
    def value(): Any = {
      ws()
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => string()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _ => number()
      }
    }
    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      if (s.charAt(i) == '}') { i += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var more = true
      while (more) {
        ws()
        val k = string()
        expect(':')
        b += k -> value()
        ws()
        if (s.charAt(i) == ',') i += 1 else { expect('}'); more = false }
      }
      b.result()
    }
    private def arr(): Seq[Any] = {
      expect('['); ws()
      if (s.charAt(i) == ']') { i += 1; return Nil }
      val b = Seq.newBuilder[Any]
      var more = true
      while (more) {
        b += value()
        ws()
        if (s.charAt(i) == ',') i += 1 else { expect(']'); more = false }
      }
      b.result()
    }
    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          i += 1
          s.charAt(i) match {
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c => sb += c
          }
        } else sb += s.charAt(i)
        i += 1
      }
      i += 1
      sb.toString
    }
    private def number(): Double = {
      val start = i
      while (i < s.length && (s.charAt(i).isDigit || "+-.eE".contains(s.charAt(i)))) i += 1
      s.substring(start, i).toDouble
    }
  }
}
