package graft.serve

import java.nio.ByteBuffer
import java.util.zip.{Deflater, Inflater}

/** F13 — the export wire envelope
  * (/root/reference/libnntsc/exporter.py:516-586): every reply is
  * `struct.pack(nntsc_hdr_fmt, 1, msgtype, len(body)) + body`, with
  * history bodies zlib-compressed (exporter.py:528) and all bodies
  * Python-pickled.
  *
  * Portable here: the framing and the compression. The header is packed
  * big-endian (network order) as (version: u8, msgtype: u16, length: u32)
  * — `nntsc_hdr_fmt` itself lives in the external libnntscclient package
  * (not part of the reference repo), so the exact field widths are an
  * assumption, documented and isolated in `HeaderLen`/pack/unpack.
  * DOCUMENTED DEVIATION: bodies are UTF-8 JSON, not pickle — pickle is a
  * Python-VM serialization with no faithful JVM twin, and any structured
  * client can consume JSON; message semantics (type ids, compression
  * rule, length framing) are preserved.
  */
object Wire {

  // message types, mirroring the exporter's reply vocabulary
  val Collections = 0
  val Schemas = 1
  val Streams = 2
  val History = 3
  val Subscribe = 4
  val Push = 5
  val QueryCancelled = 6
  val Live = 7 // NNTSC_LIVE: committed rows pushed to subscribers
  // NNTSC_VERSION_CHECK: the server's on-connect greeting announcing the
  // client-API version it speaks (exporter.py:1152-1157 sends it before
  // serving any request; the reference client validates and disconnects
  // on mismatch).
  // ROLLOUT-ORDER CONSTRAINT: the greeting is a wire-protocol breaking
  // change relative to pre-greeting builds — an old client misreads the
  // greeting as the reply to its first request, and a new client blocks
  // waiting for a greeting an old server never sends. Deploy servers
  // before clients (a new server + old client fails fast on the
  // unexpected frame type; the reverse hangs), or fleet-upgrade both.
  val VersionCheck = 8
  // NNTSC_UNSUBSCRIBE ack (exporter.py:894-906 — the reference handles
  // the request silently; the ack is a documented deviation so a client
  // can synchronize on the deregistration)
  val Unsubscribe = 9

  /** The client-API version announced in the VersionCheck greeting — the
    * JVM twin of NNTSC_CLIENTAPI_VERSION (the constant itself lives in
    * the external libnntscclient package, so the value is ours; the
    * contract — greet first, client validates — is the reference's).
    */
  val ClientApiVersion = "1.0"

  val Version = 1
  val HeaderLen = 7 // u8 + u16 + u32

  /** Upper bound on a request frame's body (exporter requests are small
    * JSON objects). The length header is attacker-controlled on an
    * unauthenticated socket — a server must validate BEFORE allocating, or
    * a single bogus frame claims a ~2 GB buffer.
    */
  val MaxFrameLen: Int = 16 * 1024 * 1024

  final case class Message(version: Int, msgType: Int, body: Array[Byte])

  def pack(msgType: Int, body: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(HeaderLen + body.length) // big-endian default
    buf.put(Version.toByte)
    buf.putShort(msgType.toShort)
    buf.putInt(body.length)
    buf.put(body)
    buf.array()
  }

  def unpack(bytes: Array[Byte]): Message = {
    require(bytes.length >= HeaderLen, "short header")
    val buf = ByteBuffer.wrap(bytes)
    val version = buf.get() & 0xff
    val msgType = buf.getShort() & 0xffff
    val len = buf.getInt()
    // the wire u32 reads as a SIGNED Int: a high-bit length is negative
    // here and `new Array[Byte](len)` would throw an untyped
    // NegativeArraySizeException (found by the fuzz spec); the cap also
    // stops one bogus frame claiming a ~2 GB buffer before validation
    require(len >= 0 && len <= MaxFrameLen, s"bad frame length $len")
    require(bytes.length >= HeaderLen + len, "short body")
    val body = new Array[Byte](len)
    buf.get(body)
    Message(version, msgType, body)
  }

  /** zlib (RFC 1950) — byte-compatible with Python's zlib.compress. */
  def compress(body: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(body); d.finish()
    val out = new java.io.ByteArrayOutputStream(math.max(64, body.length / 2))
    val chunk = new Array[Byte](8192)
    while (!d.finished()) out.write(chunk, 0, d.deflate(chunk))
    d.end()
    out.toByteArray
  }

  def decompress(body: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(body)
    val out = new java.io.ByteArrayOutputStream(math.max(64, body.length * 2))
    val chunk = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(chunk)
      require(n > 0 || inf.finished() || !inf.needsInput(), "truncated zlib body")
      out.write(chunk, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** History replies ship compressed, like the reference (exporter.py:528). */
  def packHistory(json: String): Array[Byte] =
    pack(History, compress(json.getBytes("UTF-8")))

  def unpackHistory(bytes: Array[Byte]): String = {
    val m = unpack(bytes)
    require(m.msgType == History, s"not a history message: ${m.msgType}")
    new String(decompress(m.body), "UTF-8")
  }

  /** X3 push marker frame: (collection id, timestamp) (exporter.py:1313). */
  def packPush(colId: Int, timestamp: Long): Array[Byte] =
    pack(Push, s"""{"colid":$colId,"timestamp":$timestamp}""".getBytes("UTF-8"))
}
