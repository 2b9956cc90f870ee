package graft

import graft.serve.Wire

class WireSpec extends SparkSpec {

  test("header framing roundtrips and is network byte order") {
    val body = "hello".getBytes("UTF-8")
    val framed = Wire.pack(Wire.Streams, body)
    assert(framed.length === Wire.HeaderLen + body.length)
    assert(framed(0) === 1.toByte) // version
    assert(framed(1) === 0.toByte && framed(2) === Wire.Streams.toByte) // u16 BE
    // u32 big-endian length
    assert(framed(3) === 0 && framed(4) === 0 && framed(5) === 0 && framed(6) === 5)
    val m = Wire.unpack(framed)
    assert(m.version === 1 && m.msgType === Wire.Streams)
    assert(new String(m.body, "UTF-8") === "hello")
  }

  test("history bodies compress like the reference and roundtrip") {
    val json = """[{"nntsclabel":"a","timestamp":100,"value":1.5}]""" * 200
    val framed = Wire.packHistory(json)
    // zlib actually compresses the repetitive payload
    assert(framed.length < json.length / 4)
    assert(Wire.unpackHistory(framed) === json)
    // RFC 1950 magic (0x78) — Python zlib.decompress accepts this stream
    val m = Wire.unpack(framed)
    assert((m.body(0) & 0xff) === 0x78)
  }

  test("push marker frame carries (colid, timestamp)") {
    val m = Wire.unpack(Wire.packPush(7, 123456L))
    assert(m.msgType === Wire.Push)
    assert(new String(m.body, "UTF-8") === """{"colid":7,"timestamp":123456}""")
  }

  test("truncated frames are rejected, not misread") {
    val framed = Wire.pack(Wire.History, "abc".getBytes)
    intercept[IllegalArgumentException](Wire.unpack(framed.take(Wire.HeaderLen - 1)))
    intercept[IllegalArgumentException](Wire.unpack(framed.take(framed.length - 1)))
  }

  test("fuzz: arbitrary byte soup never hangs or misallocates, only typed errors") {
    // deterministic LCG — no Random (reproducible failures matter more
    // than variety), 200 frames of adversarial garbage incl. giant
    // declared lengths and valid-looking headers over short bodies
    var seed = 0x9E3779B97F4A7C15L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    (0 until 200).foreach { i =>
      val len = (math.abs(next()) % 64).toInt + 1
      val b = new Array[Byte](len)
      (0 until len).foreach(j => b(j) = (next() >> 32).toByte)
      try { Wire.unpack(b); () }
      catch { case _: IllegalArgumentException => () } // the ONLY legal failure
    }
    // a header declaring a 2 GiB body must be rejected before allocation
    val huge = java.nio.ByteBuffer.allocate(Wire.HeaderLen)
    huge.put(1.toByte).putShort(Wire.History.toShort).putInt(Int.MaxValue)
    intercept[IllegalArgumentException](Wire.unpack(huge.array()))
  }
}
