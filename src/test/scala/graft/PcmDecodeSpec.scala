package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.functions.PcmDecode

class PcmDecodeSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-build a WAV: RIFF + optional pre-chunks + fmt + data. */
  private def wav(
      channels: Int, bits: Int, data: Array[Byte],
      fmtTag: Int = 1,
      preChunks: Seq[(String, Array[Byte])] = Nil): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      b.array()
    }
    val fmt = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(fmtTag.toShort).putShort(channels.toShort)
      .putInt(8000).putInt(8000 * channels * bits / 8)
      .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
      .array()
    val body = preChunks.map { case (id, b) => chunk(id, b) }
      .foldLeft(Array.emptyByteArray)(_ ++ _) ++
      chunk("fmt ", fmt) ++ chunk("data", data)
    val riff = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(body.length + 4).array()
    riff ++ "WAVE".getBytes("US-ASCII") ++ body
  }

  private def decode(bytes: Array[Byte]) = {
    val r = Seq(Tuple1(bytes)).toDF("b")
      .select(PcmDecode(col("b")).as("d")).head()
    if (r.isNullAt(0)) None else Some(r.getStruct(0))
  }

  test("16-bit mono: signed LE samples, sums and peaks exact") {
    // samples: 1, -2, 32767, -32768
    val data = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(1).putShort(-2).putShort(32767).putShort(-32768).array()
    val d = decode(wav(1, 16, data)).get
    assert((d.getInt(0), d.getInt(1), d.getLong(2)) === ((1, 16, 4L)))
    assert(d.getLong(3) === 1L - 2L + 32767L - 32768L)
    assert(d.getInt(4) === 32768)
    assert(d.isNullAt(5) && d.isNullAt(6)) // mono: no channel 1
  }

  test("8-bit stereo: 128-midpoint unsigned; trailing partial frame ignored") {
    // frames (c0, c1): (0, 255), (128, 1) -> samples (-128, 127), (0, -127)
    // plus ONE trailing byte (partial frame) that must be ignored
    val data = Array[Byte](0, 0xff.toByte, 0x80.toByte, 1, 42)
    val d = decode(wav(2, 8, data)).get
    assert((d.getInt(0), d.getInt(1), d.getLong(2)) === ((2, 8, 2L)))
    assert((d.getLong(3), d.getInt(4)) === ((-128L + 0L, 128)))
    assert((d.getLong(5), d.getInt(6)) === ((127L - 127L, 127)))
  }

  test("24-bit stereo: signed LE triples, hi-res sums and peaks exact (r18 #3)") {
    // frames (c0, c1): (1, -2), (8388607, -8388608), plus 2 trailing
    // bytes (partial frame) that must be ignored
    def tri(v: Int): Array[Byte] =
      Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)
    val data = tri(1) ++ tri(-2) ++ tri(8388607) ++ tri(-8388608) ++ Array[Byte](9, 9)
    val d = decode(wav(2, 24, data)).get
    assert((d.getInt(0), d.getInt(1), d.getLong(2)) === ((2, 24, 2L)))
    assert((d.getLong(3), d.getInt(4)) === ((1L + 8388607L, 8388607)))
    assert((d.getLong(5), d.getInt(6)) === ((-2L - 8388608L, 8388608)))
    // mono too: channel layout at the 3-byte block align
    val m = decode(wav(1, 24, tri(-1) ++ tri(5))).get
    assert((m.getInt(0), m.getInt(1), m.getLong(2)) === ((1, 24, 2L)))
    assert((m.getLong(3), m.getInt(4)) === ((4L, 5)))
    assert(m.isNullAt(5) && m.isNullAt(6))
  }

  test("chunk walk: unknown pre-chunks (odd-sized, padded) are skipped") {
    val data = Array[Byte](10, 0)
    val full = wav(1, 16, data,
      preChunks = Seq("LIST" -> Array[Byte](1, 2, 3))) // odd size -> padded
    val d = decode(full).get
    assert(d.getLong(2) === 1L && d.getLong(3) === 10L)
  }

  test("non-PCM, malformed, and truncated payloads decode to null") {
    val data = Array[Byte](1, 0)
    assert(decode(wav(1, 16, data, fmtTag = 85)).isEmpty) // MP3 tag: stub land
    assert(decode(wav(3, 16, data)).isEmpty) // >2 channels out of scope
    assert(decode(wav(1, 20, data)).isEmpty) // odd depth out of scope
    assert(decode("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty) // no chunks
    assert(decode("just text".getBytes("UTF-8")).isEmpty)
    // a chunk whose declared size overruns the payload
    val good = wav(1, 16, data)
    assert(decode(good.dropRight(1)).isEmpty)
    val n = Seq(Tuple1(null: Array[Byte])).toDF("b")
      .select(PcmDecode(col("b"))).head()
    assert(n.isNullAt(0))
  }

  test("map-only codegen'd plan; SQL registration") {
    val plan = graft.pipeline.Multimodal
      .mediaTableEncodedAudio(graft.core.Tables.documents(spark, sf("sf0.001")))
      .select(PcmDecode(col("payload")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("Exchange"), plan)
    graft.functions.GraftExtensions.register(spark)
    val bytes = wav(1, 16,
      ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(7).array())
    val got = Seq(Tuple1(bytes)).toDF("b").createOrReplaceTempView("__pcm")
    assert(spark.sql("SELECT pcm_decode(b).sum_c0 FROM __pcm").head().getLong(0) === 7L)
  }
}
