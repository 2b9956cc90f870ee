package graft

import org.apache.spark.sql.functions._

import graft.functions.{AiffDecode, AudioDecode, AudioFingerprint, PcmDecode}
import graft.pipeline.Multimodal

/** Big-endian AIFF sample decode: the container walk pinned on
  * hand-built chunks, the 80-bit extended sample-rate parser pinned on
  * exact encodings (valid rates, NaN/∞, fractional, out-of-range), the
  * SIGNED-8-bit divergence from WAV pinned byte-for-byte, an
  * INDEPENDENT referee (`javax.sound.sampled` writes real AIFF files),
  * cross-codec fingerprint invariance, and the strict malformation
  * nulls.
  */
class AiffDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Int): Array[Byte] = be16((v >> 16) & 0xffff) ++ be16(v & 0xffff)

  /** 80-bit extended encoding of integer `v` (v ≥ 1): normalize the
    * mantissa so the explicit integer bit (bit 63) is set.
    */
  private def extended(v: Long): Array[Byte] = {
    val nlz = java.lang.Long.numberOfLeadingZeros(v)
    val mant = v << nlz
    val exp = 16383 + (63 - nlz)
    be16(exp) ++ be32((mant >>> 32).toInt) ++ be32(mant.toInt)
  }

  private def aiff(
      formType: String, comm: Array[Byte], ssnd: Array[Byte],
      pre: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val body = formType.getBytes("US-ASCII") ++ pre ++ comm ++ ssnd
    "FORM".getBytes("US-ASCII") ++ be32(body.length) ++ body
  }

  private def commChunk(ch: Int, frames: Int, bits: Int, rate: Array[Byte]): Array[Byte] =
    "COMM".getBytes("US-ASCII") ++ be32(18) ++ be16(ch) ++ be32(frames) ++ be16(bits) ++ rate

  private def ssndChunk(data: Array[Byte], offset: Int = 0): Array[Byte] = {
    val sz = 8 + offset + data.length
    val raw = "SSND".getBytes("US-ASCII") ++ be32(sz) ++ be32(offset) ++ be32(0) ++
      new Array[Byte](offset) ++ data
    if ((sz & 1) == 1) raw ++ Array[Byte](0) else raw
  }

  test("extended-float sample-rate parser: exact accepts and rejects") {
    def rate(b: Array[Byte]): Long = AiffDecode.extendedRate(b, 0)
    assert(rate(extended(8000L)) === 8000L)
    assert(rate(extended(44100L)) === 44100L)
    assert(rate(extended(1L)) === 1L)
    assert(rate(extended(Int.MaxValue.toLong)) === Int.MaxValue.toLong)
    // 2^31 is one past the cap
    assert(rate(extended(Int.MaxValue.toLong + 1)) === -1L)
    // negative (sign bit), NaN/∞ (exponent 0x7fff), zero
    assert(rate(Array[Byte](0x80.toByte, 0x0c) ++ extended(8000L).drop(2)) === -1L)
    assert(rate(be16(0x7fff) ++ be32(0) ++ be32(0)) === -1L)
    assert(rate(be16(0) ++ be32(0) ++ be32(0)) === -1L)
    // fractional: 8000.5 = 16001 × 2^-1 — mantissa normalized, exponent 16383+12
    val frac = {
      val v = 16001L
      val nlz = java.lang.Long.numberOfLeadingZeros(v)
      be16(16383 + (63 - nlz) - 1) ++
        be32(((v << nlz) >>> 32).toInt) ++ be32((v << nlz).toInt)
    }
    assert(rate(frac) === -1L)
  }

  test("hand-built canonical decode: 16-bit stereo BE, declared frames, sums/peaks") {
    // frames (L,R): (1000,-2), (-32768,7), (300,300)
    val data = be16(1000) ++ be16(0xfffe) ++ be16(0x8000) ++ be16(7) ++ be16(300) ++ be16(300)
    val p = aiff("AIFF", commChunk(2, 3, 16, extended(8000L)), ssndChunk(data))
    val r = AiffDecode.decode(p)
    assert(r != null)
    assert(r.getInt(0) === 2 && r.getInt(1) === 16 && r.getLong(2) === 3L)
    assert(r.getLong(3) === 1000L - 32768L + 300L)
    assert(r.getInt(4) === 32768)
    assert(r.getLong(5) === -2L + 7L + 300L)
    assert(r.getInt(6) === 300)
  }

  test("8-bit samples are SIGNED — the byte stream that means +16 in WAV means -112 here") {
    val raw = Array[Byte](0x90.toByte) // 0x90: WAV = 144-128 = 16; AIFF = -112
    val aiffP = aiff("AIFF", commChunk(1, 1, 8, extended(8000L)), ssndChunk(raw))
    val ra = AiffDecode.decode(aiffP)
    assert(ra.getLong(3) === -112L && ra.getInt(4) === 112)
    val wavP = {
      val bos = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
      bos.write("RIFF".getBytes("US-ASCII")); le32(37)
      bos.write("WAVEfmt ".getBytes("US-ASCII")); le32(16)
      le16(1); le16(1); le32(8000); le32(8000); le16(1); le16(8)
      bos.write("data".getBytes("US-ASCII")); le32(1); bos.write(0x90)
      bos.toByteArray
    }
    assert(PcmDecode.decode(wavP).getLong(3) === 16L)
  }

  test("24-bit BE triples and an SSND offset decode exactly") {
    // -1 (0xffffff), 2^23-1, -2^23
    val data = Array[Byte](-1, -1, -1, 0x7f, -1, -1, 0x80.toByte, 0, 0)
    val p = aiff("AIFF", commChunk(1, 3, 24, extended(44100L)), ssndChunk(data, offset = 5))
    val r = AiffDecode.decode(p)
    assert(r != null)
    assert(r.getLong(3) === -1L + 0x7fffffL - 0x800000L)
    assert(r.getInt(4) === 0x800000)
  }

  test("chunk walk: odd-size junk chunk (padded) before COMM/SSND; extra data ignored") {
    val junk = "NAME".getBytes("US-ASCII") ++ be32(3) ++ "abc".getBytes("US-ASCII") ++
      Array[Byte](0) // pad to even
    val data = Array[Byte](5, 10, 20, 40) // 4 frames declared 3: extra tail ignored
    val p = aiff("AIFF", commChunk(1, 3, 8, extended(8000L)), ssndChunk(data), pre = junk)
    val r = AiffDecode.decode(p)
    assert(r != null && r.getLong(2) === 3L && r.getLong(3) === 35L)
  }

  test("strict nulls: AIFC, frame declaration SSND can't cover, blockSize, overruns, params") {
    val rate = extended(8000L)
    val data = Array[Byte](1, 2, 3, 4)
    assert(AiffDecode.decode(aiff("AIFC", commChunk(1, 4, 8, rate), ssndChunk(data))) == null)
    // declared 5 frames, 4 available
    assert(AiffDecode.decode(aiff("AIFF", commChunk(1, 5, 8, rate), ssndChunk(data))) == null)
    // blockSize != 0
    val badBlock = {
      val raw = "SSND".getBytes("US-ASCII") ++ be32(8 + 4) ++ be32(0) ++ be32(4) ++ data
      aiff("AIFF", commChunk(1, 4, 8, rate), raw)
    }
    assert(AiffDecode.decode(badBlock) == null)
    // SSND offset past the chunk
    val badOff = "SSND".getBytes("US-ASCII") ++ be32(8 + 4) ++ be32(5) ++ be32(0) ++ data
    assert(AiffDecode.decode(aiff("AIFF", commChunk(1, 0, 8, rate), badOff)) == null)
    // chunk size overruns the payload
    val overrun = "SSND".getBytes("US-ASCII") ++ be32(1000) ++ be32(0) ++ be32(0) ++ data
    assert(AiffDecode.decode(aiff("AIFF", commChunk(1, 4, 8, rate), overrun)) == null)
    // missing SSND / missing COMM / short COMM
    assert(AiffDecode.decode(aiff("AIFF", commChunk(1, 4, 8, rate), Array.emptyByteArray)) == null)
    assert(AiffDecode.decode(aiff("AIFF", Array.emptyByteArray, ssndChunk(data))) == null)
    assert(AiffDecode.decode(aiff("AIFF",
      "COMM".getBytes("US-ASCII") ++ be32(16) ++ be16(1) ++ be32(4) ++ be16(8) ++ rate.take(8),
      ssndChunk(data))) == null)
    // bad channels / bits / rate
    assert(AiffDecode.decode(aiff("AIFF", commChunk(3, 4, 8, rate), ssndChunk(data))) == null)
    assert(AiffDecode.decode(aiff("AIFF", commChunk(1, 4, 12, rate), ssndChunk(data))) == null)
    assert(AiffDecode.decode(aiff("AIFF",
      commChunk(1, 4, 8, be16(0x7fff) ++ be32(0) ++ be32(0)), ssndChunk(data))) == null)
    // wrong magics
    assert(AiffDecode.decode("FORMxxxxWAVE".getBytes("US-ASCII")) == null)
    assert(AiffDecode.decode(Array[Byte](1, 2, 3)) == null)
  }

  test("referee: javax.sound.sampled writes real AIFF files this kernel decodes exactly") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    for ((bits, ch) <- Seq((8, 1), (16, 2), (24, 1))) {
      val n = 97
      val samples = Array.tabulate(ch, n) { (c, f) =>
        val span = (1 << (bits - 1)) - 1
        ((f * 2654435761L + c * 40503L) % (2L * span + 1) - span).toInt
      }
      val bytesPer = bits / 8
      val raw = new Array[Byte](n * ch * bytesPer)
      var i = 0
      for (f <- 0 until n; c <- 0 until ch) {
        val v = samples(c)(f)
        var k = bytesPer - 1
        while (k >= 0) { raw(i) = ((v >> (8 * k)) & 0xff).toByte; i += 1; k -= 1 }
      }
      val fmt = new AudioFormat(
        AudioFormat.Encoding.PCM_SIGNED, 8000f, bits, ch, ch * bytesPer, 8000f, true)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.AIFF, bos)
      val r = AiffDecode.decode(bos.toByteArray)
      assert(r != null, s"referee AIFF bits=$bits ch=$ch decoded null")
      assert(r.getInt(0) === ch && r.getInt(1) === bits && r.getLong(2) === n.toLong)
      assert(r.getLong(3) === samples(0).map(_.toLong).sum)
      assert(r.getInt(4) === samples(0).map(v => math.abs(v)).max)
      if (ch == 2) {
        assert(r.getLong(5) === samples(1).map(_.toLong).sum)
        assert(r.getInt(6) === samples(1).map(v => math.abs(v)).max)
      }
    }
  }

  test("own-encoder round trip across depths/channels; corrupt declaration nulls") {
    for (bits <- Seq(8, 16, 24); ch <- Seq(1, 2)) {
      val n = 61
      val span = (1 << (bits - 1)) - 1
      val samples = Array.tabulate(ch, n)((c, f) => (f * 37 + c * 11) % (2 * span + 1) - span)
      val p = Multimodal.encodeAiff(samples, bits, declareExtraFrame = false)
      val r = AiffDecode.decode(p)
      assert(r != null, s"bits=$bits ch=$ch")
      assert(r.getInt(0) === ch && r.getInt(1) === bits && r.getLong(2) === n.toLong)
      assert(r.getLong(3) === samples(0).map(_.toLong).sum)
      assert(AiffDecode.decode(
        Multimodal.encodeAiff(samples, bits, declareExtraFrame = true)) == null)
    }
  }

  test("sniff dispatch + fingerprint cross-codec invariance: AIFF == WAV == FLAC") {
    val n = 200
    val samples = Array(Array.tabulate(n)(f => (f * 13) % 201 - 100))
    val aiffP = Multimodal.encodeAiff(samples, 16, declareExtraFrame = false)
    val s = AudioDecode.decode(aiffP)
    assert(s != null && s.getUTF8String(0).toString === "aiff")
    assert(s.getLong(3) === n.toLong) // n_frames in the wrapped schema
    assert(s.getLong(4) === samples(0).map(_.toLong).sum)
    val flacP = Multimodal.encodeFlac(samples, 16, 7L)
    val fpA = AudioFingerprint.fingerprint(aiffP, 65)
    val fpF = AudioFingerprint.fingerprint(flacP, 65)
    assert(fpA != null && fpF != null)
    assert(fpA.getUTF8String(0).toString === "aiff")
    assert(fpA.getLong(2) === fpF.getLong(2),
      "lossless codecs must fingerprint identically")
  }

  test("the expression path (codegen) matches eval, nulls included") {
    val samples = Array(Array.tabulate(40)(f => f * 5 - 100))
    val rows = Seq(
      (1L, Multimodal.encodeAiff(samples, 16, declareExtraFrame = false)),
      (2L, "raw text, no audio".getBytes("UTF-8")),
      (3L, Multimodal.encodeAiff(samples, 16, declareExtraFrame = true)))
    val out = rows.toDF("media_id", "payload")
      .select(col("media_id"), AiffDecode(col("payload")).as("d"))
      .select(col("media_id"), col("d.channels"), col("d.n_frames"), col("d.sum_c0"))
      .orderBy("media_id").collect()
    assert(out(0).getInt(1) === 1 && out(0).getLong(2) === 40L)
    assert(out(0).getLong(3) === samples(0).map(_.toLong).sum)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }
}
