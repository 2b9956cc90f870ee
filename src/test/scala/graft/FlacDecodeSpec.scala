package graft

import org.apache.spark.sql.functions._

import graft.functions.FlacDecode
import graft.pipeline.Multimodal

/** From-scratch FLAC decode: CRC routines pinned on the standard check
  * vectors, the frame machinery pinned on HAND-BUILT byte-exact
  * fixtures worked from the format spec (constant subframe, fixed-order
  * Rice residuals, wasted bits), the full surface covered by
  * encode→decode round trips across every subframe strategy / stereo
  * mode / Rice method the generator cycles through, and the strict
  * malformation nulls.
  */
class FlacDecodeSpec extends SparkSpec {
  import spark.implicits._

  /** Tiny MSB-first bit builder for hand-made fixtures. */
  private final class B {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var acc = 0L
    private var nb = 0
    def put(v: Long, n: Int): B = {
      var k = n
      while (k > 0) {
        val take = math.min(k, 56 - nb)
        acc = (acc << take) | ((v >>> (k - take)) & ((1L << take) - 1))
        nb += take; k -= take
        while (nb >= 8) { out += ((acc >>> (nb - 8)) & 0xff).toByte; nb -= 8 }
      }
      this
    }
    def align(): B = { if (nb > 0) put(0, 8 - nb); this }
    def bytes: Array[Byte] = out.toArray
  }

  test("CRC-8 (0x07) and CRC-16 (0x8005) match the standard '123456789' vectors") {
    val v = "123456789".getBytes("US-ASCII")
    assert(FlacDecode.crc8(v, 0, v.length) === 0xf4)
    assert(FlacDecode.crc16(v, 0, v.length) === 0xfee8)
  }

  /** fLaC + last-flagged STREAMINFO for mono/8-bit (or params), rate
    * 8000, given total samples.
    */
  private def streamInfo(ch: Int, bits: Int, total: Long): Array[Byte] = {
    val b = new B
    b.put(1, 1).put(0, 7).put(34, 24)
    b.put(192, 16).put(192, 16).put(0, 24).put(0, 24)
    b.put(8000, 20).put(ch - 1, 3).put(bits - 1, 5).put(total, 36)
    (0 until 16).foreach(_ => b.put(0, 8))
    "fLaC".getBytes("US-ASCII") ++ b.bytes
  }

  private def withCrcs(header: B, body: B => Unit): Array[Byte] = {
    val hb = header.bytes
    val withC8 = new B
    hb.foreach(x => withC8.put(x & 0xffL, 8))
    withC8.put(FlacDecode.crc8(hb, 0, hb.length), 8)
    body(withC8)
    withC8.align()
    val fb = withC8.bytes
    fb ++ Array[Byte](
      ((FlacDecode.crc16(fb, 0, fb.length) >> 8) & 0xff).toByte,
      (FlacDecode.crc16(fb, 0, fb.length) & 0xff).toByte)
  }

  test("hand-built fixture: mono 8-bit CONSTANT subframe, blocksize 4") {
    // frame header: sync+fixed, bs code 0110 (8-bit at end), rate from
    // STREAMINFO, 1 channel, 8-bit (code 001), frame number 0, bs-1 = 3
    val hdr = new B()
      .put(0xff, 8).put(0xf8, 8)
      .put(6, 4).put(0, 4).put(0, 4).put(1, 3).put(0, 1)
      .put(0, 8).put(3, 8)
    val frame = withCrcs(hdr, b => {
      b.put(0, 1).put(0, 6).put(0, 1) // CONSTANT, no wasted bits
      b.put(42, 8)
    })
    val r = FlacDecode.decode(streamInfo(1, 8, 4) ++ frame)
    assert(r != null, "hand-built constant frame must decode")
    assert(r.getInt(0) === 1 && r.getInt(1) === 8)
    assert(r.getLong(2) === 4L)
    assert(r.getLong(3) === 168L && r.getInt(4) === 42)
    assert(r.isNullAt(5) && r.isNullAt(6))
  }

  test("hand-built fixture: FIXED order 1 with hand-coded Rice residuals") {
    // samples [10, 12, 11, 13] → warmup 10, residuals [2, -1, 2],
    // zigzag [4, 1, 4], Rice p=1: q=[2,0,2] → 001|0, 1|1, 001|0
    val hdr = new B()
      .put(0xff, 8).put(0xf8, 8)
      .put(6, 4).put(0, 4).put(0, 4).put(1, 3).put(0, 1)
      .put(0, 8).put(3, 8)
    val frame = withCrcs(hdr, b => {
      b.put(0, 1).put(0x09, 6).put(0, 1) // FIXED order 1
      b.put(10, 8)                        // warmup
      b.put(0, 2).put(0, 4).put(1, 4)     // method 0, part order 0, p=1
      b.put(Integer.parseInt("0010", 2), 4)
      b.put(Integer.parseInt("11", 2), 2)
      b.put(Integer.parseInt("0010", 2), 4)
    })
    val r = FlacDecode.decode(streamInfo(1, 8, 4) ++ frame)
    assert(r != null, "hand-built fixed-order-1 frame must decode")
    assert(r.getLong(2) === 4L)
    assert(r.getLong(3) === (10 + 12 + 11 + 13).toLong)
    assert(r.getInt(4) === 13)
  }

  test("hand-built fixture: WASTED BITS restore the shifted samples") {
    // verbatim with 1 wasted bit: samples [4, 6, 8, 2] stored >>1 in 7
    // effective bits; the decoder must shift them back
    val hdr = new B()
      .put(0xff, 8).put(0xf8, 8)
      .put(6, 4).put(0, 4).put(0, 4).put(1, 3).put(0, 1)
      .put(0, 8).put(3, 8)
    val frame = withCrcs(hdr, b => {
      b.put(0, 1).put(1, 6).put(1, 1) // VERBATIM, wasted flag
      b.put(1, 1)                      // unary 0 → k = 1 wasted bit
      Seq(2, 3, 4, 1).foreach(v => b.put(v, 7))
    })
    val r = FlacDecode.decode(streamInfo(1, 8, 4) ++ frame)
    assert(r != null, "wasted-bits frame must decode")
    assert(r.getLong(3) === (4 + 6 + 8 + 2).toLong)
    assert(r.getInt(4) === 8)
  }

  test("left/side reconstruction past the declared bit depth nulls (review r18)") {
    // stereo 8-bit, chAsgn 8 (left/side): left CONSTANT 127 (8 bits,
    // in range), side CONSTANT -128 (9 bits, in range for bps+1) —
    // but right = left - side = 255, outside 8-bit [-128, 127]. The
    // per-subframe checks both pass; only the post-decorrelation
    // re-check can catch the fabricated channel.
    def lsFrame(left: Int, side: Int): Array[Byte] = {
      val hdr = new B()
        .put(0xff, 8).put(0xf8, 8)
        .put(6, 4).put(0, 4).put(8, 4).put(1, 3).put(0, 1)
        .put(0, 8).put(3, 8)
      withCrcs(hdr, b => {
        b.put(0, 1).put(0, 6).put(0, 1) // subframe 0: CONSTANT, 8 bits
        b.put(left & 0xff, 8)
        b.put(0, 1).put(0, 6).put(0, 1) // subframe 1: CONSTANT, 9 bits (side)
        b.put(side & 0x1ff, 9)
      })
    }
    // control: in-range left/side decodes (left 10, side 3 → right 7)
    val ok = FlacDecode.decode(streamInfo(2, 8, 4) ++ lsFrame(10, 3))
    assert(ok != null, "control left/side frame must decode")
    assert(ok.getLong(3) === 40L && ok.getLong(5) === 28L)
    // hostile: right lands at 255 → strict null, never fabricated sums
    assert(FlacDecode.decode(streamInfo(2, 8, 4) ++ lsFrame(127, -128)) === null)
  }

  test("empty first residual partition (perPart == order, partOrder > 0) nulls (review r18)") {
    // FIXED order 1, blockSize 4, partition order 2 → perPart 1 ==
    // order: the spec requires blockSize >> partOrder to EXCEED the
    // predictor order at ANY partition order, not just parts == 1
    val hdr = new B()
      .put(0xff, 8).put(0xf8, 8)
      .put(6, 4).put(0, 4).put(0, 4).put(1, 3).put(0, 1)
      .put(0, 8).put(3, 8)
    val frame = withCrcs(hdr, b => {
      b.put(0, 1).put(0x09, 6).put(0, 1) // FIXED order 1
      b.put(10, 8)                        // warmup
      b.put(0, 2).put(2, 4)               // method 0, partition order 2
      b.put(1, 4)                         // partition 0: param only (0 residuals)
      var p = 1
      while (p < 4) { b.put(1, 4).put(2, 2); p += 1 } // param 1, residual 0 ("10")
    })
    assert(FlacDecode.decode(streamInfo(1, 8, 4) ++ frame) === null)
  }

  private def sums(s: Array[Int]): (Long, Int) =
    (s.map(_.toLong).sum, s.map(math.abs).foldLeft(0)(math.max))

  test("encode→decode round trip: every strategy/stereo/Rice combination, exact samples") {
    val rnd = new scala.util.Random(7)
    // media ids cover: escape (5), rice-5 (2, 9, 16), all strategy and
    // stereo phases; lengths cover multi-frame, exact-multiple, partial
    // tail and tiny blocks
    for {
      mediaId <- 0L to 16L
      (ch, bits) <- Seq((1, 8), (2, 8), (1, 16), (2, 16), (1, 24), (2, 24))
      n <- Seq(5, 192, 200, 500)
    } {
      val lim = if (bits == 8) 127 else if (bits == 16) 32767 else 8388607
      val samples = Array.fill(ch, n)(rnd.nextInt(2 * lim + 1) - lim)
      val payload = Multimodal.encodeFlac(samples, bits, mediaId)
      val r = FlacDecode.decode(payload)
      assert(r != null, s"id=$mediaId ch=$ch bits=$bits n=$n must decode")
      assert(r.getInt(0) === ch && r.getInt(1) === bits)
      assert(r.getLong(2) === n.toLong, s"id=$mediaId n")
      val (s0, p0) = sums(samples(0))
      assert(r.getLong(3) === s0, s"id=$mediaId ch=$ch bits=$bits n=$n sum_c0")
      assert(r.getInt(4) === p0, s"id=$mediaId peak_c0")
      if (ch == 2) {
        val (s1, p1) = sums(samples(1))
        assert(r.getLong(5) === s1, s"id=$mediaId sum_c1")
        assert(r.getInt(6) === p1, s"id=$mediaId peak_c1")
      } else assert(r.isNullAt(5) && r.isNullAt(6))
    }
  }

  test("constant runs take the CONSTANT subframe path and round-trip") {
    val samples = Array(Array.fill(300)(-7))
    val r = FlacDecode.decode(Multimodal.encodeFlac(samples, 8, 0L))
    assert(r != null)
    assert(r.getLong(3) === -2100L && r.getInt(4) === 7)
  }

  test("malformed streams null strictly, never throw") {
    val good = Multimodal.encodeFlac(Array(Array.tabulate(300)(i => i % 100 - 50)), 8, 3L)
    assert(FlacDecode.decode(good) != null)
    // wrong magic
    assert(FlacDecode.decode("fLaX".getBytes ++ good.drop(4)) == null)
    // truncations at every length must null (or stay exact), never throw
    for (cut <- Seq(3, 10, 40, good.length / 2, good.length - 1))
      assert(FlacDecode.decode(java.util.Arrays.copyOf(good, cut)) == null,
        s"truncation at $cut")
    // corrupt the frame CRC-16 (last byte)
    val badCrc = good.clone()
    badCrc(badCrc.length - 1) = (badCrc(badCrc.length - 1) ^ 0x1).toByte
    assert(FlacDecode.decode(badCrc) == null)
    // corrupt a header byte → CRC-8 mismatch
    val badHdr = good.clone()
    badHdr(4 + 4 + 34 + 2) = (badHdr(4 + 4 + 34 + 2) ^ 0x10).toByte
    assert(FlacDecode.decode(badHdr) == null)
    // declared total samples ≠ decoded total
    val badTotal = good.clone()
    badTotal(4 + 4 + 17) = (badTotal(4 + 4 + 17) ^ 0x3).toByte
    assert(FlacDecode.decode(badTotal) == null)
    // trailing garbage after the last frame
    assert(FlacDecode.decode(good ++ Array[Byte](1, 2, 3)) == null)
    // out-of-scope bit depths null: a 12-bit STREAMINFO
    assert(FlacDecode.decode(
      streamInfo(1, 12, 0) ++ good.drop(4 + 4 + 34)) == null)
    assert(FlacDecode.decode(Array[Byte]()) == null)
    assert(FlacDecode.decode("fLaC".getBytes("US-ASCII")) == null)
  }

  test("fuzz: random mutations of a valid stream never throw") {
    val good = Multimodal.encodeFlac(
      Array(Array.tabulate(400)(i => (i * 37) % 200 - 100),
        Array.tabulate(400)(i => (i * 53) % 180 - 90)), 16, 5L)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val m = good.clone()
      val k = 1 + rnd.nextInt(3)
      for (_ <- 0 until k)
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      FlacDecode.decode(m) // null or a decode — just never throw
    }
  }

  test("the expression path (codegen) matches eval, nulls included") {
    val p1 = Multimodal.encodeFlac(Array(Array.tabulate(250)(i => i - 125)), 8, 1L)
    val rows = Seq(
      (1L, p1),
      (2L, "not flac".getBytes("UTF-8")))
    val out = rows.toDF("media_id", "payload")
      .select(col("media_id"), FlacDecode(col("payload")).as("d"))
      .select(col("media_id"), col("d.n_frames"), col("d.sum_c0"))
      .orderBy("media_id").collect()
    assert(out(0).getLong(1) === 250L)
    val direct = FlacDecode.decode(p1)
    assert(out(0).getLong(2) === direct.getLong(3))
    assert(out(1).isNullAt(1))
  }
}
