package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL FLAC sample decode, from scratch on the core JDK — the LOSSLESS
  * compressed-audio member of the codec family, extending the audio
  * column beyond PCM WAV ([[PcmDecode]]) the way PNG/GIF/BMP extended
  * the image column beyond P6. Because FLAC is lossless, the gate is
  * HASH-EXACT by nature — the one codec-family member that needs no
  * tolerance band. Reference: the FLAC format specification (also
  * RFC 9639): STREAMINFO, frame header syntax, subframe types,
  * Rice-coded residual partitions, inter-channel decorrelation, CRCs.
  *
  * Scope (documented, the family's strict contract): "fLaC" magic with
  * STREAMINFO first; 1-2 channels; 8/16/24 bits per sample (24 is the
  * dominant hi-res depth in real FLAC corpora); subframe types
  * CONSTANT, VERBATIM, FIXED (orders 0-4) and LPC (orders 1-32); both
  * residual methods (4-bit and 5-bit Rice parameters), partition orders
  * 0-15, escape partitions (raw n-bit residuals); wasted bits; all four
  * channel assignments (independent, left/side, right/side, mid/side —
  * the side channel carries its spec-mandated extra bit); fixed AND
  * variable blocking strategies; explicit and table block sizes. Frame
  * header CRC-8 and frame CRC-16 are VERIFIED, and reconstructed
  * samples are RANGE-CHECKED against the subframe's bit depth
  * (libFLAC-style) — a corrupted or hostile stream nulls, never
  * fabricates samples. Everything else — other bit depths,
  * >2 channels, a declared-total-samples mismatch, trailing garbage,
  * truncation — → null.
  *
  * Output matches [[PcmDecode]]'s family schema: (channels, bits,
  * n_frames, sum_c0, peak_c0, sum_c1, peak_c1) — per-channel signed
  * sample sums as exact longs, peaks as max |sample|, null c1 for mono.
  * One fused map-only codegen expression; decode reads bytes where they
  * sit plus one per-channel Int block buffer (≤ 65535 samples).
  */
case class FlacDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PcmDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "flac_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"flac_decode expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    FlacDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.FlacDecode.decode($v);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): FlacDecode =
    copy(child = c)
}

object FlacDecode {

  /** Decoded-sample cap across the whole stream (hostile-header bound,
    * like the image kernels' MaxPixels): 2^26 inter-channel frames.
    */
  private val MaxSamples = 1L << 26

  /** CRC-8, polynomial 0x07, init 0, MSB-first (the FLAC frame-header
    * CRC). Spec-pinned against the standard "123456789" → 0xF4 vector.
    */
  private[graft] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial 0x8005, init 0, MSB-first (the FLAC frame CRC).
    * Spec-pinned against the standard "123456789" → 0xFEE8 vector.
    */
  private[graft] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
        else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** MSB-first bit reader over the payload; `bad` latches on overrun. */
  private final class Bits(val b: Array[Byte]) {
    var pos = 0L // bit position
    var bad = false

    def bytePos: Int = (pos >> 3).toInt
    def aligned: Boolean = (pos & 7) == 0

    def u(n: Int): Int = { // n ≤ 24
      var r = 0
      var k = n
      while (k > 0) {
        val bp = pos >> 3
        if (bp >= b.length) { bad = true; return 0 }
        val avail = 8 - (pos & 7).toInt
        val take = math.min(avail, k)
        val v = (b(bp.toInt) >> (avail - take)) & ((1 << take) - 1)
        r = (r << take) | v
        pos += take
        k -= take
      }
      r
    }

    def uLong(n: Int): Long = { // n ≤ 40
      var r = 0L
      var k = n
      while (k > 0) {
        val take = math.min(24, k)
        r = (r << take) | (u(take).toLong & ((1L << take) - 1))
        k -= take
      }
      r
    }

    /** Signed two's-complement n-bit value (n ≤ 32). */
    def s(n: Int): Int = {
      if (n == 0) return 0
      if (n <= 24) {
        val v = u(n)
        (v << (32 - n)) >> (32 - n)
      } else {
        val v = uLong(n)
        ((v << (64 - n)) >> (64 - n)).toInt
      }
    }

    /** Unary: count of 0 bits before the terminating 1. */
    def unary(): Int = {
      var q = 0
      while (true) {
        val bp = pos >> 3
        if (bp >= b.length) { bad = true; return 0 }
        if (u(1) == 1) return q
        q += 1
        if (q > (b.length.toLong * 8)) { bad = true; return 0 } // defensive
      }
      0
    }
  }

  /** FLAC "UTF-8"-style coded number (frame/sample number, ≤ 36 bits). */
  private def codedNumber(r: Bits): Long = {
    val b0 = r.u(8)
    if (r.bad) return -1L
    if ((b0 & 0x80) == 0) return b0.toLong
    var cont = 0
    var mask = 0x40
    while ((b0 & mask) != 0 && cont < 7) { cont += 1; mask >>= 1 }
    if (cont < 1 || cont > 6) return -1L // 10xxxxxx alone is invalid
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < cont) {
      val bn = r.u(8)
      if (r.bad || (bn & 0xc0) != 0x80) return -1L
      v = (v << 6) | (bn & 0x3f)
      i += 1
    }
    v
  }

  /** Rice/escape residual partitions into out[order..blockSize). */
  private def residual(
      r: Bits, order: Int, blockSize: Int, out: Array[Int]): Boolean = {
    val method = r.u(2)
    if (r.bad || method > 1) return false
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.u(4)
    if (r.bad) return false
    val parts = 1 << partOrder
    if (blockSize % parts != 0) return false
    // blockSize >> partitionOrder must EXCEED the predictor order (FLAC
    // spec: the first partition holds perPart - order residuals and may
    // not be empty) — at ANY partition order, not just the 1-partition
    // case (review r18: partOrder > 0 with perPart == order slipped by)
    val perPart = blockSize >> partOrder
    if (perPart <= order) return false
    var p = 0
    var idx = order
    while (p < parts) {
      val count = if (p == 0) perPart - order else perPart
      if (count < 0) return false
      val param = r.u(paramBits)
      if (r.bad) return false
      if (param == escape) {
        val raw = r.u(5)
        if (r.bad) return false
        var i = 0
        while (i < count) {
          out(idx) = if (raw == 0) 0 else r.s(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary()
          if (r.bad) return false
          val low = if (param == 0) 0 else r.u(param)
          if (r.bad) return false
          val u = (q.toLong << param) | low
          if (u > Int.MaxValue) return false
          val uu = u.toInt
          out(idx) = (uu >>> 1) ^ -(uu & 1) // zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
    !r.bad
  }

  /** One subframe into out[0..blockSize); `bps` includes any side-channel
    * extra bit. False on malformed/out-of-scope.
    */
  private def subframe(r: Bits, blockSize: Int, bps: Int, out: Array[Int]): Boolean = {
    if (r.u(1) != 0) return false // padding bit
    val typ = r.u(6)
    if (r.bad) return false
    var wasted = 0
    if (r.u(1) == 1) { // wasted-bits flag: unary k-1 means k
      wasted = 1 + r.unary()
      if (r.bad || wasted >= bps) return false
    }
    val eff = bps - wasted
    val ok =
      if (typ == 0) { // CONSTANT
        val v = r.s(eff)
        if (r.bad) false
        else { java.util.Arrays.fill(out, 0, blockSize, v); true }
      } else if (typ == 1) { // VERBATIM
        var i = 0
        while (i < blockSize && !r.bad) { out(i) = r.s(eff); i += 1 }
        !r.bad
      } else if ((typ & 0x38) == 0x08 && (typ & 7) <= 4) { // FIXED 0-4
        val order = typ & 7
        if (order > blockSize) return false
        var i = 0
        while (i < order && !r.bad) { out(i) = r.s(eff); i += 1 }
        if (r.bad) return false
        if (!residual(r, order, blockSize, out)) return false
        var k = order
        order match {
          case 0 => ()
          case 1 => while (k < blockSize) { out(k) += out(k - 1); k += 1 }
          case 2 => while (k < blockSize) { out(k) += 2 * out(k - 1) - out(k - 2); k += 1 }
          case 3 => while (k < blockSize) {
            out(k) += 3 * out(k - 1) - 3 * out(k - 2) + out(k - 3); k += 1
          }
          case _ => while (k < blockSize) {
            out(k) += 4 * out(k - 1) - 6 * out(k - 2) + 4 * out(k - 3) - out(k - 4); k += 1
          }
        }
        true
      } else if ((typ & 0x20) != 0) { // LPC, order 1-32
        val order = (typ & 0x1f) + 1
        if (order > blockSize) return false
        var i = 0
        while (i < order && !r.bad) { out(i) = r.s(eff); i += 1 }
        if (r.bad) return false
        val precM1 = r.u(4)
        if (r.bad || precM1 == 15) return false
        val prec = precM1 + 1
        val shift = r.s(5)
        if (r.bad || shift < 0) return false // negative shift is forbidden
        val coef = new Array[Int](order)
        i = 0
        while (i < order && !r.bad) { coef(i) = r.s(prec); i += 1 }
        if (r.bad) return false
        if (!residual(r, order, blockSize, out)) return false
        var k = order
        while (k < blockSize) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coef(j).toLong * out(k - 1 - j); j += 1 }
          out(k) += (acc >> shift).toInt
          k += 1
        }
        true
      } else false // reserved type
    if (!ok) return false
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) = out(i) << wasted; i += 1 }
    }
    // post-reconstruction range check (libFLAC-style): a CRC-valid but
    // hostile stream (max-magnitude LPC coefficients/warmups) can drive
    // the predictor recurrence past Int range, where (acc >> shift).toInt
    // silently wraps — the strict contract is NULL, never fabricated
    // samples (review r18: abs(Int.MinValue) would also corrupt peaks)
    val lo = -(1 << (bps - 1)); val hi = (1 << (bps - 1)) - 1
    var vi = 0
    while (vi < blockSize) {
      val v = out(vi)
      if (v < lo || v > hi) return false
      vi += 1
    }
    true
  }

  def decode(bytes: Array[Byte]): InternalRow = decode(bytes, null)

  /** Decode with an optional streaming [[MixSink]] tap (fingerprint
    * consumers); `sink` null-safe — the stats fold is byte-identical
    * with or without it.
    */
  private[graft] def decode(bytes: Array[Byte], sink: MixSink): InternalRow = {
    if (bytes.length < 4 + 4 + 34) return null
    if (bytes(0) != 'f' || bytes(1) != 'L' || bytes(2) != 'a' || bytes(3) != 'C')
      return null
    // metadata walk: STREAMINFO must be first
    var off = 4
    var last = false
    var channels = 0; var bps = 0
    var totalSamples = 0L
    var first = true
    while (!last) {
      if (off + 4 > bytes.length) return null
      val hdr = bytes(off) & 0xff
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7f
      val len = ((bytes(off + 1) & 0xff) << 16) | ((bytes(off + 2) & 0xff) << 8) |
        (bytes(off + 3) & 0xff)
      if (typ == 127) return null // invalid block type
      if (first) {
        if (typ != 0 || len != 34) return null // STREAMINFO first, fixed size
        if (off + 4 + 34 > bytes.length) return null
        val si = off + 4
        // ch-1 in bits 108..110 of the block; bps-1 in 111..115;
        // total samples in 116..151 (i.e. bytes 12..17 hold rate/ch/bps/total)
        val b12 = bytes(si + 12) & 0xff
        val b13 = bytes(si + 13) & 0xff
        channels = ((b12 >> 1) & 7) + 1
        bps = (((b12 & 1) << 4) | (b13 >> 4)) + 1
        totalSamples = ((b13 & 0x0f).toLong << 32) |
          ((bytes(si + 14) & 0xffL) << 24) | ((bytes(si + 15) & 0xffL) << 16) |
          ((bytes(si + 16) & 0xffL) << 8) | (bytes(si + 17) & 0xffL)
        if (channels < 1 || channels > 2) return null // family scope
        if (bps != 8 && bps != 16 && bps != 24) return null
        if (totalSamples > MaxSamples) return null
        if (sink != null) sink.init(totalSamples)
        first = false
      }
      off += 4 + len
      if (off > bytes.length) return null
    }
    if (first) return null

    // frame walk to EOF
    var s0 = 0L; var s1 = 0L
    var p0 = 0; var p1 = 0
    var nFrames = 0L // inter-channel sample frames
    var frameIdx = 0L
    val ch0 = new Array[Int](65536)
    val ch1 = if (channels == 2) new Array[Int](65536) else null
    while (off < bytes.length) {
      val frameStart = off
      val r = new Bits(bytes)
      r.pos = off.toLong << 3
      // sync (14) + reserved(1) + blocking strategy(1)
      if (off + 2 > bytes.length) return null // lone trailing byte
      if ((bytes(off) & 0xff) != 0xff) return null
      val b1 = bytes(off + 1) & 0xff
      if ((b1 & 0xfe) != 0xf8) return null // includes the mandatory 0 bit
      val variable = (b1 & 1) == 1
      r.pos += 16
      val bsCode = r.u(4)
      val srCode = r.u(4)
      val chAsgn = r.u(4)
      val ssCode = r.u(3)
      if (r.u(1) != 0) return null // reserved
      if (r.bad || bsCode == 0 || srCode == 15) return null
      // channel assignment must agree with STREAMINFO
      if (chAsgn <= 7) { if (chAsgn + 1 != channels) return null }
      else if (chAsgn <= 10) { if (channels != 2) return null }
      else return null
      // sample size must agree (000 = from STREAMINFO)
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8
        case 4 => 16
        case 2 => 12
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => -1
      }
      if (frameBps != bps) return null
      val num = codedNumber(r)
      if (num < 0 || r.bad) return null
      // ordering check: fixed blocking carries the frame index, variable
      // the first-sample index
      if (variable) { if (num != nFrames) return null }
      else if (num != frameIdx) return null
      var blockSize = bsCode match {
        case 1 => 192
        case n if n >= 2 && n <= 5 => 576 << (n - 2)
        case 6 => -6
        case 7 => -7
        case n => 256 << (n - 8)
      }
      if (blockSize == -6) { blockSize = r.u(8) + 1 }
      else if (blockSize == -7) { blockSize = r.u(16) + 1 }
      if (r.bad) return null
      srCode match { // explicit sample-rate fields just get consumed
        case 12 => r.u(8)
        case 13 | 14 => r.u(16)
        case _ => ()
      }
      if (r.bad) return null
      // CRC-8 over the header bytes
      val crcPos = r.bytePos
      if (!r.aligned || crcPos >= bytes.length) return null
      if (crc8(bytes, frameStart, crcPos) != (bytes(crcPos) & 0xff)) return null
      r.pos += 8
      if (nFrames + blockSize > MaxSamples) return null

      // subframes (side channel gets +1 bit)
      if (channels == 1) {
        if (!subframe(r, blockSize, bps, ch0)) return null
      } else {
        val bits0 = if (chAsgn == 9) bps + 1 else bps
        val bits1 = if (chAsgn == 8 || chAsgn == 10) bps + 1 else bps
        if (!subframe(r, blockSize, bits0, ch0)) return null
        if (!subframe(r, blockSize, bits1, ch1)) return null
        // undo inter-channel decorrelation in place → (left, right)
        chAsgn match {
          case 8 => // left/side: right = left - side
            var i = 0
            while (i < blockSize) { ch1(i) = ch0(i) - ch1(i); i += 1 }
          case 9 => // right/side: ch0 IS the side, ch1 the right
            var i = 0
            while (i < blockSize) {
              val right = ch1(i)
              ch0(i) = right + ch0(i) // left = right + side
              ch1(i) = right
              i += 1
            }
          case 10 => // mid/side
            var i = 0
            while (i < blockSize) {
              val side = ch1(i)
              val mid = (ch0(i) << 1) | (side & 1)
              ch0(i) = (mid + side) >> 1
              ch1(i) = (mid - side) >> 1
              i += 1
            }
          case _ => ()
        }
      }
      // align, then frame CRC-16 over everything since the sync
      if ((r.pos & 7) != 0) r.pos += 8 - (r.pos & 7)
      val cpos = r.bytePos
      if (r.bad || cpos + 2 > bytes.length) return null
      val want = ((bytes(cpos) & 0xff) << 8) | (bytes(cpos + 1) & 0xff)
      if (crc16(bytes, frameStart, cpos) != want) return null
      off = cpos + 2

      // fold this block — re-checking the DECLARED bit-depth range
      // post-decorrelation: the subframe check ran per-subframe at the
      // side channel's bps+1, so a CRC-valid hostile left/side,
      // right/side, or mid/side frame can carry in-range side values
      // whose reconstructed left/right exceed bps (review r18) — the
      // strict contract is null, never fabricated sums/peaks
      val chLo = -(1 << (bps - 1)); val chHi = (1 << (bps - 1)) - 1
      var i = 0
      while (i < blockSize) {
        val v0 = ch0(i)
        if (v0 < chLo || v0 > chHi) return null
        s0 += v0
        val a0 = math.abs(v0)
        if (a0 > p0) p0 = a0
        if (channels == 2) {
          val v1 = ch1(i)
          if (v1 < chLo || v1 > chHi) return null
          s1 += v1
          val a1 = math.abs(v1)
          if (a1 > p1) p1 = a1
          if (sink != null) sink.accept(v0 + v1)
        } else if (sink != null) sink.accept(v0)
        i += 1
      }
      nFrames += blockSize
      frameIdx += 1
    }
    if (nFrames == 0) return null
    // a nonzero declared total must match what actually decoded
    if (totalSamples != 0 && totalSamples != nFrames) return null
    new GenericInternalRow(Array[Any](
      channels, bps, nFrames, s0, p0,
      if (channels == 2) s1 else null,
      if (channels == 2) p1 else null))
  }

  def apply(bytes: Column): Column =
    ColumnBridge.toColumn(FlacDecode(ColumnBridge.toExpression(bytes)))
}
