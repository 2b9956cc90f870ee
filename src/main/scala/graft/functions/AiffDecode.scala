package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL sample decode for AIFF payloads (Apple Audio Interchange File
  * Format, the pre-WAV container a crawled corpus still carries for
  * legacy Mac-originated audio) — the BIG-ENDIAN sibling of
  * [[PcmDecode]], folding to the family's shared sample-statistics
  * schema:
  *
  *   (channels, bits, n_frames, sum_c0, peak_c0, sum_c1, peak_c1)
  *
  * Three traps distinguish it from WAV, each a silent corruptor if a
  * decoder pattern-matches the RIFF walk:
  *
  *   - EVERYTHING is big-endian: chunk sizes, COMM fields, samples
  *     (an LE walk desyncs at the first chunk boundary);
  *   - 8-bit samples are SIGNED (two's complement), NOT the unsigned
  *     128-midpoint WAV convention — the same byte stream decodes to
  *     different samples in the two containers (spec-pinned);
  *   - the frame count is DECLARED in COMM (numSampleFrames), not
  *     derived from the data chunk size: a declaration the SSND data
  *     cannot cover is a malformed file → null (the WAV analog —
  *     data-size overrun — also nulls there).
  *
  * IFF walk: `FORM` + u32-BE size + `AIFF` form type, then chunks
  * (id, u32-BE size, data, pad to even) until COMM and SSND are both
  * seen. COMM (≥ 18 bytes) carries channels (1-2), numSampleFrames,
  * sampleSize (8/16/24) and the sample rate as an 80-bit IEEE 754
  * EXTENDED float — parsed from scratch (sign/15-bit exponent/64-bit
  * mantissa) and required to be a positive INTEGRAL rate ≤ 2^31−1,
  * the only form a real recorder writes; a NaN/∞/fractional/huge rate
  * → null. SSND carries u32-BE offset (bounded by the chunk) and
  * blockSize (0 in real files — anything else → null), then the
  * interleaved big-endian signed frames. The AIFC variant (compressed,
  * different form type) and out-of-scope parameters → null.
  *
  * Map-only, codegen'd via a static kernel; streams through the same
  * [[MixSink]] tap as WAV/FLAC so [[AudioFingerprint]] covers AIFF
  * clips with no second decode pass.
  */
case class AiffDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PcmDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "aiff_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"aiff_decode expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    AiffDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.AiffDecode.decode($v);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): AiffDecode =
    copy(child = c)
}

object AiffDecode {

  private def beU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def beU16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** 80-bit IEEE 754 extended float at offset `i`, required to encode a
    * positive INTEGRAL value in [1, 2^31−1] — the sample-rate contract.
    * Returns −1 on any other encoding (negative, zero, NaN/∞, a
    * fractional rate, or one past the cap). The extended format has an
    * EXPLICIT integer bit (bit 63 of the mantissa), so value =
    * mantissa × 2^(exponent − 16383 − 63) with no hidden-bit fix-up.
    */
  private[graft] def extendedRate(b: Array[Byte], i: Int): Long = {
    val se = beU16(b, i)
    if ((se & 0x8000) != 0) return -1 // negative
    val exp = se & 0x7fff
    val mant = (beU32(b, i + 2) << 32) | beU32(b, i + 6)
    if (exp == 0x7fff) return -1 // NaN / infinity
    if (exp == 0 && mant == 0L) return -1 // zero
    val shift = exp - 16383 - 63 // mantissa × 2^shift
    if (shift > 0) return -1 // ≥ 2^64 — past any real rate
    if (shift < -63) return -1 // < 1 (denormal-small rates aren't rates)
    if (shift != 0 && (mant << (64 + shift)) != 0L) return -1 // fractional
    val rate = mant >>> -shift
    if (rate < 1L || rate > Int.MaxValue) -1 else rate
  }

  def decode(bytes: Array[Byte]): InternalRow = decode(bytes, null)

  /** Decode with an optional streaming [[MixSink]] tap (fingerprint
    * consumers); `sink` null-safe — the stats fold is byte-identical
    * with or without it.
    */
  private[graft] def decode(bytes: Array[Byte], sink: MixSink): InternalRow = {
    if (bytes.length < 12 ||
      bytes(0) != 'F' || bytes(1) != 'O' || bytes(2) != 'R' || bytes(3) != 'M' ||
      bytes(8) != 'A' || bytes(9) != 'I' || bytes(10) != 'F' || bytes(11) != 'F')
      return null
    var i = 12
    var commOk = false
    var channels = 0; var bits = 0; var declaredFrames = 0L
    var dataOff = -1; var dataLen = 0
    while (i + 8 <= bytes.length && (!commOk || dataOff < 0)) {
      val size = beU32(bytes, i + 4)
      if (size > bytes.length - i - 8) return null // chunk overruns payload
      val sz = size.toInt
      val isComm = bytes(i) == 'C' && bytes(i + 1) == 'O' &&
        bytes(i + 2) == 'M' && bytes(i + 3) == 'M'
      val isSsnd = bytes(i) == 'S' && bytes(i + 1) == 'S' &&
        bytes(i + 2) == 'N' && bytes(i + 3) == 'D'
      if (isComm) {
        if (sz < 18) return null
        channels = beU16(bytes, i + 8)
        declaredFrames = beU32(bytes, i + 10)
        bits = beU16(bytes, i + 14)
        if (channels < 1 || channels > 2 ||
          (bits != 8 && bits != 16 && bits != 24) ||
          extendedRate(bytes, i + 16) < 0)
          return null
        commOk = true
      } else if (isSsnd) {
        if (sz < 8) return null
        val offset = beU32(bytes, i + 8)
        val blockSize = beU32(bytes, i + 12)
        if (blockSize != 0L || offset > sz - 8) return null
        dataOff = i + 16 + offset.toInt
        dataLen = sz - 8 - offset.toInt
      }
      i += 8 + sz + (sz & 1) // chunks pad to even
    }
    if (!commOk || dataOff < 0) return null
    val frameBytes = channels * bits / 8
    // the declaration is the contract: SSND data that can't cover it is
    // a truncated/corrupt file (extra bytes past the declared frames
    // are ignored, the strict mirror of WAV's partial-tail rule)
    if (declaredFrames > dataLen / frameBytes) return null
    val frames = declaredFrames.toInt
    if (sink != null) sink.init(frames.toLong)
    var s0 = 0L; var s1 = 0L
    var p0 = 0; var p1 = 0
    var f = 0
    while (f < frames) {
      val base = dataOff + f * frameBytes
      var mix = 0
      var c = 0
      while (c < channels) {
        val v =
          if (bits == 8) bytes(base + c).toInt // SIGNED — the AIFF trap
          else if (bits == 16) {
            val o = base + 2 * c
            (bytes(o) << 8) | (bytes(o + 1) & 0xff) // sign from the high byte
          } else { // 24-bit: signed BE byte triple
            val o = base + 3 * c
            (bytes(o) << 16) | ((bytes(o + 1) & 0xff) << 8) | (bytes(o + 2) & 0xff)
          }
        val a = math.abs(v)
        if (c == 0) { s0 += v; if (a > p0) p0 = a }
        else { s1 += v; if (a > p1) p1 = a }
        mix += v
        c += 1
      }
      if (sink != null) sink.accept(mix)
      f += 1
    }
    new GenericInternalRow(Array[Any](
      channels, bits, frames.toLong, s0, p0,
      if (channels == 2) s1 else null,
      if (channels == 2) p1 else null))
  }

  def apply(bytes: Column): Column =
    ColumnBridge.toColumn(AiffDecode(ColumnBridge.toExpression(bytes)))
}
