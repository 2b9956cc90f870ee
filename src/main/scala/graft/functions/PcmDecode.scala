package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL sample decode for PCM WAV payloads — like [[PpmDecode]], the
  * uncompressed format needs no codec library; this decodes actual
  * samples (compressed-audio codecs remain out of scope — no lossless
  * audio format with a spec-mandated JDK-primitive decode exists here
  * the way PNG does for images):
  *
  *   (channels, bits, n_frames, sum_c0, peak_c0, sum_c1, peak_c1)
  *
  *   - per-channel signed sample SUMS as exact longs and PEAKS
  *     (max |sample|) as ints — integer-exact on any engine;
  *   - 8-bit PCM is unsigned with a 128 midpoint (the WAV convention):
  *     sample = byte − 128. 16-bit is signed little-endian; 24-bit is
  *     signed little-endian byte triples (the hi-res depth FLAC also
  *     decodes — peaks ≤ 2^23 still fit the int peak columns);
  *   - a trailing PARTIAL frame (data size not a multiple of the block
  *     align) is ignored, the way real decoders treat a truncated tail;
  *   - mono payloads carry null (sum_c1, peak_c1).
  *
  * RIFF walk: `RIFF….WAVE`, then chunks (id, u32-LE size, data, pad to
  * even) until `fmt ` and `data` are both seen. Requires audio format 1
  * (PCM), 8/16/24 bits, 1-2 channels, and a block align that matches —
  * anything else (wrong magic, compressed formats, malformed chunks)
  * decodes to NULL. Map-only, codegen'd via a static kernel.
  */
case class PcmDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PcmDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "pcm_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pcm_decode expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    PcmDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.PcmDecode.decode($v);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): PcmDecode =
    copy(child = c)
}

object PcmDecode {

  val schema: StructType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("sum_c0", LongType, nullable = false),
    StructField("peak_c0", IntegerType, nullable = false),
    StructField("sum_c1", LongType, nullable = true),
    StructField("peak_c1", IntegerType, nullable = true)))

  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  def decode(bytes: Array[Byte]): InternalRow = decode(bytes, null)

  /** Decode with an optional streaming [[MixSink]] tap (fingerprint
    * consumers); `sink` null-safe — the stats fold is byte-identical
    * with or without it.
    */
  private[graft] def decode(bytes: Array[Byte], sink: MixSink): InternalRow = {
    if (bytes.length < 12 ||
      bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
      bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E')
      return null
    var i = 12
    var fmtOk = false
    var channels = 0; var bits = 0; var blockAlign = 0
    var dataOff = -1; var dataLen = 0
    while (i + 8 <= bytes.length && (!fmtOk || dataOff < 0)) {
      val size = leU32(bytes, i + 4)
      if (size > bytes.length - i - 8) return null // chunk overruns payload
      val sz = size.toInt
      val isFmt = bytes(i) == 'f' && bytes(i + 1) == 'm' &&
        bytes(i + 2) == 't' && bytes(i + 3) == ' '
      val isData = bytes(i) == 'd' && bytes(i + 1) == 'a' &&
        bytes(i + 2) == 't' && bytes(i + 3) == 'a'
      if (isFmt) {
        if (sz < 16) return null
        val audioFormat = leU16(bytes, i + 8)
        channels = leU16(bytes, i + 10)
        blockAlign = leU16(bytes, i + 20)
        bits = leU16(bytes, i + 22)
        if (audioFormat != 1 || channels < 1 || channels > 2 ||
          (bits != 8 && bits != 16 && bits != 24) ||
          blockAlign != channels * bits / 8)
          return null
        fmtOk = true
      } else if (isData) {
        dataOff = i + 8
        dataLen = sz
      }
      i += 8 + sz + (sz & 1) // chunks pad to even
    }
    if (!fmtOk || dataOff < 0) return null
    val frames = dataLen / blockAlign // trailing partial frame ignored
    if (sink != null) sink.init(frames.toLong)
    var s0 = 0L; var s1 = 0L
    var p0 = 0; var p1 = 0
    var f = 0
    while (f < frames) {
      val base = dataOff + f * blockAlign
      var mix = 0
      var c = 0
      while (c < channels) {
        val v =
          if (bits == 8) (bytes(base + c) & 0xff) - 128
          else if (bits == 16) {
            val u = leU16(bytes, base + 2 * c)
            if (u >= 0x8000) u - 0x10000 else u
          } else { // 24-bit: signed LE byte triple (the hi-res WAV reality)
            val o = base + 3 * c
            val u = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
              ((bytes(o + 2) & 0xff) << 16)
            if (u >= 0x800000) u - 0x1000000 else u
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
    ColumnBridge.toColumn(PcmDecode(ColumnBridge.toExpression(bytes)))
}
