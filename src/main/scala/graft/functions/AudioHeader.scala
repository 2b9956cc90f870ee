package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM audio container header parsing — the WAV/RIFF sibling of
  * [[ImageHeader]]: sample layout and duration live entirely in the
  * container header, no codec needed.
  *
  * RIFF walk: "RIFF" + size + "WAVE", then chunk headers (id(4) +
  * size(4, little-endian)) until both "fmt " (audio format, channels,
  * sample rate, bits per sample) and "data" (payload byte count) are
  * seen; duration_ms = data bytes * 1000 / byte rate. Chunk sizes pad to
  * even offsets per the RIFF spec. Anything that is not a RIFF/WAVE blob
  * parses as format "unknown" with NULL fields.
  *
  * One codegen'd expression (struct out, no shuffle, payload read once) —
  * like the image twin, this is the exact, container-native part of
  * multimodal ingest; sample decode stays stubbed in `Multimodal`.
  */
case class AudioHeader(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioHeader.schema
  override def nullable: Boolean = true
  override def prettyName: String = "audio_header"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"audio_header expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    AudioHeader.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.functions.AudioHeader.parse($v);"
    })

  override protected def withNewChildInternal(c: Expression): AudioHeader =
    copy(child = c)
}

object AudioHeader {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits_per_sample", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  private val Wav = UTF8String.fromString("wav")
  private val Unknown = UTF8String.fromString("unknown")

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  def parse(b: Array[Byte]): InternalRow = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return new GenericInternalRow(Array[Any](Unknown, null, null, null, null))
    var channels = -1
    var rate = -1
    var bits = -1
    var byteRate = -1L
    var dataBytes = -1L
    var i = 12L
    while (i + 8 <= b.length && (channels < 0 || dataBytes < 0)) {
      val at = i.toInt
      val size = le32(b, at + 4).toLong & 0xffffffffL
      // the fmt chunk must DECLARE the 16 PCM header bytes (and the
      // buffer must hold them) — checking only the buffer length would
      // read the NEXT chunk's bytes as channels/rate on a short fmt
      if (tag(b, at, "fmt ") && size >= 16 && i + 8 + 16 <= b.length) {
        channels = le16(b, at + 10)
        rate = le32(b, at + 12)
        byteRate = le32(b, at + 16).toLong & 0xffffffffL
        bits = le16(b, at + 22)
      } else if (tag(b, at, "data")) {
        // size may exceed what is actually present (truncated blob):
        // duration reflects the DECLARED payload, like every WAV reader
        dataBytes = size
      }
      // LONG arithmetic: size is unsigned-32 (up to 4 GiB); an Int
      // advance wraps negative or to ZERO on adversarial sizes and the
      // walk spins forever on one corrupt blob
      i += 8L + size + (size & 1L) // chunks pad to even offsets
    }
    if (channels < 0) // a RIFF/WAVE with no fmt chunk is not playable
      return new GenericInternalRow(Array[Any](Wav, null, null, null, null))
    val duration: Any =
      if (dataBytes >= 0 && byteRate > 0)
        math.floor(dataBytes * 1000.0 / byteRate).toLong
      else null
    new GenericInternalRow(Array[Any](Wav, channels, rate, bits, duration))
  }

  def apply(payload: Column): Column =
    ColumnBridge.toColumn(AudioHeader(ColumnBridge.toExpression(payload)))
}
