package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-sniffing AUDIO decode — the audio sibling of
  * [[MediaDecode]]: ONE expression that dispatches an opaque binary
  * payload by magic bytes to the right from-scratch sample kernel —
  * RIFF/WAVE → [[PcmDecode]], fLaC → [[FlacDecode]], FORM/AIFF →
  * [[AiffDecode]] — and folds the result into the family's shared
  * sample-statistics schema plus the detected format:
  *
  *   (format, channels, bits, n_frames, sum_c0, peak_c0, sum_c1, peak_c1)
  *
  * A crawled 100 TB corpus has no codec column; the sniff IS part of
  * the operator. A payload matching no magic, or matching but failing
  * its kernel's strict decode (malformed chunks, corrupted CRCs,
  * out-of-scope parameters), is one null row — the kernels' null
  * contracts compose. Because all three kernels are lossless sample
  * decoders, the MIXED gate stays hash-exact end to end (unlike the
  * image sniff, where JPEG rows need their own band gate).
  *
  * Decode runs once per row (Scala dispatch); map-only, codegen'd,
  * stream-safe.
  */
case class AudioDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "audio_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"audio_decode expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    AudioDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.AudioDecode.decode($v);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): AudioDecode =
    copy(child = c)
}

object AudioDecode {

  val schema: StructType = StructType(
    StructField("format", StringType, nullable = false) +: PcmDecode.schema.fields)

  def decode(b: Array[Byte]): InternalRow = {
    if (b.length < 12) return null
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      val r = PcmDecode.decode(b)
      if (r == null) return null
      wrap("wav", r)
    } else if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') {
      val r = FlacDecode.decode(b)
      if (r == null) return null
      wrap("flac", r)
    } else if (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
      b(8) == 'A' && b(9) == 'I' && b(10) == 'F' && b(11) == 'F') {
      val r = AiffDecode.decode(b)
      if (r == null) return null
      wrap("aiff", r)
    } else null
  }

  private def wrap(format: String, r: InternalRow): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(format),
      r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4),
      if (r.isNullAt(5)) null else r.getLong(5),
      if (r.isNullAt(6)) null else r.getInt(6)))

  def apply(bytes: Column): Column =
    ColumnBridge.toColumn(AudioDecode(ColumnBridge.toExpression(bytes)))
}
