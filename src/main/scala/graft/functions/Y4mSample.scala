package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL video frame-sampling for YUV4MPEG2 (y4m) payloads — raw YUV
  * video, the codec-free format, so like [[PpmDecode]]/[[PcmDecode]]
  * this works on actual frames where compressed video stays a labeled
  * stub. Samples every `step`-th frame (0, step, 2·step, …) and folds
  * its LUMA plane:
  *
  *   (width, height, n_frames, n_sampled, y_sum, y_peak)
  *
  * Format: `YUV4MPEG2` + space-separated tagged parameters ending at a
  * newline (W<width> H<height> required; C444 required — every plane is
  * width·height bytes, so frame size is exactly 3·w·h; the y4m DEFAULT
  * without a C tag is 4:2:0, whose subsampled geometry is out of scope
  * here and decodes to NULL rather than silently mis-sliced); then per
  * frame `FRAME` + optional parameters + `\n` + raw Y, U, V planes.
  * A truncated final frame invalidates the payload (unlike PCM's
  * sample-granularity tail, a partial FRAME is structural corruption).
  *
  * Map-only, codegen'd via a static kernel; one pass, and only sampled
  * frames' luma bytes are touched.
  */
case class Y4mSample(child: Expression, step: Int) extends UnaryExpression {

  override def dataType: DataType = Y4mSample.schema
  override def nullable: Boolean = true
  override def prettyName: String = "y4m_sample"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"y4m_sample expects binary, got ${child.dataType.catalogString}")
    else if (step < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"y4m_sample step must be >= 1, got $step")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    Y4mSample.sample(input.asInstanceOf[Array[Byte]], step)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.Y4mSample.sample($v, $step);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): Y4mSample =
    copy(child = c)
}

object Y4mSample {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("n_sampled", LongType, nullable = false),
    StructField("y_sum", LongType, nullable = false),
    StructField("y_peak", IntegerType, nullable = false)))

  private val Magic = "YUV4MPEG2".getBytes("US-ASCII")
  private val FrameTag = "FRAME".getBytes("US-ASCII")

  private def startsWith(b: Array[Byte], at: Int, tag: Array[Byte]): Boolean = {
    if (at + tag.length > b.length) return false
    var i = 0
    while (i < tag.length) { if (b(at + i) != tag(i)) return false; i += 1 }
    true
  }

  def sample(bytes: Array[Byte], step: Int): InternalRow = sample(bytes, step, null)

  /** Sample with an optional streaming [[FrameSink]] tap (per-frame
    * signature consumers); `sink` null-safe — the stats fold is
    * byte-identical with or without it.
    */
  private[graft] def sample(bytes: Array[Byte], step: Int, sink: FrameSink): InternalRow = {
    if (!startsWith(bytes, 0, Magic)) return null
    var i = Magic.length
    var w = -1; var h = -1; var c444 = false
    // space-separated tagged params up to the newline
    while (i < bytes.length && bytes(i) != '\n') {
      if (bytes(i) == ' ') i += 1
      else {
        val tag = bytes(i)
        val start = i + 1
        var j = start
        while (j < bytes.length && bytes(j) != ' ' && bytes(j) != '\n') j += 1
        tag match {
          case 'W' | 'H' =>
            var v = 0L
            var k = start
            while (k < j) {
              if (bytes(k) < '0' || bytes(k) > '9') return null
              v = v * 10 + (bytes(k) - '0')
              if (v > Int.MaxValue) return null
              k += 1
            }
            if (k == start) return null
            if (tag == 'W') w = v.toInt else h = v.toInt
          case 'C' =>
            c444 = j - start == 3 &&
              bytes(start) == '4' && bytes(start + 1) == '4' && bytes(start + 2) == '4'
          case _ => () // F/I/A/X params: irrelevant to the slice geometry
        }
        i = j
      }
    }
    if (i >= bytes.length || w <= 0 || h <= 0 || !c444) return null
    i += 1 // the header newline
    val frameBytes = 3L * w * h
    if (frameBytes > Int.MaxValue) return null
    var frames = 0L
    var sampled = 0L
    var ySum = 0L
    var yPeak = 0
    while (i < bytes.length) {
      if (!startsWith(bytes, i, FrameTag)) return null
      i += FrameTag.length
      while (i < bytes.length && bytes(i) != '\n') i += 1 // frame params
      if (i >= bytes.length) return null
      i += 1
      if (bytes.length - i < frameBytes) return null // truncated frame
      if (frames % step == 0) {
        sampled += 1
        val end = i + w * h // luma plane only
        var p = i
        while (p < end) {
          val v = bytes(p) & 0xff
          ySum += v
          if (v > yPeak) yPeak = v
          p += 1
        }
        if (sink != null) sink.acceptLuma(bytes, i, w, h)
      }
      i += frameBytes.toInt
      frames += 1
    }
    new GenericInternalRow(Array[Any](w, h, frames, sampled, ySum, yPeak))
  }

  def apply(bytes: Column, step: Int): Column =
    ColumnBridge.toColumn(Y4mSample(ColumnBridge.toExpression(bytes), step))
}
