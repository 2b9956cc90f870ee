package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** VIDEO FRAME-SIGNATURE extraction — frame sampling composed with the
  * perceptual dHash primitive (VERDICT r18 #5): every `step`-th frame's
  * (gw·gh)-cell difference hash folded into a per-video SIGNATURE
  * ARRAY, the feature video dedup mines on ("two clips share a frame"
  * becomes an inverted-list equi-join on signature values —
  * [[graft.pipeline.Dedup.videoFrameSigPairs]], never all-pairs).
  *
  * Container dispatch composes the existing frame walks through their
  * streaming [[FrameSink]] seams — ONE container pass, no frame copies:
  *   - YUV4MPEG2 → [[Y4mSample]]: each sampled frame's LUMA plane is
  *     hashed in place (gray = Y);
  *   - GIF87a/89a animations → [[GifDecode.decodeFrames]]: each sampled
  *     COMPOSITED canvas (disposal/transparency honored) is hashed with
  *     gray = r + g + b.
  * Both hashes use the integer-exact floor-cell / cross-multiplied-mean
  * machinery of [[ImageDHash]], so signatures are oracle-gatable.
  *
  * Null contract: whatever the walk nulls (truncation, malformed
  * structure, out-of-scope variants), plus frames below the hash grid
  * (w < gw or h < gh). Map-only, codegen'd, stream-safe. O(grid) state
  * per frame — a 100 TB corpus of hour-long clips folds in one pass.
  */
case class VideoFrameSigs(child: Expression, step: Int, gw: Int, gh: Int)
    extends UnaryExpression {

  override def dataType: DataType = VideoFrameSigs.schema
  override def nullable: Boolean = true
  override def prettyName: String = "video_frame_sigs"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"video_frame_sigs expects binary, got ${child.dataType.catalogString}")
    else if (step < 1 || gw < 2 || gh < 1 || (gw - 1) * gh > 64)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"video_frame_sigs needs step >= 1 and a <= 64-bit grid; got step=$step ${gw}x$gh")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    VideoFrameSigs.sigs(input.asInstanceOf[Array[Byte]], step, gw, gh)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.VideoFrameSigs.sigs($v, $step, $gw, $gh);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): VideoFrameSigs =
    copy(child = c)
}

object VideoFrameSigs {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("n_sampled", LongType, nullable = false),
    StructField("sigs", ArrayType(LongType, containsNull = false), nullable = false)))

  private final class SigSink(gw: Int, gh: Int) extends FrameSink {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var belowGrid = false
    override def acceptLuma(bytes: Array[Byte], off: Int, w: Int, h: Int): Unit =
      if (w < gw || h < gh) belowGrid = true
      else out += ImageDHash.hashLuma(bytes, off, w, h, gw, gh)
    override def acceptCanvas(canvas: Array[Int], w: Int, h: Int): Unit =
      if (w < gw || h < gh) belowGrid = true
      else out += ImageDHash.hashPacked(canvas, w, h, gw, gh)
  }

  def sigs(bytes: Array[Byte], step: Int, gw: Int, gh: Int): InternalRow = {
    if (bytes.length < 10) return null
    val sink = new SigSink(gw, gh)
    val (format, walked) =
      if (bytes(0) == 'Y') ("y4m", Y4mSample.sample(bytes, step, sink))
      else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8')
        ("gif", GifDecode.decodeFrames(bytes, step, sink))
      else return null
    if (walked == null || sink.belowGrid) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(format),
      walked.getInt(0), walked.getInt(1),
      walked.getLong(2), walked.getLong(3),
      new GenericArrayData(sink.out.toArray)))
  }

  def apply(bytes: Column, step: Int, gw: Int, gh: Int): Column =
    ColumnBridge.toColumn(
      VideoFrameSigs(ColumnBridge.toExpression(bytes), step, gw, gh))
}
