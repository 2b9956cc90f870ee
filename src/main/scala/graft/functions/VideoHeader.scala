package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM video container header parsing — the MP4/ISO-BMFF sibling of
  * [[ImageHeader]] and [[AudioHeader]], completing the image/audio/video
  * triad: brand, presentation duration, and track pixel dimensions live
  * entirely in the container boxes, no codec needed.
  *
  * Box walk (ISO/IEC 14496-12): `[size(4 BE)][type(4)]` records; a
  * leading `ftyp` box makes the blob an MP4 (its first payload word is
  * the major brand); inside `moov`, `mvhd` v0 carries
  * (timescale, duration) at payload offsets 12/16 —
  * duration_ms = duration * 1000 / timescale — and the first
  * `trak`/`tkhd` v0 carries 16.16 fixed-point width/height at payload
  * offsets 76/80. Version-1 (64-bit time) boxes and the rare
  * size==0/size==1 (to-EOF / 64-bit largesize) records end the walk
  * gracefully: whatever was parsed so far is returned. Anything without
  * a leading ftyp parses as format "unknown" with NULL fields.
  *
  * All offsets are LONG and every advance is at least 8 bytes, so a
  * corrupt or adversarial size field can stall nothing (the
  * [[AudioHeader]] Int-wrap lesson). One codegen'd expression — struct
  * out, no shuffle, payload read once; frame decode stays stubbed in
  * `Multimodal` by design.
  */
case class VideoHeader(child: Expression) extends UnaryExpression {

  override def dataType: DataType = VideoHeader.schema
  override def nullable: Boolean = true
  override def prettyName: String = "video_header"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"video_header expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    VideoHeader.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.functions.VideoHeader.parse($v);"
    })

  override protected def withNewChildInternal(c: Expression): VideoHeader =
    copy(child = c)
}

object VideoHeader {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("brand", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  private val Mp4 = UTF8String.fromString("mp4")
  private val Unknown = UTF8String.fromString("unknown")

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  def parse(b: Array[Byte]): InternalRow = {
    // an MP4 begins with an ftyp box: size >= 16, type 'ftyp'
    if (b.length < 16 || !tag(b, 4, "ftyp") || be32(b, 0) < 16)
      return new GenericInternalRow(Array[Any](Unknown, null, null, null, null))
    val brand = UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, 8, 12))

    var width: Any = null
    var height: Any = null
    var durationMs: Any = null

    // walk boxes in [from, until); returns nothing, fills the fields above
    def walk(from: Long, until: Long, depth: Int): Unit = {
      if (depth > 4) return // moov > trak > tkhd is depth 3; cap the recursion
      var i = from
      while (i + 8 <= until) {
        val at = i.toInt
        val size = be32(b, at)
        if (size < 8) return // 0 = to-EOF, 1 = 64-bit largesize: stop here
        val end = math.min(i + size, until)
        if (tag(b, at + 4, "moov")) {
          walk(i + 8, end, depth + 1)
        } else if (tag(b, at + 4, "trak")) {
          walk(i + 8, end, depth + 1)
        } else if (tag(b, at + 4, "mvhd") && i + 8 + 20 <= end && b(at + 8) == 0) {
          // v0 payload: ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4).
          // Bounds use the BOX's own end, never the container's: a short
          // mvhd followed by a sibling box must not read the sibling's
          // bytes as timescale/duration (the AudioHeader short-fmt trap)
          val timescale = be32(b, at + 8 + 12)
          val duration = be32(b, at + 8 + 16)
          if (timescale > 0) durationMs = duration * 1000L / timescale
        } else if (tag(b, at + 4, "tkhd") && i + 8 + 84 <= end &&
            b(at + 8) == 0 && width == null) {
          // v0 payload: …(76 bytes)… width(16.16 fixed) height(16.16 fixed)
          width = (be32(b, at + 8 + 76) >> 16).toInt
          height = (be32(b, at + 8 + 80) >> 16).toInt
        }
        i += size // LONG arithmetic: adversarial sizes cannot wrap or stall
      }
    }
    walk(0L, b.length.toLong, 0)
    new GenericInternalRow(Array[Any](Mp4, brand, width, height, durationMs))
  }

  def apply(payload: Column): Column =
    ColumnBridge.toColumn(VideoHeader(ColumnBridge.toExpression(payload)))
}
