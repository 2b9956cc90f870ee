package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM image header parsing over a binary payload column — the
  * multimodal metadata step that needs NO codec: container format, pixel
  * dimensions and color layout live in the first bytes of the file.
  *
  *   - PNG: 8-byte signature, then the IHDR chunk (width/height as
  *     big-endian u32 at offsets 16/20, color type at 25).
  *   - JPEG: SOI then a marker-segment walk (skipping APPn/DQT/…, honoring
  *     0xFF fill bytes) to the first SOFn frame header (height/width as
  *     big-endian u16, component count 1=grayscale/3=YCbCr).
  *   - anything else: format "unknown", NULL dimensions.
  *
  * One codegen'd expression (struct out, no shuffle, payload read once);
  * the real decode/resize steps remain stubs (`Multimodal`) — this is the
  * part of multimodal ingest that is exact and container-native.
  */
case class ImageHeader(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageHeader.schema
  override def nullable: Boolean = true
  override def prettyName: String = "image_header"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"image_header expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    ImageHeader.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.functions.ImageHeader.parse($v);"
    })

  override protected def withNewChildInternal(c: Expression): ImageHeader =
    copy(child = c)
}

object ImageHeader {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    // PNG color type (0 gray, 2 RGB, 3 palette, 4 gray+A, 6 RGBA) or JPEG
    // component count (1 grayscale, 3 YCbCr, 4 CMYK)
    StructField("color_type", IntegerType, nullable = true)))

  private val Png = UTF8String.fromString("png")
  private val Jpeg = UTF8String.fromString("jpeg")
  private val Unknown = UTF8String.fromString("unknown")

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def row(fmt: UTF8String, w: Any, h: Any, c: Any): InternalRow =
    new GenericInternalRow(Array[Any](fmt, w, h, c))

  def parse(b: Array[Byte]): InternalRow = {
    // PNG: signature + IHDR (the spec REQUIRES IHDR first; tolerate only
    // the signature for truncated files → unknown)
    if (b.length >= 8 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a) {
      if (b.length >= 26 &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        return row(Png, be32(b, 16), be32(b, 20), b(25) & 0xff)
      return row(Png, null, null, null) // signature but truncated header
    }
    // JPEG: SOI, then walk marker segments to the first SOFn
    if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 1 < b.length && (b(i) & 0xff) == 0xff) {
        val m = b(i + 1) & 0xff
        if (m == 0xff) i += 1 // fill byte before a marker
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          // SOFn: len(2) precision(1) height(2) width(2) ncomp(1)
          if (i + 9 < b.length)
            return row(Jpeg, be16(b, i + 7), be16(b, i + 5), b(i + 9) & 0xff)
          return row(Jpeg, null, null, null)
        } else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
        else if (m == 0xd9 || m == 0xda) i = b.length // EOI / entropy data: stop
        else if (i + 3 < b.length) {
          val len = be16(b, i + 2)
          if (len < 2) i = b.length else i += 2 + len
        } else i = b.length
      }
      return row(Jpeg, null, null, null) // SOI but no SOF found
    }
    row(Unknown, null, null, null)
  }

  def apply(payload: Column): Column =
    ColumnBridge.toColumn(ImageHeader(ColumnBridge.toExpression(payload)))
}
