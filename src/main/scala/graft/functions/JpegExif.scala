package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JPEG EXIF metadata walk (APP1 "Exif\0\0" → TIFF IFD0) — the
  * header-parse operator an image pipeline needs BEFORE decode:
  * orientation (tag 0x0112) decides whether a raster must be
  * rotated/flipped, DateTime (0x0132) and Make/Model (0x010F/0x0110)
  * drive dedup keys and provenance filters. References: JEITA CP-3451
  * (Exif 2.3) + TIFF 6.0 §2.
  *
  * Walk: SOI, then marker segments until SOS/EOI; the first APP1 whose
  * payload starts "Exif\0\0" carries a TIFF stream — byte order (II/MM,
  * BOTH handled), magic 42, IFD0 offset, then IFD0's 12-byte entries
  * (tag, type, count, value-or-offset; values ≤ 4 bytes are INLINE and
  * left-justified in the field, which is where naive big-endian parsers
  * break). Extracted: orientation (SHORT 1..8; anything else → the
  * field nulls), datetime (ASCII, the trailing NUL stripped), make,
  * model. Output is one struct; a payload with no SOI, no APP1-Exif, or
  * a malformed TIFF header → null ROW (no EXIF is a normal condition —
  * callers treat it like any other absent metadata).
  *
  * Offsets are bounds-checked against the APP1 segment, never the whole
  * payload — a crafted IFD cannot read outside its segment. Map-only,
  * codegen'd, stream-safe.
  */
case class JpegExif(child: Expression) extends UnaryExpression {

  override def dataType: DataType = JpegExif.schema
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_exif"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jpeg_exif expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    JpegExif.extract(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.JpegExif.extract($v);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): JpegExif =
    copy(child = c)
}

object JpegExif {

  val schema: StructType = StructType(Seq(
    StructField("orientation", IntegerType, nullable = true),
    StructField("datetime", StringType, nullable = true),
    StructField("make", StringType, nullable = true),
    StructField("model", StringType, nullable = true)))

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  def extract(bytes: Array[Byte]): InternalRow = {
    if (bytes.length < 4) return null
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return null
    var pos = 2
    while (pos + 3 < bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return null
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return null // no EXIF before scan
      if (marker == 0xff) { pos += 1 } // fill byte
      else {
        val len = u16be(bytes, pos + 2)
        if (len < 2 || pos + 2 + len > bytes.length) return null
        if (marker == 0xe1 && len >= 2 + 6 + 8 &&
          bytes(pos + 4) == 'E' && bytes(pos + 5) == 'x' &&
          bytes(pos + 6) == 'i' && bytes(pos + 7) == 'f' &&
          bytes(pos + 8) == 0 && bytes(pos + 9) == 0) {
          // TIFF stream spans [tiff, segEnd)
          return parseTiff(bytes, pos + 10, pos + 2 + len)
        }
        pos += 2 + len
      }
    }
    null
  }

  private def parseTiff(b: Array[Byte], tiff: Int, end: Int): InternalRow = {
    if (tiff + 8 > end) return null
    val little =
      if (b(tiff) == 'I' && b(tiff + 1) == 'I') true
      else if (b(tiff) == 'M' && b(tiff + 1) == 'M') false
      else return null
    def u16(i: Int): Int =
      if (little) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(i: Int): Long =
      if (little)
        (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
          ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      else
        ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
          ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    if (u16(tiff + 2) != 42) return null
    val ifd0 = u32(tiff + 4)
    if (ifd0 < 8 || tiff + ifd0 + 2 > end) return null
    val ifdPos = tiff + ifd0.toInt
    val n = u16(ifdPos)
    if (ifdPos + 2 + 12 * n > end) return null

    var orientation: Any = null
    var datetime: Any = null
    var make: Any = null
    var model: Any = null

    var i = 0
    while (i < n) {
      val e = ifdPos + 2 + 12 * i
      val tag = u16(e)
      val typ = u16(e + 2)
      val count = u32(e + 4)
      tag match {
        case 0x0112 if typ == 3 && count == 1 => // orientation SHORT
          val v = u16(e + 8) // inline, left-justified in the field
          if (v >= 1 && v <= 8) orientation = v
        case 0x0132 | 0x010f | 0x0110 if typ == 2 && count >= 1 && count <= 4096 =>
          val off =
            if (count <= 4) e + 8
            else {
              val o = u32(e + 8)
              if (o < 0 || tiff + o + count > end) -1L else tiff + o
            }
          if (off >= 0 && off + count <= end) {
            var len = count.toInt
            while (len > 0 && b(off.toInt + len - 1) == 0) len -= 1
            var ok = true
            var j = 0
            while (j < len) {
              val c = b(off.toInt + j) & 0xff
              if (c < 0x20 || c > 0x7e) ok = false
              j += 1
            }
            if (ok && len > 0) {
              val s = UTF8String.fromBytes(
                java.util.Arrays.copyOfRange(b, off.toInt, off.toInt + len))
              tag match {
                case 0x0132 => datetime = s
                case 0x010f => make = s
                case _ => model = s
              }
            }
          }
        case _ => ()
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](orientation, datetime, make, model))
  }

  def apply(bytes: Column): Column =
    ColumnBridge.toColumn(JpegExif(ColumnBridge.toExpression(bytes)))
}
