package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL BMP pixel decode (Windows DIB): the uncompressed-truecolor member
  * of the codec family — no entropy coder, but three parsing traps PNG
  * and GIF don't have, each one a silent statistics-corruptor if missed:
  *
  *   - rows are stored BOTTOM-UP when biHeight > 0 (negative = top-down,
  *     both handled — a flipped decode passes the SUMS and fails the
  *     positioned thumb);
  *   - each row pads to a 4-byte boundary (stride = ceil(3w/4)·4 — an
  *     unpadded walk desyncs every row after the first);
  *   - samples are BGR, not RGB (a channel-order slip swaps sum_r/sum_b).
  *
  * Scope: BITMAPINFOHEADER (or longer — biSize ≥ 40 skips V4/V5
  * extensions, which only ADD fields), 24-bit BI_RGB, one plane. Palette
  * / 32-bit / RLE variants → null (documented; the 24-bit form is what
  * javax.imageio emits and web thumbnails carry). Output (width, height,
  * n_px, sum_r, sum_g, sum_b, thumb_hex) — the shared decoder convention.
  *
  * One fused map-only codegen expression; 64 MiB pixel cap.
  */
case class BmpDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BmpDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "bmp_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bmp_decode expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    BmpDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.BmpDecode.decode($v);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): BmpDecode =
    copy(child = c)
}

object BmpDecode {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("thumb_hex", StringType, nullable = false)))

  private val MaxPixels = 64 << 20

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    le16(b, i) | (le16(b, i + 2) << 16)

  def decode(bytes: Array[Byte]): InternalRow = {
    if (bytes.length < 54) return null
    if (bytes(0) != 'B' || bytes(1) != 'M') return null
    val dataOff = le32(bytes, 10)
    val hdrSize = le32(bytes, 14)
    if (hdrSize < 40) return null // BITMAPCOREHEADER variants out of scope
    val w = le32(bytes, 18)
    val hRaw = le32(bytes, 22)
    val topDown = hRaw < 0
    val h = if (topDown) -hRaw else hRaw
    val planes = le16(bytes, 26)
    val bpp = le16(bytes, 28)
    val comp = le32(bytes, 30)
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return null
    if (planes != 1 || bpp != 24 || comp != 0) return null
    // long arithmetic: a crafted biSize near Int.MaxValue overflows
    // `14 + hdrSize` negative and the sanity check passes spuriously
    if (dataOff < 14L + hdrSize) return null
    val stride = ((w * 3 + 3) / 4) * 4
    if (dataOff.toLong + stride.toLong * h > bytes.length) return null

    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      val storedRow = if (topDown) y else h - 1 - y
      var p = dataOff + storedRow * stride
      val rowEnd = p + w * 3
      while (p < rowEnd) {
        sb += u8(bytes, p)      // BGR order
        sg += u8(bytes, p + 1)
        sr += u8(bytes, p + 2)
        p += 3
      }
      y += 1
    }

    val hx = "0123456789abcdef"
    val sbuf = new java.lang.StringBuilder(24)
    var ty = 0
    while (ty < 2) {
      var tx = 0
      while (tx < 2) {
        val yy = (ty * h) / 2
        val storedRow = if (topDown) yy else h - 1 - yy
        val p = dataOff + storedRow * stride + 3 * ((tx * w) / 2)
        var k = 2 // emit RGB: stored B,G,R read back-to-front
        while (k >= 0) {
          val v = u8(bytes, p + k)
          sbuf.append(hx.charAt((v >> 4) & 15)).append(hx.charAt(v & 15))
          k -= 1
        }
        tx += 1
      }
      ty += 1
    }

    new GenericInternalRow(Array[Any](
      w, h, w.toLong * h, sr, sg, sb, UTF8String.fromString(sbuf.toString)))
  }

  def apply(bytes: Column): Column =
    ColumnBridge.toColumn(BmpDecode(ColumnBridge.toExpression(bytes)))
}
