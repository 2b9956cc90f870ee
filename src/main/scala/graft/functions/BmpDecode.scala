package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL BMP pixel decode (Windows DIB): the no-entropy-coder member of
  * the codec family, with three parsing traps PNG and GIF don't have,
  * each a silent statistics-corruptor if missed:
  *
  *   - rows are stored BOTTOM-UP when biHeight > 0 (negative = top-down,
  *     both handled — a flipped decode passes the SUMS and fails the
  *     positioned thumb);
  *   - each row pads to a 4-byte boundary (an unpadded walk desyncs
  *     every row after the first);
  *   - samples are BGR(A), not RGB (a channel-order slip swaps
  *     sum_r/sum_b).
  *
  * Scope: BITMAPINFOHEADER (or longer — biSize ≥ 40 skips V4/V5
  * extensions, which only ADD fields), one plane, four pixel formats:
  *
  *   - 24-bit BI_RGB (what javax.imageio emits for truecolor);
  *   - 32-bit BI_RGB (BGRx quads — the 4th byte is reserved/alpha and
  *     is IGNORED: the family schema carries RGB statistics);
  *   - 8-bit BI_RGB palette (BGRx color-table quads; biClrUsed 0 means
  *     a full 256-entry table; an index past the table → null, the
  *     strict GIF/PNG palette contract);
  *   - 8-bit BI_RLE8 (run-length: encoded runs, absolute mode with
  *     word padding, EOL / EOB / delta escapes; pixels skipped by
  *     deltas or an early EOB stay index 0 per the DIB
  *     undefined-pixel convention, and bytes after EOB are ignored —
  *     EOB IS the end of the bitmap; RLE is bottom-up by definition,
  *     a top-down height → null). Runs past the row edge, deltas off
  *     the bitmap, or truncation BEFORE EOB → null.
  *
  * Everything else (1/4/16-bit, BI_BITFIELDS, core headers) → null.
  * Output (width, height, n_px, sum_r, sum_g, sum_b, thumb_hex) — the
  * shared decoder convention.
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

  /** Parsed DIB layout — the shared front-end behind the statistics
    * fold ([[decode]]) and the expanded-RGB seam ([[decodeRaster]]).
    * Direct (24/32-bit) payloads carry `idx == null` and the stored-row
    * geometry; palette payloads carry the TOP-DOWN index raster.
    */
  private final class Dib(
      val w: Int, val h: Int,
      val topDown: Boolean, val dataOff: Int, val stride: Int, val bypp: Int,
      val idx: Array[Byte], val palOff: Int, val palCount: Int)

  /** Expanded interleaved-RGB raster, top-down (the
    * [[JpegDecode.Raster]] shape) — the seam that lets raster consumers
    * ([[ImageDHash]], positional features) run over BMP payloads:
    * direct rows re-ordered upright with BGR swapped to RGB, palette
    * indices through the BGRx color table (an out-of-table index nulls,
    * like the statistics fold). Same strict scope as [[decode]].
    */
  def decodeRaster(bytes: Array[Byte]): JpegDecode.Raster = {
    val d = parse(bytes)
    if (d == null) return null
    // the PNG seam's 64 MiB expansion budget (RLE8 can inflate a small
    // payload toward MaxPixels; direct payloads carry their own bytes)
    if (3L * d.w * d.h > (64 << 20)) return null
    val out = new Array[Byte](3 * d.w * d.h)
    if (d.idx == null) {
      var y = 0
      var o = 0
      while (y < d.h) {
        val storedRow = if (d.topDown) y else d.h - 1 - y
        var p = d.dataOff + storedRow * d.stride
        val rowEnd = p + d.w * d.bypp
        while (p < rowEnd) {
          out(o) = bytes(p + 2); out(o + 1) = bytes(p + 1); out(o + 2) = bytes(p)
          o += 3; p += d.bypp
        }
        y += 1
      }
    } else {
      var i = 0
      while (i < d.idx.length) {
        val j = d.idx(i) & 0xff
        if (j >= d.palCount) return null
        val e = d.palOff + 4 * j // BGRx quad
        out(3 * i) = bytes(e + 2); out(3 * i + 1) = bytes(e + 1); out(3 * i + 2) = bytes(e)
        i += 1
      }
    }
    new JpegDecode.Raster(d.w, d.h, 3, out)
  }

  def decode(bytes: Array[Byte]): InternalRow = {
    val d = parse(bytes)
    if (d == null) return null
    if (d.idx == null) statsDirect(bytes, d.w, d.h, d.topDown, d.dataOff, d.stride, d.bypp)
    else statsPalette(bytes, d.palOff, d.palCount, d.idx, d.w, d.h)
  }

  private def parse(bytes: Array[Byte]): Dib = {
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
    val clrUsed = le32(bytes, 46)
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return null
    if (planes != 1) return null
    // long arithmetic: a crafted biSize near Int.MaxValue overflows
    // `14 + hdrSize` negative and the sanity check passes spuriously
    if (dataOff < 14L + hdrSize) return null

    if ((bpp == 24 || bpp == 32) && comp == 0) {
      val bypp = bpp / 8
      val stride = ((w * bypp + 3) / 4) * 4
      if (dataOff.toLong + stride.toLong * h > bytes.length) return null
      new Dib(w, h, topDown, dataOff, stride, bypp, null, -1, 0)
    } else if (bpp == 8 && (comp == 0 || comp == 1)) {
      // color table: BGRx quads at the header's end
      val palCount = if (clrUsed == 0) 256 else clrUsed
      if (palCount < 1 || palCount > 256) return null
      val palOff = 14 + hdrSize
      if (dataOff < palOff.toLong + 4L * palCount) return null
      if (palOff + 4 * palCount > bytes.length) return null
      val idx: Array[Byte] =
        if (comp == 0) {
          val stride = ((w + 3) / 4) * 4
          if (dataOff.toLong + stride.toLong * h > bytes.length) return null
          val out = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            val storedRow = if (topDown) y else h - 1 - y
            System.arraycopy(bytes, dataOff + storedRow * stride, out, y * w, w)
            y += 1
          }
          out
        } else {
          if (topDown) return null // RLE is bottom-up by definition
          decodeRle8(bytes, dataOff, w, h)
        }
      if (idx == null) return null
      new Dib(w, h, topDown, dataOff, 0, 0, idx, palOff, palCount)
    } else null
  }

  /** 24/32-bit BGR(x) rows straight out of the payload. */
  private def statsDirect(
      bytes: Array[Byte], w: Int, h: Int, topDown: Boolean,
      dataOff: Int, stride: Int, bypp: Int): InternalRow = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      val storedRow = if (topDown) y else h - 1 - y
      var p = dataOff + storedRow * stride
      val rowEnd = p + w * bypp
      while (p < rowEnd) {
        sb += u8(bytes, p)      // BGR(x) order; byte 4 (if any) ignored
        sg += u8(bytes, p + 1)
        sr += u8(bytes, p + 2)
        p += bypp
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
        val p = dataOff + storedRow * stride + bypp * ((tx * w) / 2)
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

  /** Palette-expanded statistics over a TOP-DOWN index raster; the
    * strict palette bound (an out-of-table index → null, like GIF/PNG)
    * is folded into the same pass.
    */
  private def statsPalette(
      bytes: Array[Byte], palOff: Int, palCount: Int, idx: Array[Byte],
      w: Int, h: Int): InternalRow = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < idx.length) {
      val j = idx(i) & 0xff
      if (j >= palCount) return null
      val e = palOff + 4 * j // BGRx quad
      sb += u8(bytes, e)
      sg += u8(bytes, e + 1)
      sr += u8(bytes, e + 2)
      i += 1
    }
    val hx = "0123456789abcdef"
    val sbuf = new java.lang.StringBuilder(24)
    var ty = 0
    while (ty < 2) {
      var tx = 0
      while (tx < 2) {
        val e = palOff + 4 * (idx(((ty * h) / 2) * w + (tx * w) / 2) & 0xff)
        var k = 2
        while (k >= 0) {
          val v = u8(bytes, e + k)
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

  /** BI_RLE8 → TOP-DOWN index raster (the stored stream is bottom-up;
    * rows are flipped as they complete). Null on malformed: runs past
    * the row edge, deltas off the bitmap, truncation before EOB.
    * Skipped pixels (deltas, early EOL) stay index 0 — the DIB
    * convention for undefined RLE pixels.
    */
  private def decodeRle8(
      bytes: Array[Byte], dataOff: Int, w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h) // top-down, zero-initialized
    var p = dataOff
    var x = 0
    var row = 0 // bottom-up row index
    def outRow(r: Int): Int = (h - 1 - r) * w
    while (p + 1 < bytes.length) {
      val n = u8(bytes, p)
      val v = u8(bytes, p + 1)
      p += 2
      if (n > 0) {
        // encoded run: n copies of index v
        if (row >= h || x + n > w) return null
        java.util.Arrays.fill(out, outRow(row) + x, outRow(row) + x + n, v.toByte)
        x += n
      } else v match {
        case 0 => // end of line
          x = 0
          row += 1
          if (row > h) return null
        case 1 => // end of bitmap
          return out
        case 2 => // delta
          if (p + 1 >= bytes.length) return null
          val dx = u8(bytes, p); val dy = u8(bytes, p + 1)
          p += 2
          if (row + dy >= h || x + dx > w) return null
          x += dx
          row += dy
        case cnt => // absolute mode: cnt literal indices, word-padded
          if (row >= h || x + cnt > w) return null
          if (p + cnt > bytes.length) return null
          var i = 0
          val base = outRow(row) + x
          while (i < cnt) { out(base + i) = bytes(p + i); i += 1 }
          x += cnt
          p += cnt + (cnt & 1) // pad to 16-bit boundary
      }
    }
    null // ran out of data before EOB
  }

  def apply(bytes: Column): Column =
    ColumnBridge.toColumn(BmpDecode(ColumnBridge.toExpression(bytes)))
}
