package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL GIF pixel decode, from scratch on the core JDK — the LZW variant
  * of the lossless-codec family next to [[PngDecode]] (Inflate) and
  * [[PpmDecode]] (none). Reference: GIF89a specification (CompuServe
  * 1990) §§17-24 + Appendix F (variable-code LZW).
  *
  * Scope (documented, like PngDecode's): the FIRST image of the stream,
  * full-frame only (left = top = 0, image dims = screen dims — what
  * every single-frame writer emits); both GIF87a and GIF89a signatures;
  * global or local color table; BOTH scan orders (sequential and the
  * 4-pass interlace); extension blocks skipped by the generic sub-block
  * walk. Everything else — sub-frame placement, zero color tables,
  * LZW code overflow, early stream end, index past the palette — → null.
  *
  * LZW per Appendix F: initial code width = minCodeSize+1; CLEAR resets
  * the table; codes grow the width at 2^width up to 12 bits; when the
  * table hits 4096 no more entries are added until a CLEAR (deferred
  * clear — decoding continues at width 12); the K-omega case
  * (code == next free slot) emits prev + first(prev). Bits are packed
  * LSB-first across the concatenated data sub-blocks.
  *
  * Output (width, height, gct_size, n_px, sum_r, sum_g, sum_b,
  * thumb_hex) — sums over the palette-expanded RGB channels and the same
  * defined 2×2 NN thumb as the other decoders.
  *
  * One fused map-only expression; payload bytes are read once where they
  * sit. A 64 MiB decoded-size cap bounds memory like PngDecode's.
  */
case class GifDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GifDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "gif_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gif_decode expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    GifDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.GifDecode.decode($v);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): GifDecode =
    copy(child = c)
}

object GifDecode {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("gct_size", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("thumb_hex", StringType, nullable = false)))

  /** Decoded-size cap: w·h beyond this is rejected, like PngDecode. */
  private val MaxPixels = 64 << 20

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  def decode(bytes: Array[Byte]): InternalRow = {
    if (bytes.length < 14) return null
    // signature: GIF87a or GIF89a
    if (bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F' ||
      bytes(3) != '8' || (bytes(4) != '7' && bytes(4) != '9') || bytes(5) != 'a')
      return null

    val sw = le16(bytes, 6)
    val sh = le16(bytes, 8)
    if (sw <= 0 || sh <= 0 || sw.toLong * sh > MaxPixels) return null
    val packed = u8(bytes, 10)
    val gctFlag = (packed & 0x80) != 0
    val gctSize = 1 << ((packed & 7) + 1)
    var off = 13
    var gctOff = -1
    if (gctFlag) {
      gctOff = off
      off += 3 * gctSize
      if (off > bytes.length) return null
    }

    // block walk to the first image descriptor
    var imgOff = -1
    while (imgOff < 0) {
      if (off >= bytes.length) return null
      u8(bytes, off) match {
        case 0x21 => // extension: introducer, label, sub-block chain
          off += 2
          var len = if (off < bytes.length) u8(bytes, off) else return null
          while (len != 0) {
            off += 1 + len
            if (off >= bytes.length) return null
            len = u8(bytes, off)
          }
          off += 1
        case 0x2c => imgOff = off
        case _ => return null // trailer before any image, or junk
      }
    }

    off = imgOff + 1
    if (off + 9 > bytes.length) return null
    val left = le16(bytes, off)
    val top = le16(bytes, off + 2)
    val iw = le16(bytes, off + 4)
    val ih = le16(bytes, off + 6)
    val ipacked = u8(bytes, off + 8)
    off += 9
    // full-frame first image only (documented scope)
    if (left != 0 || top != 0 || iw != sw || ih != sh) return null
    val interlaced = (ipacked & 0x40) != 0
    val lctFlag = (ipacked & 0x80) != 0
    var palOff = gctOff
    var palSize = gctSize
    if (lctFlag) {
      palSize = 1 << ((ipacked & 7) + 1)
      palOff = off
      off += 3 * palSize
      if (off > bytes.length) return null
    }
    if (palOff < 0) return null // no color table at all

    if (off >= bytes.length) return null
    val minCode = u8(bytes, off)
    off += 1
    // spec bound (Appendix F): indices are at most 8 bits, and a
    // 1-bit image still uses min code size 2 — so 2..8, strictly
    if (minCode < 2 || minCode > 8) return null

    // concatenate the data sub-blocks
    val data = new java.io.ByteArrayOutputStream(bytes.length - off)
    var len = if (off < bytes.length) u8(bytes, off) else return null
    while (len != 0) {
      if (off + 1 + len > bytes.length) return null
      data.write(bytes, off + 1, len)
      off += 1 + len
      if (off >= bytes.length) return null
      len = u8(bytes, off)
    }
    val lzw = data.toByteArray

    val px = lzwDecode(lzw, minCode, iw * ih)
    if (px == null) return null

    // deinterlace: passes write rows 0,8,.. / 4,12,.. / 2,6,.. / 1,3,..
    val rows =
      if (!interlaced) px
      else {
        val out = new Array[Byte](px.length)
        var src = 0
        val passes = Array((0, 8), (4, 8), (2, 4), (1, 2))
        var p = 0
        while (p < 4) {
          var y = passes(p)._1
          while (y < ih) {
            System.arraycopy(px, src * iw, out, y * iw, iw)
            src += 1
            y += passes(p)._2
          }
          p += 1
        }
        out
      }

    // palette-expanded sums; an index past the table is an error
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    val n = iw * ih
    while (i < n) {
      val idx = rows(i) & 0xff
      if (idx >= palSize) return null
      val e = palOff + 3 * idx
      sr += u8(bytes, e); sg += u8(bytes, e + 1); sb += u8(bytes, e + 2)
      i += 1
    }

    val sbuf = new java.lang.StringBuilder(24)
    var ty = 0
    while (ty < 2) {
      var tx = 0
      while (tx < 2) {
        val idx = rows(((ty * ih) / 2) * iw + (tx * iw) / 2) & 0xff
        val e = palOff + 3 * idx
        hex2(sbuf, u8(bytes, e)); hex2(sbuf, u8(bytes, e + 1)); hex2(sbuf, u8(bytes, e + 2))
        tx += 1
      }
      ty += 1
    }

    new GenericInternalRow(Array[Any](
      iw, ih, if (gctFlag) gctSize else 0, n.toLong, sr, sg, sb,
      UTF8String.fromString(sbuf.toString)))
  }

  private def hex2(sb: java.lang.StringBuilder, v: Int): Unit = {
    val hx = "0123456789abcdef"
    sb.append(hx.charAt((v >> 4) & 15)).append(hx.charAt(v & 15))
  }

  /** GIF variable-code LZW (Appendix F). Returns exactly `need` index
    * bytes, or null on any malformed stream (bad code, early end,
    * too-few pixels).
    */
  private def lzwDecode(data: Array[Byte], minCode: Int, need: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](need)
    var outPos = 0

    var next = eoi + 1
    var width = minCode + 1
    var prev = -1
    var firstOfPrev = 0

    var bitBuf = 0
    var bitCnt = 0
    var pos = 0

    while (outPos < need) {
      // fill bits
      while (bitCnt < width) {
        if (pos >= data.length) return null // early end
        bitBuf |= (data(pos) & 0xff) << bitCnt
        bitCnt += 8
        pos += 1
      }
      val code = bitBuf & ((1 << width) - 1)
      bitBuf >>>= width
      bitCnt -= width

      if (code == clear) {
        next = eoi + 1
        width = minCode + 1
        prev = -1
      } else if (code == eoi) {
        return null // EOI before the frame filled
      } else {
        var sp = 0
        var cur = code
        if (code >= next) {
          // K-omega: only code == next is legal, and only with a prev
          if (code != next || prev < 0) return null
          stack(sp) = firstOfPrev.toByte; sp += 1
          cur = prev
        }
        while (cur >= clear) { // roots are < clear; eoi/clear never stored
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
        }
        val first = cur
        stack(sp) = first.toByte; sp += 1

        if (outPos + sp > need) return null // frame overrun
        while (sp > 0) {
          sp -= 1
          out(outPos) = stack(sp); outPos += 1
        }

        if (prev >= 0 && next < 4096) {
          prefix(next) = prev
          suffix(next) = first.toByte
          next += 1
          // grow the code width when the table reaches it (deferred at 12)
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
        firstOfPrev = first
      }
    }
    out
  }

  def apply(bytes: Column): Column =
    ColumnBridge.toColumn(GifDecode(ColumnBridge.toExpression(bytes)))
}
