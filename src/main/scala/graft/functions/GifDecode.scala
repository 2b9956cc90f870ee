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
  * ANIMATIONS (multi-frame compositing, sub-frame placement, GCE
  * transparency, disposal) are the sibling operator [[GifFrames]] /
  * [[GifDecode.decodeFrames]] — this expression stays the cheap
  * single-frame form.
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

  /** First-image INDEX raster (row-major, deinterlaced) plus the
    * palette window — the shared front-end behind the statistics fold
    * ([[decode]]) and the expanded-RGB seam ([[decodeRaster]]).
    */
  private final class Indexed(
      val rows: Array[Byte], val w: Int, val h: Int,
      val palOff: Int, val palSize: Int, val gctSize: Int)

  /** Expanded interleaved-RGB raster (the [[JpegDecode.Raster]] shape):
    * the first image's indices through its active color table — the
    * seam that lets raster consumers ([[ImageDHash]], positional
    * features) run over GIF payloads. An index past the table nulls,
    * like the statistics fold; same strict scope (full-frame first
    * image, both interlace orders). The EXPANSION carries the PNG
    * seam's 64 MiB byte budget: LZW can inflate a few-KB hostile
    * stream to MaxPixels, and the raster consumers should not pay 3×
    * that in RGB bytes — the statistics fold (which never expands)
    * still accepts those images.
    */
  def decodeRaster(bytes: Array[Byte]): JpegDecode.Raster = {
    val d = decodeIndexed(bytes)
    if (d == null) return null
    val n = d.w * d.h
    if (3L * n > (64 << 20)) return null
    val out = new Array[Byte](3 * n)
    var i = 0
    while (i < n) {
      val idx = d.rows(i) & 0xff
      if (idx >= d.palSize) return null
      val e = d.palOff + 3 * idx
      out(3 * i) = bytes(e); out(3 * i + 1) = bytes(e + 1); out(3 * i + 2) = bytes(e + 2)
      i += 1
    }
    new JpegDecode.Raster(d.w, d.h, 3, out)
  }

  def decode(bytes: Array[Byte]): InternalRow = {
    val d = decodeIndexed(bytes)
    if (d == null) return null
    val rows = d.rows
    val iw = d.w; val ih = d.h
    val palOff = d.palOff; val palSize = d.palSize

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
      iw, ih, d.gctSize, n.toLong, sr, sg, sb,
      UTF8String.fromString(sbuf.toString)))
  }

  private def decodeIndexed(bytes: Array[Byte]): Indexed = {
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

    val collected = collectSubBlocks(bytes, off)
    if (collected == null) return null
    val lzw = collected._1

    val px = lzwDecode(lzw, minCode, iw * ih)
    if (px == null) return null

    val rows = if (!interlaced) px else deinterlace(px, iw, ih)
    new Indexed(rows, iw, ih, palOff, palSize, if (gctFlag) gctSize else 0)
  }

  private def hex2(sb: java.lang.StringBuilder, v: Int): Unit = {
    val hx = "0123456789abcdef"
    sb.append(hx.charAt((v >> 4) & 15)).append(hx.charAt(v & 15))
  }

  /** Concatenated data sub-blocks starting at `off`; null on truncation.
    * Second element is the offset PAST the 0-terminator.
    */
  private def collectSubBlocks(bytes: Array[Byte], off0: Int): (Array[Byte], Int) = {
    var off = off0
    if (off >= bytes.length) return null
    val data = new java.io.ByteArrayOutputStream(256)
    var len = u8(bytes, off)
    while (len != 0) {
      if (off + 1 + len > bytes.length) return null
      data.write(bytes, off + 1, len)
      off += 1 + len
      if (off >= bytes.length) return null
      len = u8(bytes, off)
    }
    (data.toByteArray, off + 1)
  }

  /** Adam-style GIF 4-pass deinterlace: passes write rows 0,8,.. /
    * 4,12,.. / 2,6,.. / 1,3,..
    */
  private def deinterlace(px: Array[Byte], iw: Int, ih: Int): Array[Byte] = {
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

  // --------------------------------------------------------------------
  // ANIMATED GIF: the multi-frame walk behind [[GifFrames]]
  // --------------------------------------------------------------------

  val framesSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("n_sampled", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("thumb_hex", StringType, nullable = false)))

  /** Frame-count cap: a hostile stream of tiny frames makes the
    * per-sampled-frame canvas fold quadratic; 1024 frames is far above
    * any real animation and bounds the walk.
    */
  private val MaxFrames = 1024

  /** CPU cap on the sampled-canvas folds (ADVICE r17): MaxFrames bounds
    * the frame COUNT but each sampled frame folds the whole canvas, so a
    * few-KB stream of 1×1 frames on a huge screen could otherwise force
    * ~MaxFrames·MaxPixels ≈ 3·10^10 additions per row. The cumulative
    * fold work (Σ canvas pixels over sampled frames) is capped at 2^30 —
    * a 4K canvas still gets ~128 sampled frames, far above thumbnail
    * reality, while the hostile amplification is refused as null.
    */
  private val MaxFoldWork = 1L << 30

  /** Animated decode with frame sampling (the video-pipeline shape of
    * [[graft.functions.Y4mSample]]): frames COMPOSITE onto the logical
    * screen in order — sub-frame placement (left/top/iw/ih inside the
    * screen), per-frame local palettes, interlace, GCE transparency
    * (transparent pixels leave the canvas unchanged) and ALL disposal
    * methods honored: 0/1 (leave), 2 (restore rect to the background
    * color), 3 (restore-to-previous — the frame's rect is snapshotted
    * before drawing and written back before the next frame composites;
    * ONE bounded Int array, allocated only when a frame declares it).
    * Every `every`-th composited frame (0, every, 2·every, …)
    * contributes exact palette-expanded channel sums over the WHOLE
    * canvas; the thumb is the defined 2×2 NN sample of the LAST sampled
    * canvas. The canvas starts as the header's background color (black
    * when the background index is missing or out of table).
    */
  def decodeFrames(bytes: Array[Byte], every: Int): InternalRow =
    decodeFrames(bytes, every, null)

  /** Animated decode with an optional streaming [[FrameSink]] tap
    * (per-frame signature consumers see each SAMPLED composited canvas);
    * `sink` null-safe — the stats fold is byte-identical without it.
    */
  private[graft] def decodeFrames(
      bytes: Array[Byte], every: Int, sink: FrameSink): InternalRow = {
    if (bytes.length < 14) return null
    if (bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F' ||
      bytes(3) != '8' || (bytes(4) != '7' && bytes(4) != '9') || bytes(5) != 'a')
      return null
    val sw = le16(bytes, 6)
    val sh = le16(bytes, 8)
    if (sw <= 0 || sh <= 0 || sw.toLong * sh > MaxPixels) return null
    val packed = u8(bytes, 10)
    val gctFlag = (packed & 0x80) != 0
    val gctSize = 1 << ((packed & 7) + 1)
    val bgIndex = u8(bytes, 11)
    var off = 13
    var gctOff = -1
    if (gctFlag) {
      gctOff = off
      off += 3 * gctSize
      if (off > bytes.length) return null
    }
    val n = sw * sh
    val canvas = new Array[Int](n) // packed 0xRRGGBB
    val bg =
      if (gctFlag && bgIndex < gctSize) {
        val e = gctOff + 3 * bgIndex
        (u8(bytes, e) << 16) | (u8(bytes, e + 1) << 8) | u8(bytes, e + 2)
      } else 0
    java.util.Arrays.fill(canvas, bg)

    var nFrames = 0L
    var nSampled = 0L
    var foldWork = 0L // Σ canvas pixels over sampled folds (MaxFoldWork)
    var sr = 0L; var sg = 0L; var sb = 0L
    var thumb: String = null
    // pending graphic-control state (applies to the NEXT image)
    var transIndex = -1
    var disposal = 0
    // the PREVIOUS frame's disposal, applied before drawing the next
    var prevDisposal = 0
    var prevL = 0; var prevT = 0; var prevW = 0; var prevH = 0
    // disposal-3 support: the previous frame's rect as it looked BEFORE
    // that frame drew (row-major iw×ih slice of the canvas)
    var snapshot: Array[Int] = null

    while (true) {
      if (off >= bytes.length) return null
      u8(bytes, off) match {
        case 0x3b => // trailer
          if (nFrames == 0) return null
          return new GenericInternalRow(Array[Any](
            sw, sh, nFrames, nSampled, sr, sg, sb,
            UTF8String.fromString(if (thumb == null) "" else thumb)))
        case 0x21 => // extension
          if (off + 1 >= bytes.length) return null
          val label = u8(bytes, off + 1)
          off += 2
          if (label == 0xf9) { // graphic control: capture for next image
            if (off + 5 >= bytes.length) return null
            if (u8(bytes, off) != 4) return null
            val p = u8(bytes, off + 1)
            disposal = (p >> 2) & 7
            transIndex = if ((p & 1) != 0) u8(bytes, off + 4) else -1
            if (disposal > 3) return null
          }
          var len = if (off < bytes.length) u8(bytes, off) else return null
          while (len != 0) {
            off += 1 + len
            if (off >= bytes.length) return null
            len = u8(bytes, off)
          }
          off += 1
        case 0x2c => // image descriptor
          if (off + 10 > bytes.length) return null
          val left = le16(bytes, off + 1)
          val top = le16(bytes, off + 3)
          val iw = le16(bytes, off + 5)
          val ih = le16(bytes, off + 7)
          val ipacked = u8(bytes, off + 9)
          off += 10
          if (iw <= 0 || ih <= 0 || left + iw > sw || top + ih > sh) return null
          val interlacedF = (ipacked & 0x40) != 0
          val lctFlag = (ipacked & 0x80) != 0
          var palOff = gctOff
          var palSize = gctSize
          if (lctFlag) {
            palSize = 1 << ((ipacked & 7) + 1)
            palOff = off
            off += 3 * palSize
            if (off > bytes.length) return null
          }
          if (palOff < 0) return null
          if (!gctFlag && !lctFlag) return null
          if (off >= bytes.length) return null
          val minCode = u8(bytes, off)
          off += 1
          if (minCode < 2 || minCode > 8) return null
          val collected = collectSubBlocks(bytes, off)
          if (collected == null) return null
          off = collected._2
          val px = lzwDecode(collected._1, minCode, iw * ih)
          if (px == null) return null
          val rows = if (!interlacedF) px else deinterlace(px, iw, ih)
          // previous frame's disposal, then draw this one
          if (prevDisposal == 2) {
            var y = prevT
            while (y < prevT + prevH) {
              java.util.Arrays.fill(canvas, y * sw + prevL, y * sw + prevL + prevW, bg)
              y += 1
            }
          } else if (prevDisposal == 3 && snapshot != null) {
            // restore-to-previous: write the pre-draw rect back
            var y = 0
            while (y < prevH) {
              System.arraycopy(snapshot, y * prevW, canvas, (prevT + y) * sw + prevL, prevW)
              y += 1
            }
          }
          if (disposal == 3) {
            // snapshot THIS frame's rect before it draws (only disposal-3
            // frames pay the copy; the array is reused when sizes match)
            if (snapshot == null || snapshot.length != iw * ih)
              snapshot = new Array[Int](iw * ih)
            var y = 0
            while (y < ih) {
              System.arraycopy(canvas, (top + y) * sw + left, snapshot, y * iw, iw)
              y += 1
            }
          }
          var y = 0
          while (y < ih) {
            var x = 0
            val rowBase = (top + y) * sw + left
            while (x < iw) {
              val idx = rows(y * iw + x) & 0xff
              // bound-check EVERY index — a transparent-index match must
              // not bypass the strict palette contract
              if (idx >= palSize) return null
              if (idx != transIndex) {
                val e = palOff + 3 * idx
                canvas(rowBase + x) =
                  (u8(bytes, e) << 16) | (u8(bytes, e + 1) << 8) | u8(bytes, e + 2)
              }
              x += 1
            }
            y += 1
          }
          if (nFrames % every == 0) {
            foldWork += n
            if (foldWork > MaxFoldWork) return null // hostile amplification
            var i = 0
            while (i < n) {
              val v = canvas(i)
              sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
              i += 1
            }
            val sbuf = new java.lang.StringBuilder(24)
            var ty = 0
            while (ty < 2) {
              var tx = 0
              while (tx < 2) {
                val v = canvas(((ty * sh) / 2) * sw + (tx * sw) / 2)
                hex2(sbuf, (v >> 16) & 0xff)
                hex2(sbuf, (v >> 8) & 0xff)
                hex2(sbuf, v & 0xff)
                tx += 1
              }
              ty += 1
            }
            thumb = sbuf.toString
            nSampled += 1
            if (sink != null) sink.acceptCanvas(canvas, sw, sh)
          }
          nFrames += 1
          if (nFrames > MaxFrames) return null
          prevDisposal = disposal
          prevL = left; prevT = top; prevW = iw; prevH = ih
          disposal = 0
          transIndex = -1
        case _ => return null
      }
    }
    null // unreachable
  }
}

/** Frame-sampling decode over ANIMATED GIFs — see
  * [[GifDecode.decodeFrames]] for the compositing contract. Output
  * (width, height, n_frames, n_sampled, sum_r, sum_g, sum_b, thumb_hex):
  * exact palette-expanded channel sums over every `every`-th composited
  * canvas, thumb of the last sampled one.
  */
case class GifFrames(child: Expression, every: Int) extends UnaryExpression {

  override def dataType: DataType = GifDecode.framesSchema
  override def nullable: Boolean = true
  override def prettyName: String = "gif_frames"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gif_frames expects binary, got ${child.dataType.catalogString}")
    else if (every < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gif_frames sampling step must be >= 1, got $every")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    GifDecode.decodeFrames(input.asInstanceOf[Array[Byte]], every)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.GifDecode.decodeFrames($v, $every);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): GifFrames =
    copy(child = c)
}

object GifFrames {
  def apply(bytes: Column, every: Int): Column =
    ColumnBridge.toColumn(GifFrames(ColumnBridge.toExpression(bytes), every))
}
