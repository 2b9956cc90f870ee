package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL GIF encode (the write path) — the LZW COMPRESSOR twin of
  * [[GifDecode]], built from scratch on the core JDK. Input is binary P6
  * whose pixels are EXACT colors of the shared 256-entry gate palette
  * (entry j = ((j·7+13) mod 256, (j·11+5) mod 256, (j·3+77) mod 256) —
  * [[graft.pipeline.Multimodal.paletteEntry]]); since 7 is coprime to
  * 256 the red channel inverts to a unique index (j = (r−13)·7⁻¹ mod
  * 256), so the reverse lookup is exact arithmetic, NOT quantization —
  * a pixel whose g/b don't match the candidate entry → null (not a
  * palette image; the honest contract for a palette format).
  *
  * Output: minimal spec-conformant GIF89a — header, logical screen
  * descriptor, 256-entry global color table, one non-interlaced
  * full-frame image, variable-code LZW data (min code size 8), trailer.
  * Encoder-side LZW mirrors the decoder's table timeline: the encoder
  * runs one table-add AHEAD of the decoder, so the code width grows one
  * add LATE (`next > 1<<width`, the classic GIF-compress rule); a full
  * table (4096) emits CLEAR and resets.
  *
  * Composition contract (what the gate pins): GifDecode(GifEncode(p6))
  * reproduces the raster's exact statistics; GifDecodeSpec additionally
  * decodes this encoder's output with `javax.imageio` (an independent
  * LZW decoder) and asserts index equality, breaking own-decoder
  * circularity. The encoded BYTES are deterministic for a given input
  * (pure arithmetic — no library version dependence at all, unlike
  * PngEncode's Deflater) but the gate pins decode-of-encode fields, the
  * same division as q_multimodal_png_write.
  *
  * Anything that is not a complete maxval-255 P6 payload → null
  * ([[PpmDecode.parseHeader]], the one shared P6 parser).
  *
  * Map-only, codegen'd; the LZW dictionary is one int-keyed open
  * hash table per call, O(pixels) amortized.
  */
case class GifEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gif_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gif_encode expects binary (P6), got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    GifEncode.encode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (byte[]) graft.functions.GifEncode.encode($v);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): GifEncode =
    copy(child = c)
}

object GifEncode {

  // 7·183 = 1281 = 5·256 + 1 → 183 is 7⁻¹ mod 256
  private val Inv7 = 183

  /** Exact reverse palette lookup: index from the red channel, then
    * verify green/blue. −1 when the pixel is not a palette color.
    */
  private def indexOf(r: Int, g: Int, b: Int): Int = {
    val j = (((r - 13) * Inv7) % 256 + 256) % 256
    if ((j * 11 + 5) % 256 == g && (j * 3 + 77) % 256 == b) j else -1
  }

  def encode(p6: Array[Byte]): Array[Byte] = {
    val hdr = PpmDecode.parseHeader(p6)
    if (hdr == null) return null
    val w = hdr.w
    val h = hdr.h
    val off = hdr.base
    if (w <= 0 || h <= 0 || w > 0xffff || h > 0xffff) return null
    val n = w * h
    if (off + 3L * n > p6.length) return null

    // reverse-map the raster to palette indices (exact, or null)
    val idx = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val p = off + 3 * i
      val j = indexOf(p6(p) & 0xff, p6(p + 1) & 0xff, p6(p + 2) & 0xff)
      if (j < 0) return null
      idx(i) = j.toByte
      i += 1
    }

    val out = new java.io.ByteArrayOutputStream(64 + 768 + n / 2)
    // header + logical screen descriptor
    out.write('G'); out.write('I'); out.write('F')
    out.write('8'); out.write('9'); out.write('a')
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0xf7) // GCT present, 8-bit color resolution, size 2^8
    out.write(0)    // background index
    out.write(0)    // aspect
    var j = 0
    while (j < 256) {
      out.write((j * 7 + 13) % 256)
      out.write((j * 11 + 5) % 256)
      out.write((j * 3 + 77) % 256)
      j += 1
    }
    // image descriptor: full frame, non-interlaced, no LCT
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0)
    out.write(8) // LZW min code size
    lzwEncode(idx, out)
    out.write(0)    // sub-block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF variable-code LZW compress (min code size fixed at 8). The
    * dictionary maps (prefixCode << 8 | byte) → code through an open
    * hash table sized for 4096 entries.
    */
  private def lzwEncode(data: Array[Byte], out: java.io.ByteArrayOutputStream): Unit = {
    val minCode = 8
    val clear = 1 << minCode
    val eoi = clear + 1

    val Cap = 1 << 13 // 8192 slots for ≤ 4096−258 chained entries
    val keys = new Array[Int](Cap)
    val vals = new Array[Int](Cap)
    java.util.Arrays.fill(keys, -1)
    val mask = Cap - 1

    // sub-block buffered bit writer, LSB-first
    val block = new Array[Byte](255)
    var blockLen = 0
    var bitBuf = 0L
    var bitCnt = 0
    var width = minCode + 1
    var next = eoi + 1

    def flushBlock(): Unit = {
      if (blockLen > 0) {
        out.write(blockLen)
        out.write(block, 0, blockLen)
        blockLen = 0
      }
    }
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        block(blockLen) = (bitBuf & 0xff).toByte
        blockLen += 1
        if (blockLen == 255) flushBlock()
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    def reset(): Unit = {
      java.util.Arrays.fill(keys, -1)
      next = eoi + 1
      width = minCode + 1
    }
    def put(key: Int, code: Int): Unit = {
      var s = ((key * 0x9e3779b1) >>> 19) & mask
      while (keys(s) >= 0) s = (s + 1) & mask
      keys(s) = key; vals(s) = code
    }
    def get(key: Int): Int = {
      var s = ((key * 0x9e3779b1) >>> 19) & mask
      while (keys(s) >= 0) {
        if (keys(s) == key) return vals(s)
        s = (s + 1) & mask
      }
      -1
    }
    def flushAll(): Unit = {
      while (bitCnt > 0) {
        block(blockLen) = (bitBuf & 0xff).toByte
        blockLen += 1
        if (blockLen == 255) flushBlock()
        bitBuf >>>= 8
        bitCnt = math.max(bitCnt - 8, 0)
      }
      flushBlock()
    }

    emit(clear)
    if (data.length == 0) { emit(eoi); flushAll(); return }

    var cur = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val k = data(i) & 0xff
      val key = (cur << 8) | k
      val hit = get(key)
      if (hit >= 0) cur = hit
      else {
        emit(cur)
        if (next == 4096) {
          // table full: CLEAR and restart (the decoder resets in lockstep)
          emit(clear)
          reset()
        } else {
          put(key, next)
          next += 1
          // the encoder runs one add AHEAD of the decoder, so the width
          // grows one add late: next > 2^width (the classic rule)
          if (next > (1 << width) && width < 12) width += 1
        }
        cur = k
      }
      i += 1
    }
    emit(cur)
    emit(eoi)
    flushAll()
  }

  def apply(p6: Column): Column =
    ColumnBridge.toColumn(GifEncode(ColumnBridge.toExpression(p6)))
}
