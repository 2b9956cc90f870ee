package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL baseline-TIFF pixel decode, from scratch (TIFF 6.0 §§2-8, the
  * scanner/archival format a crawled corpus carries alongside
  * PNG/GIF/BMP): the tag-directory container whose traps are
  * STRUCTURAL rather than entropy-coded —
  *
  *   - BOTH byte orders are legal (`II` little, `MM` big — the JDK's
  *     own writer emits MM) and infect every u16/u32 in the file
  *     including inline tag values, which are LEFT-JUSTIFIED in their
  *     4-byte field;
  *   - tag values live INLINE when they fit in 4 bytes and behind an
  *     offset when they don't — a reader that always dereferences
  *     breaks on every small file;
  *   - pixel data is split across STRIPS (RowsPerStrip), each
  *     independently compressed — strip boundaries never share
  *     compressor state, and a decoder that runs one stream across
  *     strips desyncs;
  *   - PhotometricInterpretation 0 means WHITE-IS-ZERO: gray samples
  *     INVERT (255−v) — skipping the invert passes geometry and
  *     corrupts every statistic.
  *
  * Scope (the baseline-TIFF surface, strict): IFD0 only; 8-bit
  * samples; SamplesPerPixel 1 (gray, photometric 0/1, and palette,
  * photometric 3 with a 3×256 SHORT ColorMap — entries scale down
  * `v >> 8`, the display convention) or 3 (RGB, photometric 2);
  * compression 1 (none), 5 (TIFF LZW: MSB-first variable codes with
  * the EARLY-CHANGE width bump at table size 2^w−1, Clear 256 / EOI
  * 257), 8 or 32946 (zlib Deflate via the JDK Inflater — both tag
  * values are spec'd, new and old), 32773 (PackBits); horizontal
  * predictor (tag 317, value 2) with LZW/Deflate — per-row per-channel
  * cumulative byte sums. Strict decode: every strip must decompress to
  * EXACTLY rows·w·spp bytes (LZW additionally must then terminate with
  * EOI); short/overlong data, codes past the table, strip-count
  * mismatches, tiles (tags 322+), planar configuration 2, FillOrder 2,
  * a non-default Orientation, ExtraSamples, non-unsigned SampleFormat,
  * or any out-of-scope parameter → null, never a fabricated pixel.
  *
  * Output (width, height, n_px, sum_r, sum_g, sum_b, thumb_hex) — the
  * shared decoder convention; `decodeRaster` exposes the expanded
  * interleaved-RGB seam ([[JpegDecode.Raster]]) for [[ImageDHash]] and
  * the positional-feature consumers. One fused map-only codegen
  * expression; 64 MiB expansion budget.
  */
case class TiffDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TiffDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "tiff_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"tiff_decode expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TiffDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.TiffDecode.decode($v);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): TiffDecode =
    copy(child = c)
}

object TiffDecode {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("thumb_hex", StringType, nullable = false)))

  /** The PNG seam's expansion budget: sample plane + RGB expansion. */
  private val MaxBytes = 64 << 20

  // ---- byte-order-aware primitive reads --------------------------------

  private def u16(b: Array[Byte], i: Int, le: Boolean): Int =
    if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def u32(b: Array[Byte], i: Int, le: Boolean): Long =
    if (le) (u16(b, i, le) & 0xffffL) | ((u16(b, i + 2, le) & 0xffffL) << 16)
    else ((u16(b, i, le) & 0xffffL) << 16) | (u16(b, i + 2, le) & 0xffffL)

  // ---- parsed layout: the shared front-end behind decode/decodeRaster --

  /** `samples` is the decompressed top-down sample plane (w·h·spp
    * bytes, predictor already applied); `cmap` the 3·256 SHORT palette
    * (photometric 3) else null.
    */
  private final class Tif(
      val w: Int, val h: Int, val photometric: Int, val spp: Int,
      val samples: Array[Byte], val cmap: Array[Int])

  /** One IFD entry's values as longs (BYTE/SHORT/LONG), inline or
    * dereferenced; null on malformed layout or out-of-scope type.
    */
  private def entryValues(
      b: Array[Byte], entry: Int, le: Boolean, maxCount: Int): Array[Long] = {
    val typ = u16(b, entry + 2, le)
    val count = u32(b, entry + 4, le)
    val size = typ match {
      case 1 => 1 // BYTE
      case 3 => 2 // SHORT
      case 4 => 4 // LONG
      case _ => return null
    }
    if (count < 1 || count > maxCount) return null
    val n = count.toInt
    val total = n * size
    val base =
      if (total <= 4) entry + 8 // inline, left-justified
      else {
        val off = u32(b, entry + 8, le)
        if (off + total > b.length) return null
        off.toInt
      }
    if (base + total > b.length) return null
    val out = new Array[Long](n)
    var k = 0
    while (k < n) {
      out(k) = size match {
        case 1 => (b(base + k) & 0xff).toLong
        case 2 => u16(b, base + 2 * k, le).toLong
        case 4 => u32(b, base + 4 * k, le)
      }
      k += 1
    }
    out
  }

  private def parse(bytes: Array[Byte]): Tif = {
    if (bytes.length < 8) return null
    val le =
      if (bytes(0) == 'I' && bytes(1) == 'I') true
      else if (bytes(0) == 'M' && bytes(1) == 'M') false
      else return null
    if (u16(bytes, 2, le) != 42) return null
    val ifdOff = u32(bytes, 4, le)
    if (ifdOff < 8 || ifdOff + 2 > bytes.length) return null
    val ifd = ifdOff.toInt
    val nEntries = u16(bytes, ifd, le)
    if (nEntries < 1 || ifd + 2 + 12 * nEntries > bytes.length) return null

    var w = -1; var h = -1
    var compression = 1; var photometric = -1; var spp = 1
    var rowsPerStrip = -1L
    var predictor = 1
    var bitsOk = true
    var stripOffsets: Array[Long] = null
    var stripCounts: Array[Long] = null
    var cmapRaw: Array[Long] = null
    var e = 0
    while (e < nEntries) {
      val at = ifd + 2 + 12 * e
      val tag = u16(bytes, at, le)
      tag match {
        case 256 => val v = entryValues(bytes, at, le, 1); if (v == null) return null
          w = v(0).toInt
        case 257 => val v = entryValues(bytes, at, le, 1); if (v == null) return null
          h = v(0).toInt
        case 258 => val v = entryValues(bytes, at, le, 8); if (v == null) return null
          bitsOk = v.forall(_ == 8L)
        case 259 => val v = entryValues(bytes, at, le, 1); if (v == null) return null
          compression = v(0).toInt
        case 262 => val v = entryValues(bytes, at, le, 1); if (v == null) return null
          photometric = v(0).toInt
        case 266 => val v = entryValues(bytes, at, le, 1); if (v == null) return null
          if (v(0) != 1L) return null // FillOrder 2 (bit-reversed) out of scope
        case 273 => stripOffsets = entryValues(bytes, at, le, 1 << 20)
          if (stripOffsets == null) return null
        case 274 => val v = entryValues(bytes, at, le, 1); if (v == null) return null
          if (v(0) != 1L) return null // non-default orientation out of scope
        case 277 => val v = entryValues(bytes, at, le, 1); if (v == null) return null
          spp = v(0).toInt
        case 278 => val v = entryValues(bytes, at, le, 1); if (v == null) return null
          rowsPerStrip = v(0)
        case 279 => stripCounts = entryValues(bytes, at, le, 1 << 20)
          if (stripCounts == null) return null
        case 284 => val v = entryValues(bytes, at, le, 1); if (v == null) return null
          if (v(0) != 1L) return null // planar (separated) out of scope
        case 317 => val v = entryValues(bytes, at, le, 1); if (v == null) return null
          predictor = v(0).toInt
        case 320 => cmapRaw = entryValues(bytes, at, le, 3 * 256)
          if (cmapRaw == null) return null
        case 322 | 323 | 324 | 325 => return null // tiled layout out of scope
        case 338 => return null // ExtraSamples (alpha) out of scope
        case 339 => val v = entryValues(bytes, at, le, 8); if (v == null) return null
          if (!v.forall(_ == 1L)) return null // only unsigned-int samples
        case _ => () // unknown tags are ignorable by the baseline contract
      }
      e += 1
    }

    // ---- structural validation
    if (w < 1 || h < 1 || !bitsOk) return null
    if (photometric < 0 || photometric > 3) return null
    if (photometric == 2) { if (spp != 3) return null }
    else if (spp != 1) return null
    var cmap: Array[Int] = null
    if (photometric == 3) {
      if (cmapRaw == null || cmapRaw.length != 3 * 256) return null
      cmap = new Array[Int](3 * 256)
      var k = 0
      while (k < cmap.length) {
        if (cmapRaw(k) > 0xffffL) return null
        cmap(k) = cmapRaw(k).toInt
        k += 1
      }
    } else if (cmapRaw != null) return null // a palette on a non-palette photometric
    if (compression != 1 && compression != 5 && compression != 8 &&
      compression != 32946 && compression != 32773) return null
    if (predictor != 1 && predictor != 2) return null
    if (predictor == 2 && compression != 5 && compression != 8 && compression != 32946)
      return null // predictor rides the LZW/Deflate section of the spec
    val planeBytes = 1L * w * h * spp
    if (planeBytes > MaxBytes || 3L * w * h > MaxBytes) return null
    if (rowsPerStrip == -1L) rowsPerStrip = h.toLong // default: one strip
    if (rowsPerStrip < 1L) return null
    // writers spell "all rows in one strip" as 0xFFFFFFFF — clamp before
    // the narrowing below
    if (rowsPerStrip > h) rowsPerStrip = h.toLong
    val nStrips = ((h + rowsPerStrip - 1) / rowsPerStrip).toInt
    if (stripOffsets == null || stripCounts == null) return null
    if (stripOffsets.length != nStrips || stripCounts.length != nStrips) return null

    // ---- strip decompression into the sample plane
    val rps = rowsPerStrip.toInt
    val samples = new Array[Byte](planeBytes.toInt)
    val rowBytes = w * spp
    var s = 0
    while (s < nStrips) {
      val rows = math.min(rps, h - s * rps)
      val expected = rows * rowBytes
      val off = stripOffsets(s)
      val len = stripCounts(s)
      if (off < 0 || len < 0 || off + len > bytes.length) return null
      val dst = s * rps * rowBytes
      val ok = compression match {
        case 1 =>
          len == expected && { System.arraycopy(bytes, off.toInt, samples, dst, expected); true }
        case 32773 => packBits(bytes, off.toInt, len.toInt, samples, dst, expected)
        case 5 => lzw(bytes, off.toInt, len.toInt, samples, dst, expected)
        case _ => inflate(bytes, off.toInt, len.toInt, samples, dst, expected)
      }
      if (!ok) return null
      s += 1
    }

    // ---- horizontal predictor: per-row per-channel cumulative sums
    if (predictor == 2) {
      var y = 0
      while (y < h) {
        val row = y * rowBytes
        var i = spp
        while (i < rowBytes) {
          samples(row + i) = (samples(row + i) + samples(row + i - spp)).toByte
          i += 1
        }
        y += 1
      }
    }
    new Tif(w, h, photometric, spp, samples, cmap)
  }

  /** PackBits (TIFF 6.0 §9): must produce EXACTLY `expected` bytes. */
  private def packBits(
      src: Array[Byte], off: Int, len: Int, dst: Array[Byte], dstOff: Int,
      expected: Int): Boolean = {
    var i = off
    val end = off + len
    var o = dstOff
    val dstEnd = dstOff + expected
    while (o < dstEnd) {
      if (i >= end) return false
      val n = src(i); i += 1
      if (n >= 0) { // n+1 literal bytes
        val cnt = n + 1
        if (i + cnt > end || o + cnt > dstEnd) return false
        System.arraycopy(src, i, dst, o, cnt)
        i += cnt; o += cnt
      } else if (n != -128) { // next byte repeats 1-n times
        val cnt = 1 - n
        if (i >= end || o + cnt > dstEnd) return false
        java.util.Arrays.fill(dst, o, o + cnt, src(i))
        i += 1; o += cnt
      } // -128: no-op
    }
    // trailing no-ops are legal; trailing DATA is not
    while (i < end) { if (src(i) != -128) return false; i += 1 }
    true
  }

  /** TIFF LZW (TIFF 6.0 §13): MSB-first variable-width codes, Clear 256,
    * EOI 257, EARLY width change (bump at table size 2^w−1). Must
    * produce exactly `expected` bytes and then read EOI.
    */
  private def lzw(
      src: Array[Byte], off: Int, len: Int, dst: Array[Byte], dstOff: Int,
      expected: Int): Boolean = {
    val Clear = 256; val Eoi = 257
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = 258
    var width = 9
    var bitPos = 0L
    val bitEnd = len.toLong * 8
    def read(): Int = {
      if (bitPos + width > bitEnd) return -1
      var v = 0
      var k = 0
      while (k < width) {
        val byteI = off + (bitPos >>> 3).toInt
        val bit = 7 - (bitPos & 7L).toInt
        v = (v << 1) | ((src(byteI) >> bit) & 1)
        bitPos += 1; k += 1
      }
      v
    }
    var o = dstOff
    val dstEnd = dstOff + expected
    var prev = -1
    // first-byte cache per code chain: emit by walking the chain backward
    val stack = new Array[Byte](4097)
    def emit(code: Int): Int = { // returns first byte, or -1 on overflow
      var sp = 0
      var c = code
      while (c >= 258) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      stack(sp) = c.toByte; sp += 1
      if (o + sp > dstEnd) return -1
      var k = sp - 1
      while (k >= 0) { dst(o) = stack(k); o += 1; k -= 1 }
      c // first byte of the chain
    }
    while (true) {
      val code = read()
      if (code < 0) return false // ran out of bits before EOI
      if (code == Eoi) return o == dstEnd
      if (code == Clear) {
        next = 258; width = 9; prev = -1
      } else if (prev == -1) {
        if (code >= 256) return false // first code after clear must be a literal
        if (o >= dstEnd) return false
        dst(o) = code.toByte; o += 1
        prev = code
      } else {
        var first = 0
        if (code < next && code != Clear && code != Eoi) {
          first = emit(code)
          if (first < 0) return false
        } else if (code == next) { // the KwKwK case
          // chain = prev's chain + its first byte
          var c = prev
          while (c >= 258) c = prefix(c)
          val f = c
          // emit prev then f
          if (emit(prev) < 0) return false
          if (o >= dstEnd) return false
          dst(o) = f.toByte; o += 1
          first = f
        } else return false // code past the table
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first.toByte
          next += 1
        }
        prev = code
        // EARLY change: width bumps when the NEXT index to assign
        // reaches 2^width − 1 (the convention every mainstream writer
        // uses; TIFF 6.0 p.61)
        if (next == (1 << width) - 1 && width < 12) width += 1
      }
    }
    false // unreachable
  }

  // per-thread Inflater, reset between strips (the PngDecode convention)
  private val inflaters = new ThreadLocal[java.util.zip.Inflater] {
    override def initialValue(): java.util.zip.Inflater = new java.util.zip.Inflater()
  }

  /** zlib Deflate strip (compression 8 new / 32946 old): must produce
    * exactly `expected` bytes.
    */
  private def inflate(
      src: Array[Byte], off: Int, len: Int, dst: Array[Byte], dstOff: Int,
      expected: Int): Boolean = {
    val inf = inflaters.get()
    inf.reset()
    inf.setInput(src, off, len)
    try {
      var produced = 0
      while (produced < expected) {
        val n = inf.inflate(dst, dstOff + produced, expected - produced)
        if (n == 0) {
          if (inf.finished() || inf.needsDictionary() || inf.needsInput()) return false
        }
        produced += n
      }
      // a stream that keeps producing past the plane is malformed
      val probe = new Array[Byte](1)
      if (!inf.finished() && inf.inflate(probe, 0, 1) > 0) return false
      true
    } catch {
      case _: java.util.zip.DataFormatException => false
    }
  }

  // ---- the two public folds -------------------------------------------

  private def sampleRgb(t: Tif, i: Int): Int = { // packed 0xRRGGBB of pixel i
    if (t.photometric == 2) {
      val o = 3 * i
      ((t.samples(o) & 0xff) << 16) | ((t.samples(o + 1) & 0xff) << 8) | (t.samples(o + 2) & 0xff)
    } else if (t.photometric == 3) {
      val v = t.samples(i) & 0xff
      ((t.cmap(v) >> 8) << 16) | ((t.cmap(256 + v) >> 8) << 8) | (t.cmap(512 + v) >> 8)
    } else {
      val v0 = t.samples(i) & 0xff
      val g = if (t.photometric == 0) 255 - v0 else v0
      (g << 16) | (g << 8) | g
    }
  }

  def decode(bytes: Array[Byte]): InternalRow = {
    val t = parse(bytes)
    if (t == null) return null
    val n = t.w * t.h
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < n) {
      val p = sampleRgb(t, i)
      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      i += 1
    }
    val thumb = new java.lang.StringBuilder(24)
    var ty = 0
    while (ty < 2) {
      var tx = 0
      while (tx < 2) {
        val pi = ((ty * t.h) / 2) * t.w + (tx * t.w) / 2
        val p = sampleRgb(t, pi)
        thumb.append(f"${(p >> 16) & 0xff}%02x${(p >> 8) & 0xff}%02x${p & 0xff}%02x")
        tx += 1
      }
      ty += 1
    }
    new GenericInternalRow(Array[Any](
      t.w, t.h, n.toLong, sr, sg, sb, UTF8String.fromString(thumb.toString)))
  }

  /** Expanded interleaved-RGB raster, top-down — the [[JpegDecode.Raster]]
    * seam for [[ImageDHash]] and positional-feature consumers. Same
    * strict scope and budget as [[decode]].
    */
  def decodeRaster(bytes: Array[Byte]): JpegDecode.Raster = {
    val t = parse(bytes)
    if (t == null) return null
    if (t.photometric == 2) return new JpegDecode.Raster(t.w, t.h, 3, t.samples)
    val n = t.w * t.h
    val rgb = new Array[Byte](3 * n)
    var i = 0
    while (i < n) {
      val p = sampleRgb(t, i)
      rgb(3 * i) = ((p >> 16) & 0xff).toByte
      rgb(3 * i + 1) = ((p >> 8) & 0xff).toByte
      rgb(3 * i + 2) = (p & 0xff).toByte
      i += 1
    }
    new JpegDecode.Raster(t.w, t.h, 3, rgb)
  }

  def apply(bytes: Column): Column =
    ColumnBridge.toColumn(TiffDecode(ColumnBridge.toExpression(bytes)))
}
