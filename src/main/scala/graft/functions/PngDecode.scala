package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL pixel decode for PNG payloads — a from-scratch decoder on core
  * JDK primitives only (`java.util.zip.Inflater` for the zlib stream,
  * `java.util.zip.CRC32` for chunk checksums): signature check, chunk
  * walk, IHDR parse, IDAT concatenation + inflate, per-scanline unfilter
  * (None/Sub/Up/Average/Paeth — the five filters PNG defines), then the
  * same exact statistics as [[PpmDecode]]:
  *
  *   (width, height, color_type, n_px, sum_r, sum_g, sum_b, sum_a, thumb_hex)
  *
  *   - per-channel byte SUMS as exact longs, AFTER sample expansion:
  *     grayscale (types 0/4) contributes its gray byte to all three of
  *     r/g/b; palette (type 3) contributes the PLTE entry its index
  *     selects. `sum_a` is the exact alpha sum for types 4/6, the tRNS
  *     alpha sum (entries past the table default to 255, PNG spec 11.3.2)
  *     for type 3 when a tRNS chunk is present, and null otherwise;
  *   - `thumb_hex`: the defined 2×2 nearest-neighbor thumbnail over the
  *     EXPANDED RGB channels — thumb pixel (ty, tx) samples the source
  *     pixel at row (ty*height) div 2, col (tx*width) div 2 (integer
  *     div), 12 bytes hex-encoded; the grid [[PpmDecode]] pins and the
  *     DuckDB oracle reproduces positionally.
  *
  * PNG is LOSSLESS with spec-mandated decode output, so this is
  * hash-gatable exactly like the P6 path: the gate's generator encodes an
  * md5-derived raster through an INDEPENDENT encoder (`javax.imageio`),
  * this kernel decodes it with its own Inflater + unfilter, and the
  * oracle recomputes the raster statistics positionally from the same
  * document fields — the two implementations meet only at the raster
  * definition (for palette rows, raster = indices plus the deterministic
  * palette formula both sides share).
  *
  * Scope (anything else decodes to NULL, the header parsers' "unknown
  * format" convention): 8-bit samples for all five color types —
  * 0 (grayscale), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA) —
  * plus 16-bit samples for types 0/2/4/6 (the spec defines no 16-bit
  * palette). The statistics model stays at 8-bit scale at every depth:
  * 16-bit samples contribute their most-significant byte (see
  * [[stats]]); filters apply at the byte level with the full
  * bytes-per-pixel distance, per spec 9. Low bit depths (1/2/4) decode
  * to null; interlace methods 0 (none) and 1 (Adam7 — the
  * seven spec-defined passes are unfiltered independently and scattered
  * back to image positions); compression 0 / filter method 0
  * (the only values PNG defines). Chunk ordering is ENFORCED where the
  * spec defines it: IDAT chunks must be consecutive, PLTE must precede
  * IDAT (and appear exactly once for type 3, never for grayscale types),
  * tRNS sits between PLTE and IDAT, IEND must be the final byte of the
  * payload (trailing garbage rejects), and every chunk's CRC is
  * validated (a corrupt or truncated payload must not half-decode).
  * tRNS on types 0/2 is a transparency KEY, not an alpha table — keyed
  * transparency is out of this kernel's statistics model, so such
  * payloads decode to null (documented scope, not an oversight); tRNS
  * on 4/6 is forbidden by the spec and rejects.
  *
  * Map-only, codegen'd via a static kernel; the Inflater is reused
  * per-thread (reset between payloads) so the hot path allocates only
  * the output buffers.
  */
case class PngDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PngDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "png_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"png_decode expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    PngDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.PngDecode.decode($v);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): PngDecode =
    copy(child = c)
}

object PngDecode {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("color_type", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("sum_a", LongType, nullable = true),
    StructField("thumb_hex", StringType, nullable = false)))

  /** Raster byte budget: a decode allocates h·(1+w·bpp) bytes, and the
    * length fields are attacker-controlled on arbitrary payloads — cap
    * the decompressed size (64 MiB ≈ a 4096×4096 RGBA frame) so one
    * hostile header cannot claim gigabytes. Oversize decodes to null.
    */
  val MaxRasterBytes: Int = 64 << 20

  private val Signature = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  // per-thread Inflater: reset() between payloads, never end()ed — the
  // thread-local dies with the executor thread (Inflater natively frees
  // on finalization; one ~8 KB native buffer per task thread)
  private val inflaters = new ThreadLocal[java.util.zip.Inflater] {
    override def initialValue(): java.util.zip.Inflater = new java.util.zip.Inflater()
  }
  private val crcs = new ThreadLocal[java.util.zip.CRC32] {
    override def initialValue(): java.util.zip.CRC32 = new java.util.zip.CRC32()
  }

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** Samples per pixel for the five color types; -1 = unknown. */
  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // RGB
    case 3 => 1 // palette index
    case 4 => 2 // gray + alpha
    case 6 => 4 // RGBA
    case _ => -1
  }

  /** The unfiltered (and, for Adam7, deinterlaced) sample raster plus
    * the layout needed to walk it — the shared front-end behind both
    * the statistics fold ([[decode]]) and the expanded-RGB seam
    * ([[decodeRaster]]). Row `row`'s samples start at
    * `row*rowStride + firstOffset`.
    */
  private final class Decoded(
      val raw: Array[Byte], val w: Int, val h: Int, val colorType: Int,
      val ch: Int, val sw: Int, val rowStride: Int, val firstOffset: Int,
      val plteOff: Int, val palCount: Int, val trnsOff: Int, val trnsLen: Int)

  /** Null on anything that is not a complete, CRC-clean, spec-ordered
    * PNG within the documented scope (depths 8/16, all five color types
    * at 8, types 0/2/4/6 at 16, interlace 0/1).
    */
  def decode(bytes: Array[Byte]): InternalRow = {
    val d = decodeRaw(bytes)
    if (d == null) return null
    stats(bytes, d.raw, d.w, d.h, d.colorType, d.ch, d.sw,
      d.rowStride, d.firstOffset, d.plteOff, d.palCount, d.trnsOff, d.trnsLen)
  }

  /** Expanded interleaved-RGB raster at 8-bit scale (the
    * [[JpegDecode.Raster]] shape) — the seam that lets raster consumers
    * ([[ImageDHash]], positional features) run over PNG payloads: gray
    * and gray+alpha replicate the gray sample, palette indices expand
    * through PLTE (an out-of-table index nulls, like the statistics
    * fold), 16-bit samples reduce to their MOST-SIGNIFICANT byte (the
    * msb reduction [[stats]] documents). Same strict null contract and
    * byte budget as [[decode]]; alpha does not premultiply (the
    * statistics model).
    */
  def decodeRaster(bytes: Array[Byte]): JpegDecode.Raster = {
    val d = decodeRaw(bytes)
    if (d == null) return null
    if (3L * d.w * d.h > MaxRasterBytes) return null
    val out = new Array[Byte](3 * d.w * d.h)
    val bpp = d.ch * d.sw
    var o = 0
    var row = 0
    while (row < d.h) {
      var p = row * d.rowStride + d.firstOffset
      val rowEnd = p + d.w * bpp
      d.colorType match {
        case 2 | 6 =>
          while (p < rowEnd) {
            out(o) = d.raw(p); out(o + 1) = d.raw(p + d.sw); out(o + 2) = d.raw(p + 2 * d.sw)
            o += 3; p += bpp
          }
        case 0 | 4 =>
          while (p < rowEnd) {
            val g = d.raw(p)
            out(o) = g; out(o + 1) = g; out(o + 2) = g
            o += 3; p += bpp
          }
        case 3 =>
          while (p < rowEnd) {
            val idx = d.raw(p) & 0xff
            if (idx >= d.palCount) return null
            val e = d.plteOff + 3 * idx
            out(o) = bytes(e); out(o + 1) = bytes(e + 1); out(o + 2) = bytes(e + 2)
            o += 3; p += 1
          }
      }
      row += 1
    }
    new JpegDecode.Raster(d.w, d.h, 3, out)
  }

  private def decodeRaw(bytes: Array[Byte]): Decoded = {
    // signature + at minimum IHDR(25) + IEND(12)
    if (bytes == null || bytes.length < 8 + 25 + 12) return null
    var i = 0
    while (i < 8) { if ((bytes(i) & 0xff) != Signature(i)) return null; i += 1 }

    val crc = crcs.get()
    // validate one chunk's CRC: covers type + data (bytes at off+4 for
    // len+4 bytes), compared to the trailing 4-byte CRC field
    def crcOk(off: Int, len: Int): Boolean = {
      crc.reset()
      crc.update(bytes, off + 4, 4 + len)
      crc.getValue == (be32(bytes, off + 8 + len).toLong & 0xffffffffL)
    }

    // IHDR must be the first chunk (PNG spec 5.6)
    if (be32(bytes, 8) != 13 ||
        bytes(12) != 'I' || bytes(13) != 'H' || bytes(14) != 'D' || bytes(15) != 'R' ||
        !crcOk(8, 13)) return null
    val w = be32(bytes, 16)
    val h = be32(bytes, 20)
    val bitDepth = bytes(24) & 0xff
    val colorType = bytes(25) & 0xff
    val compression = bytes(26) & 0xff
    val filterMethod = bytes(27) & 0xff
    val interlace = bytes(28) & 0xff
    val ch = channelsOf(colorType)
    // depth 8 for all five color types; depth 16 for types 0/2/4/6
    // (the spec does not define 16-bit palette indices, 11.2.2)
    if (w <= 0 || h <= 0 || ch < 0 ||
        !(bitDepth == 8 || (bitDepth == 16 && colorType != 3)) ||
        compression != 0 || filterMethod != 0 ||
        (interlace != 0 && interlace != 1)) return null
    val sw = bitDepth >> 3 // bytes per sample (big-endian at 16)
    val bpp = ch * sw // filter distance: bytes per pixel (PNG spec 9)
    val stride = w.toLong * bpp
    // interlace 1 (Adam7): the stream holds seven sub-images, each with
    // its own filter bytes; empty passes (zero width or height at this
    // geometry) contribute no scanlines at all (PNG spec 8.2)
    val rasterLen =
      if (interlace == 0) h.toLong * (1 + stride)
      else {
        var t = 0L
        var p = 0
        while (p < 7) {
          val pw = passWidth(w, p); val ph = passHeight(h, p)
          if (pw > 0 && ph > 0) t += ph.toLong * (1 + pw.toLong * bpp)
          p += 1
        }
        t
      }
    if (rasterLen > MaxRasterBytes) return null

    // chunk walk: concatenate IDAT (enforcing consecutiveness — PNG spec
    // 5.6), locate PLTE/tRNS with their ordering rules, stop at IEND and
    // require it to END the payload (trailing bytes are garbage)
    var idatLen = 0L
    var plteOff = -1; var palCount = 0
    var trnsOff = -1; var trnsLen = 0
    var sawIdat = false
    var idatClosed = false // a non-IDAT chunk after the first IDAT run
    var pos = 33
    var end = -1
    while (end < 0) {
      if (pos + 12 > bytes.length) return null // truncated mid-walk
      val len = be32(bytes, pos)
      if (len < 0 || pos + 12 + len.toLong > bytes.length) return null
      val t0 = bytes(pos + 4); val t1 = bytes(pos + 5)
      val t2 = bytes(pos + 6); val t3 = bytes(pos + 7)
      if (!crcOk(pos, len)) return null
      if (t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T') {
        if (idatClosed) return null // IDAT chunks must be consecutive
        sawIdat = true
        idatLen += len
      } else {
        if (sawIdat) idatClosed = true
        if (t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D') {
          if (len != 0) return null
          if (pos + 12 != bytes.length) return null // trailing garbage
          end = pos
        } else if (t0 == 'I' && t1 == 'H' && t2 == 'D' && t3 == 'R') {
          return null // a second IHDR is malformed
        } else if (t0 == 'P' && t1 == 'L' && t2 == 'T' && t3 == 'E') {
          // exactly one, before IDAT, 1..256 RGB entries (spec 11.2.3);
          // forbidden for grayscale types (spec 5.6)
          if (plteOff >= 0 || sawIdat || len == 0 || len % 3 != 0 || len > 768 ||
              colorType == 0 || colorType == 4) return null
          plteOff = pos + 8
          palCount = len / 3
        } else if (t0 == 't' && t1 == 'R' && t2 == 'N' && t3 == 'S') {
          // type 3: NON-EMPTY alpha table, after PLTE, before IDAT,
          // <= palette size (spec 11.3.2); types 4/6 forbid tRNS; types
          // 0/2 use it as a transparency KEY — outside this kernel's
          // statistics model. len == 0 is rejected like an empty PLTE:
          // a degenerate empty tRNS would otherwise flag the image as
          // alpha-bearing (sum_a = 255·n_px) where most decoders reject.
          if (colorType != 3 || plteOff < 0 || sawIdat ||
              trnsOff >= 0 || len == 0 || len > palCount) return null
          trnsOff = pos + 8
          trnsLen = len
        }
      }
      pos += 12 + len
    }
    if (idatLen == 0 || idatLen > Int.MaxValue) return null
    if (colorType == 3 && plteOff < 0) return null // PLTE is mandatory

    // second pass: copy IDAT payloads contiguously (chunk boundaries are
    // arbitrary relative to the zlib stream)
    val idat = new Array[Byte](idatLen.toInt)
    var o = 0
    pos = 33
    while (pos < end) {
      val len = be32(bytes, pos)
      if (bytes(pos + 4) == 'I' && bytes(pos + 5) == 'D' &&
          bytes(pos + 6) == 'A' && bytes(pos + 7) == 'T') {
        System.arraycopy(bytes, pos + 8, idat, o, len)
        o += len
      }
      pos += 12 + len
    }

    // inflate to EXACTLY h·(1+w·ch) bytes — short, long, or malformed
    // streams all fail the decode
    val raw = new Array[Byte](rasterLen.toInt)
    val inf = inflaters.get()
    inf.reset()
    inf.setInput(idat)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // n == 0 while unfinished covers BOTH truncation (needsInput) and
        // a preset-dictionary stream (needsDictionary — FDICT set in the
        // zlib header): without the latter this loop spins forever on a
        // crafted CRC-clean payload. PNG forbids FDICT anyway (spec 10.1)
        if (n == 0 && !inf.finished()) return null
        got += n
      }
      if (got < raw.length) return null
      // the stream must END here: a byte of extra raster is a geometry
      // lie; the probe also lets the Inflater consume the final-block
      // end + Adler-32 trailer so `finished` below is authoritative
      if (!inf.finished() && inf.inflate(new Array[Byte](1)) > 0) return null
      // a stream truncated at EXACTLY rasterLen output bytes (cut before
      // its final block end / checksum) must not pass as complete
      if (!inf.finished()) return null
      // leftover IDAT bytes after the zlib stream closes are garbage
      if (inf.getRemaining > 0) return null
    } catch { case _: java.util.zip.DataFormatException => return null }

    val istride = stride.toInt
    if (interlace == 0) {
      if (!unfilter(raw, istride, bpp, rowStride = 1 + istride, baseOff = 0, nRows = h))
        return null
      new Decoded(raw, w, h, colorType, ch, sw,
        rowStride = 1 + istride, firstOffset = 1,
        plteOff, palCount, trnsOff, trnsLen)
    } else {
      val flat = deinterlace(raw, w, h, bpp)
      if (flat == null) return null
      new Decoded(flat, w, h, colorType, ch, sw,
        rowStride = istride, firstOffset = 0,
        plteOff, palCount, trnsOff, trnsLen)
    }
  }

  // Adam7 pass origins and steps (PNG spec 8.2): pass p covers pixels at
  // (PassX0(p) + i·PassDx(p), PassY0(p) + j·PassDy(p))
  private val PassX0 = Array(0, 4, 0, 2, 0, 1, 0)
  private val PassY0 = Array(0, 0, 4, 0, 2, 0, 1)
  private val PassDx = Array(8, 8, 4, 4, 2, 2, 1)
  private val PassDy = Array(8, 8, 8, 4, 4, 2, 2)

  private def passWidth(w: Int, p: Int): Int =
    if (w <= PassX0(p)) 0 else (w - PassX0(p) + PassDx(p) - 1) / PassDx(p)
  private def passHeight(h: Int, p: Int): Int =
    if (h <= PassY0(p)) 0 else (h - PassY0(p) + PassDy(p) - 1) / PassDy(p)

  /** Unfilter each Adam7 pass independently (each pass is its own
    * sub-image — filters never reach across passes) and scatter its
    * pixels to final image positions. Returns the flat w·h·ch sample
    * raster, or null on an undefined filter byte.
    */
  private def deinterlace(raw: Array[Byte], w: Int, h: Int, bpp: Int): Array[Byte] = {
    val flat = new Array[Byte](w * h * bpp)
    var base = 0
    var p = 0
    while (p < 7) {
      val pw = passWidth(w, p); val ph = passHeight(h, p)
      if (pw > 0 && ph > 0) {
        val pstride = pw * bpp
        val rowBytes = 1 + pstride
        if (!unfilter(raw, pstride, bpp, rowStride = rowBytes, baseOff = base, nRows = ph))
          return null
        var j = 0
        while (j < ph) {
          val y = PassY0(p) + j * PassDy(p)
          val src = base + j * rowBytes + 1
          var i = 0
          while (i < pw) {
            val x = PassX0(p) + i * PassDx(p)
            var c = 0
            val s = src + i * bpp
            val d = (y * w + x) * bpp
            while (c < bpp) { flat(d + c) = raw(s + c); c += 1 }
            i += 1
          }
          j += 1
        }
        base += ph * rowBytes
      }
      p += 1
    }
    flat
  }

  /** Unfilter `nRows` scanlines in place (PNG spec 9: filters apply to
    * bytes, with `bpp` — bytes per COMPLETE pixel, so 2·channels at
    * depth 16 — as the left-pixel distance). Rows live at
    * `baseOff + row*rowStride`, each 1 filter byte + `istride` data
    * bytes. False on an undefined filter type.
    */
  private def unfilter(
      raw: Array[Byte], istride: Int, bpp: Int,
      rowStride: Int, baseOff: Int, nRows: Int): Boolean = {
    var row = 0
    while (row < nRows) {
      val base = baseOff + row * rowStride + 1
      val prev = base - rowStride // previous row's first data byte
      val filter = raw(base - 1) & 0xff
      filter match {
        case 0 => // None
        case 1 => // Sub: add left
          var x = bpp
          while (x < istride) {
            raw(base + x) = (raw(base + x) + raw(base + x - bpp)).toByte
            x += 1
          }
        case 2 => // Up: add above
          if (row > 0) {
            var x = 0
            while (x < istride) {
              raw(base + x) = (raw(base + x) + raw(prev + x)).toByte
              x += 1
            }
          }
        case 3 => // Average: add floor((left + above)/2)
          var x = 0
          while (x < istride) {
            val left = if (x >= bpp) raw(base + x - bpp) & 0xff else 0
            val above = if (row > 0) raw(prev + x) & 0xff else 0
            raw(base + x) = (raw(base + x) + ((left + above) >> 1)).toByte
            x += 1
          }
        case 4 => // Paeth
          var x = 0
          while (x < istride) {
            val a = if (x >= bpp) raw(base + x - bpp) & 0xff else 0
            val b = if (row > 0) raw(prev + x) & 0xff else 0
            val c = if (row > 0 && x >= bpp) raw(prev + x - bpp) & 0xff else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            raw(base + x) = (raw(base + x) + pred).toByte
            x += 1
          }
        case _ => return false // undefined filter byte
      }
      row += 1
    }
    true
  }

  /** Exact channel sums + the defined 2×2 NN thumb over the EXPANDED RGB
    * channels. Row `row`'s samples start at `row*rowStride + firstOffset`
    * (filter-byte layouts pass firstOffset 1; flat layouts 0). Null on a
    * palette index past PLTE (spec 11.2.3: an error, not clamped).
    *
    * `sw` is bytes per sample (1 at depth 8, 2 at depth 16). The output
    * model is FIXED at 8-bit scale regardless of depth — 16-bit samples
    * contribute their MOST-SIGNIFICANT byte (big-endian first byte; the
    * msb reduction, bit-exact for any v = x·257, i.e. every 8→16
    * upscaled value), so sums and the thumb mean the same thing for
    * every depth the kernel accepts and the schema needs no depth
    * column. The low byte still participates in unfiltering (filters
    * act on BYTES), so a wrong low byte corrupts downstream msbs too.
    */
  private def stats(
      bytes: Array[Byte], raw: Array[Byte], w: Int, h: Int,
      colorType: Int, ch: Int, sw: Int, rowStride: Int, firstOffset: Int,
      plteOff: Int, palCount: Int, trnsOff: Int, trnsLen: Int): InternalRow = {
    var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
    val hasAlpha = colorType == 4 || colorType == 6 ||
      (colorType == 3 && trnsOff >= 0)
    val bpp = ch * sw
    var row = 0
    colorType match {
      case 2 | 6 =>
        while (row < h) {
          var p = row * rowStride + firstOffset
          val rowEnd = p + w * bpp
          while (p < rowEnd) {
            sr += raw(p) & 0xff
            sg += raw(p + sw) & 0xff
            sb += raw(p + 2 * sw) & 0xff
            if (ch == 4) sa += raw(p + 3 * sw) & 0xff
            p += bpp
          }
          row += 1
        }
      case 0 | 4 =>
        while (row < h) {
          var p = row * rowStride + firstOffset
          val rowEnd = p + w * bpp
          while (p < rowEnd) {
            val g = raw(p) & 0xff
            sr += g; sg += g; sb += g
            if (ch == 2) sa += raw(p + sw) & 0xff
            p += bpp
          }
          row += 1
        }
      case 3 =>
        while (row < h) {
          var p = row * rowStride + firstOffset
          val rowEnd = p + w
          while (p < rowEnd) {
            val idx = raw(p) & 0xff
            if (idx >= palCount) return null
            val e = plteOff + 3 * idx
            sr += bytes(e) & 0xff
            sg += bytes(e + 1) & 0xff
            sb += bytes(e + 2) & 0xff
            if (trnsOff >= 0)
              sa += (if (idx < trnsLen) bytes(trnsOff + idx) & 0xff else 255)
            p += 1
          }
          row += 1
        }
    }
    val sbuf = new java.lang.StringBuilder(24)
    var ty = 0
    while (ty < 2) {
      var tx = 0
      while (tx < 2) {
        val r = (ty * h) / 2
        val c = (tx * w) / 2
        val off = r * rowStride + firstOffset + bpp * c
        colorType match {
          case 2 | 6 =>
            var k = 0
            while (k < 3) {
              hex2(sbuf, raw(off + k * sw) & 0xff)
              k += 1
            }
          case 0 | 4 =>
            val g = raw(off) & 0xff
            hex2(sbuf, g); hex2(sbuf, g); hex2(sbuf, g)
          case 3 =>
            val idx = raw(off) & 0xff
            // bounds were validated in the sum pass
            val e = plteOff + 3 * idx
            hex2(sbuf, bytes(e) & 0xff)
            hex2(sbuf, bytes(e + 1) & 0xff)
            hex2(sbuf, bytes(e + 2) & 0xff)
        }
        tx += 1
      }
      ty += 1
    }
    new GenericInternalRow(Array[Any](
      w, h, colorType, w.toLong * h, sr, sg, sb,
      if (hasAlpha) sa else null,
      UTF8String.fromString(sbuf.toString)))
  }

  private def hex2(sb: java.lang.StringBuilder, b: Int): Unit = {
    sb.append(Character.forDigit(b >> 4, 16))
    sb.append(Character.forDigit(b & 0xf, 16))
  }

  def apply(bytes: Column): Column =
    ColumnBridge.toColumn(PngDecode(ColumnBridge.toExpression(bytes)))
}
