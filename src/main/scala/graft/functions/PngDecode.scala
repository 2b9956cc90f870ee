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
  *   - per-channel byte SUMS as exact longs; `sum_a` is null for RGB
  *     (color type 2) images and the exact alpha sum for RGBA (type 6);
  *   - `thumb_hex`: the defined 2×2 nearest-neighbor thumbnail over the
  *     RGB channels — thumb pixel (ty, tx) samples the source pixel at
  *     row (ty*height) div 2, col (tx*width) div 2 (integer div), 12
  *     bytes hex-encoded; the grid [[PpmDecode]] pins and the DuckDB
  *     oracle reproduces positionally.
  *
  * PNG is LOSSLESS with spec-mandated decode output, so this is
  * hash-gatable exactly like the P6 path: the gate's generator encodes an
  * md5-derived raster through an INDEPENDENT encoder (`javax.imageio`),
  * this kernel decodes it with its own Inflater + unfilter, and the
  * oracle recomputes the raster statistics positionally from the same
  * document fields — the two implementations meet only at the raster
  * definition.
  *
  * Scope (anything else decodes to NULL, the header parsers' "unknown
  * format" convention): 8-bit samples, color types 2 (RGB) and 6 (RGBA),
  * no interlacing (Adam7 reorders scanlines — out of scope by design, not
  * mis-sliced), compression 0 / filter method 0 (the only values PNG
  * defines). Ancillary chunks are skipped; every chunk's CRC is
  * validated (a corrupt or truncated payload must not half-decode).
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

  /** Null on anything that is not a complete, CRC-clean, non-interlaced
    * 8-bit RGB/RGBA PNG.
    */
  def decode(bytes: Array[Byte]): InternalRow = {
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
    if (w <= 0 || h <= 0 || bitDepth != 8 ||
        (colorType != 2 && colorType != 6) ||
        compression != 0 || filterMethod != 0 || interlace != 0) return null
    val bpp = if (colorType == 6) 4 else 3
    val stride = w.toLong * bpp
    val rasterLen = h.toLong * (1 + stride)
    if (rasterLen > MaxRasterBytes) return null

    // chunk walk: concatenate IDAT, skip ancillary, stop at IEND
    var idatLen = 0L
    var pos = 33
    var end = -1
    while (end < 0) {
      if (pos + 12 > bytes.length) return null // truncated mid-walk
      val len = be32(bytes, pos)
      if (len < 0 || pos + 12 + len.toLong > bytes.length) return null
      val t0 = bytes(pos + 4); val t1 = bytes(pos + 5)
      val t2 = bytes(pos + 6); val t3 = bytes(pos + 7)
      if (!crcOk(pos, len)) return null
      if (t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T') idatLen += len
      else if (t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D') {
        if (len != 0) return null
        end = pos
      } else if (t0 == 'I' && t1 == 'H' && t2 == 'D' && t3 == 'R') {
        return null // a second IHDR is malformed
      }
      pos += 12 + len
    }
    if (idatLen == 0 || idatLen > Int.MaxValue) return null

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

    // inflate to EXACTLY h·(1+w·bpp) bytes — short, long, or malformed
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

    // unfilter in place, scanline by scanline (PNG spec 9: filters apply
    // to bytes, with `bpp` as the pixel-offset distance)
    val istride = stride.toInt
    val rowBytes = 1 + istride
    var row = 0
    while (row < h) {
      val base = row * rowBytes + 1
      val prev = base - rowBytes // previous row's first data byte
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
        case _ => return null // undefined filter byte
      }
      row += 1
    }

    // exact channel sums (+ the defined 2x2 NN thumb over RGB)
    var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
    row = 0
    while (row < h) {
      var p = row * rowBytes + 1
      val rowEnd = p + istride
      while (p < rowEnd) {
        sr += raw(p) & 0xff
        sg += raw(p + 1) & 0xff
        sb += raw(p + 2) & 0xff
        if (bpp == 4) sa += raw(p + 3) & 0xff
        p += bpp
      }
      row += 1
    }
    val sbuf = new java.lang.StringBuilder(24)
    var ty = 0
    while (ty < 2) {
      var tx = 0
      while (tx < 2) {
        val r = (ty * h) / 2
        val c = (tx * w) / 2
        val off = r * rowBytes + 1 + bpp * c
        var ch = 0
        while (ch < 3) {
          val b = raw(off + ch) & 0xff
          sbuf.append(Character.forDigit(b >> 4, 16))
          sbuf.append(Character.forDigit(b & 0xf, 16))
          ch += 1
        }
        tx += 1
      }
      ty += 1
    }
    new GenericInternalRow(Array[Any](
      w, h, colorType, w.toLong * h, sr, sg, sb,
      if (bpp == 4) sa else null,
      UTF8String.fromString(sbuf.toString)))
  }

  def apply(bytes: Column): Column =
    ColumnBridge.toColumn(PngDecode(ColumnBridge.toExpression(bytes)))
}
