package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PERCEPTUAL IMAGE HASH (difference hash / dHash) — the image-dedup
  * primitive an image pipeline runs after decode: a (gw·gh)-cell
  * area-mean grayscale reduction, one bit per HORIZONTALLY adjacent
  * cell pair (right mean > left mean), packed row-major into a long.
  * Near-duplicate images (re-encodes, mild crops/scales) land at small
  * Hamming distance; the classic configuration gw=9, gh=8 yields the
  * 64-bit hash the literature uses.
  *
  * Everything is INTEGER-EXACT (hash-gatable): gray = r+g+b (no /3 —
  * comparisons are scale-free), cell x-range = [cx·w/gw, (cx+1)·w/gw)
  * in floor arithmetic, and mean comparisons cross-multiply
  * (sumR·cntL > sumL·cntR) so unequal cell sizes never need division.
  * Images smaller than the grid (w < gw or h < gh) → null.
  *
  * Payload dispatch covers the formats a real crawl contains: P6
  * (raster read in place), JPEG — where the EXIF ORIENTATION IS
  * APPLIED first ([[Orient]]), so two byte-distinct photos differing
  * only in the orientation tag hash identically (spec-pinned) — and
  * PNG/GIF/BMP/WebP/TIFF through their kernels' expanded-raster seams
  * (`decodeRaster`, VERDICT r18 #1). Lossless containers share one
  * guarantee the specs pin: the same raster stored as P6 and as PNG
  * (or BMP) is bit-equal, so it hashes IDENTICALLY — cross-format
  * re-encodes of an image land at Hamming distance 0.
  * Map-only, codegen'd, stream-safe.
  */
case class ImageDHash(child: Expression, gw: Int, gh: Int) extends UnaryExpression {

  override def dataType: DataType = ImageDHash.schema
  override def nullable: Boolean = true
  override def prettyName: String = "image_dhash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"image_dhash expects binary, got ${child.dataType.catalogString}")
    else if (gw < 2 || gh < 1 || (gw - 1) * gh > 64)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"image_dhash grid must satisfy gw>=2, gh>=1, (gw-1)*gh <= 64; got ${gw}x$gh")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    ImageDHash.hash(input.asInstanceOf[Array[Byte]], gw, gh)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.ImageDHash.hash($v, $gw, $gh);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): ImageDHash =
    copy(child = c)
}

object ImageDHash {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("dhash", LongType, nullable = false)))

  /** Gray accessor over an interleaved-RGB raster at byte offset
    * `base` (P6 rasters are hashed IN PLACE in the payload), with the
    * EXIF orientation applied by INDEX REMAPPING — no upright copy is
    * ever materialized (the fused-kernel convention): (x, y) are
    * UPRIGHT coordinates, (sw, sh) the stored dims.
    */
  private def gray(
      rgb: Array[Byte], base: Int, sw: Int, sh: Int, o: Int, x: Int, y: Int): Long = {
    val j = base + 3 * Orient.srcIndex(o, sw, sh, x, y)
    (rgb(j) & 0xff).toLong + (rgb(j + 1) & 0xff) + (rgb(j + 2) & 0xff)
  }

  /** dHash of an interleaved-RGB raster viewed upright under EXIF
    * orientation `o` over its STORED (sw × sh) layout (exposed for
    * spec use; w/h below are the UPRIGHT dims).
    */
  private[graft] def hashRaster(
      rgb: Array[Byte], base: Int, sw: Int, sh: Int, o: Int, gw: Int, gh: Int): Long = {
    val (w, h) = Orient.outDims(o, sw, sh)
    // per-cell gray sums + pixel counts (floor-bounded cells)
    val sums = new Array[Long](gw * gh)
    val cnts = new Array[Long](gw * gh)
    var cy = 0
    while (cy < gh) {
      val ylo = cy * h / gh; val yhi = (cy + 1) * h / gh
      var cx = 0
      while (cx < gw) {
        val xlo = cx * w / gw; val xhi = (cx + 1) * w / gw
        var s = 0L
        var y = ylo
        while (y < yhi) {
          var x = xlo
          while (x < xhi) { s += gray(rgb, base, sw, sh, o, x, y); x += 1 }
          y += 1
        }
        sums(cy * gw + cx) = s
        cnts(cy * gw + cx) = (xhi - xlo).toLong * (yhi - ylo)
        cx += 1
      }
      cy += 1
    }
    packBits(sums, cnts, gw, gh) // meanR > meanL per adjacent pair, division-free
  }

  /** dHash over a single-byte GRAY plane at `base` (the Y4M luma shape):
    * same floor cells, cross-multiplied means, row-major packing as
    * [[hashRaster]] — gray is the plane byte itself. Caller guarantees
    * w ≥ gw, h ≥ gh.
    */
  private[graft] def hashLuma(
      bytes: Array[Byte], base: Int, w: Int, h: Int, gw: Int, gh: Int): Long = {
    val sums = new Array[Long](gw * gh)
    val cnts = new Array[Long](gw * gh)
    var cy = 0
    while (cy < gh) {
      val ylo = cy * h / gh; val yhi = (cy + 1) * h / gh
      var cx = 0
      while (cx < gw) {
        val xlo = cx * w / gw; val xhi = (cx + 1) * w / gw
        var s = 0L
        var y = ylo
        while (y < yhi) {
          var x = xlo
          while (x < xhi) { s += bytes(base + y * w + x) & 0xff; x += 1 }
          y += 1
        }
        sums(cy * gw + cx) = s
        cnts(cy * gw + cx) = (xhi - xlo).toLong * (yhi - ylo)
        cx += 1
      }
      cy += 1
    }
    packBits(sums, cnts, gw, gh)
  }

  /** dHash over a packed-0xRRGGBB canvas (the composited-GIF shape):
    * gray = r + g + b, same cells/bits. Caller guarantees w ≥ gw,
    * h ≥ gh.
    */
  private[graft] def hashPacked(
      px: Array[Int], w: Int, h: Int, gw: Int, gh: Int): Long = {
    val sums = new Array[Long](gw * gh)
    val cnts = new Array[Long](gw * gh)
    var cy = 0
    while (cy < gh) {
      val ylo = cy * h / gh; val yhi = (cy + 1) * h / gh
      var cx = 0
      while (cx < gw) {
        val xlo = cx * w / gw; val xhi = (cx + 1) * w / gw
        var s = 0L
        var y = ylo
        while (y < yhi) {
          var x = xlo
          while (x < xhi) {
            val v = px(y * w + x)
            s += ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)
            x += 1
          }
          y += 1
        }
        sums(cy * gw + cx) = s
        cnts(cy * gw + cx) = (xhi - xlo).toLong * (yhi - ylo)
        cx += 1
      }
      cy += 1
    }
    packBits(sums, cnts, gw, gh)
  }

  private def packBits(sums: Array[Long], cnts: Array[Long], gw: Int, gh: Int): Long = {
    var hashv = 0L
    var cy = 0
    while (cy < gh) {
      var cx = 0
      while (cx < gw - 1) {
        val l = cy * gw + cx; val r = l + 1
        if (sums(r) * cnts(l) > sums(l) * cnts(r))
          hashv |= 1L << (cy * (gw - 1) + cx)
        cx += 1
      }
      cy += 1
    }
    hashv
  }

  def hash(bytes: Array[Byte], gw: Int, gh: Int): InternalRow = {
    if (bytes.length < 4) return null
    if (bytes(0) == 'P' && bytes(1) == '6') {
      val hd = PpmDecode.parseHeader(bytes)
      if (hd == null) return null
      if (hd.w < gw || hd.h < gh) return null
      row("ppm", hd.w, hd.h, hashRaster(bytes, hd.base, hd.w, hd.h, 1, gw, gh))
    } else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      val r = JpegDecode.decodeRaster(bytes)
      if (r == null) return null
      // orientation APPLIED by index remapping inside the cell sums —
      // tag-only-rotated photos hash identically, no upright copy
      val o = JpegOriented.orientationOf(bytes)
      val (uw, uh) = Orient.outDims(o, r.w, r.h)
      if (uw < gw || uh < gh) return null
      row("jpeg", uw, uh, hashRaster(r.rgb, 0, r.w, r.h, o, gw, gh))
    } else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') {
      upright("png", PngDecode.decodeRaster(bytes), gw, gh)
    } else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8') {
      upright("gif", GifDecode.decodeRaster(bytes), gw, gh)
    } else if (bytes(0) == 'B' && bytes(1) == 'M') {
      upright("bmp", BmpDecode.decodeRaster(bytes), gw, gh)
    } else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'E' &&
      bytes(10) == 'B' && bytes(11) == 'P') {
      upright("webp", WebpDecode.decodeRaster(bytes), gw, gh)
    } else if ((bytes(0) == 'I' && bytes(1) == 'I' && (bytes(2) & 0xff) == 42 && bytes(3) == 0) ||
      (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 && (bytes(3) & 0xff) == 42)) {
      upright("tiff", TiffDecode.decodeRaster(bytes), gw, gh)
    } else null
  }

  /** Hash an already-upright expanded raster (the PNG/GIF/BMP seam —
    * no orientation concept in those containers). A lossless raster
    * stored as P6 and as PNG is bit-equal, so it HASHES equal
    * (spec-pinned).
    */
  private def upright(format: String, r: JpegDecode.Raster, gw: Int, gh: Int): InternalRow = {
    if (r == null) return null
    if (r.w < gw || r.h < gh) return null
    row(format, r.w, r.h, hashRaster(r.rgb, 0, r.w, r.h, 1, gw, gh))
  }

  private def row(format: String, w: Int, h: Int, d: Long): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(format), w, h, d))

  def apply(bytes: Column, gw: Int, gh: Int): Column =
    ColumnBridge.toColumn(ImageDHash(ColumnBridge.toExpression(bytes), gw, gh))
}
