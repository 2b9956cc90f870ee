package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL PNG encode (the write path — re-encoding thumbnails/crops for
  * storage): binary P6 in, PNG out, built from scratch on core JDK
  * primitives (`java.util.zip.Deflater` for the zlib stream, CRC32 for
  * chunks). Output is a minimal spec-conformant PNG: signature, IHDR
  * (8-bit color type 2, non-interlaced), ONE IDAT (filter 0 per
  * scanline — P6 rasters are already raw RGB rows), IEND.
  *
  * Composition contract (what the gate pins): `PngDecode(PngEncode(p6))`
  * reproduces the P6 raster's exact statistics — and the spec breaks the
  * own-decoder circularity by also decoding this encoder's output with
  * `javax.imageio` (an independent decoder) and asserting pixel
  * equality. The encoded BYTES are deterministic for a given input and
  * Deflater version but deliberately not oracle-pinned (zlib output is
  * not SQL-reproducible); the decode-of-encode fields are.
  *
  * Anything that is not a complete maxval-255 P6 payload encodes to
  * NULL ([[PpmDecode.parseHeader]] — the one shared P6 parser, so encode
  * and decode can never disagree on which payloads are valid).
  *
  * Map-only, codegen'd; per-thread Deflater reuse.
  */
case class PngEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "png_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"png_encode expects binary (P6), got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    PngEncode.encode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (byte[]) graft.functions.PngEncode.encode($v);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): PngEncode =
    copy(child = c)
}

object PngEncode {

  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater = new java.util.zip.Deflater()
  }
  private val crcs = new ThreadLocal[java.util.zip.CRC32] {
    override def initialValue(): java.util.zip.CRC32 = new java.util.zip.CRC32()
  }

  private def putInt(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }

  /** Null on anything that is not a complete maxval-255 P6 image, or
    * whose filtered raster exceeds [[PngDecode.MaxRasterBytes]] — the
    * same budget the decode side enforces (computed in Long: near-2 GiB
    * dimensions overflow `h * (1 + w*3)` in Int into a negative
    * allocation size, a task crash instead of the documented null).
    */
  def encode(bytes: Array[Byte]): Array[Byte] = {
    val hd = PpmDecode.parseHeader(bytes)
    if (hd == null) return null
    val w = hd.w; val h = hd.h
    val stride = w * 3
    if (h.toLong * (1L + w.toLong * 3) > PngDecode.MaxRasterBytes) return null
    // filtered raster: one 0x00 filter byte per scanline + the raw row
    val filtered = new Array[Byte](h * (1 + stride))
    var row = 0
    while (row < h) {
      System.arraycopy(bytes, hd.base + row * stride, filtered, row * (1 + stride) + 1, stride)
      row += 1
    }
    val deflater = deflaters.get()
    deflater.reset()
    deflater.setInput(filtered)
    deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream(filtered.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(tmp)
      zbuf.write(tmp, 0, n)
    }
    val z = zbuf.toByteArray

    // sig(8) + IHDR(25) + IDAT(12 + z) + IEND(12)
    val out = new Array[Byte](8 + 25 + 12 + z.length + 12)
    val crc = crcs.get()
    // signature
    out(0) = 0x89.toByte; out(1) = 'P'; out(2) = 'N'; out(3) = 'G'
    out(4) = 0x0d; out(5) = 0x0a; out(6) = 0x1a; out(7) = 0x0a
    // IHDR
    putInt(out, 8, 13)
    out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
    putInt(out, 16, w); putInt(out, 20, h)
    out(24) = 8 // bit depth
    out(25) = 2 // color type: truecolor RGB
    // compression(26) / filter(27) / interlace(28) stay 0
    crc.reset(); crc.update(out, 12, 4 + 13)
    putInt(out, 29, crc.getValue.toInt)
    // IDAT
    var p = 33
    putInt(out, p, z.length)
    out(p + 4) = 'I'; out(p + 5) = 'D'; out(p + 6) = 'A'; out(p + 7) = 'T'
    System.arraycopy(z, 0, out, p + 8, z.length)
    crc.reset(); crc.update(out, p + 4, 4 + z.length)
    putInt(out, p + 8 + z.length, crc.getValue.toInt)
    // IEND
    p = p + 12 + z.length
    putInt(out, p, 0)
    out(p + 4) = 'I'; out(p + 5) = 'E'; out(p + 6) = 'N'; out(p + 7) = 'D'
    crc.reset(); crc.update(out, p + 4, 4)
    putInt(out, p + 8, crc.getValue.toInt)
    out
  }

  def apply(bytes: Column): Column =
    ColumnBridge.toColumn(PngEncode(ColumnBridge.toExpression(bytes)))
}
