package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL pixel decode for binary PPM (P6) payloads — the uncompressed
  * image format needs no codec library. Siblings: [[PngDecode]] decodes
  * PNG pixels for real (from-scratch Inflater + unfilter), and JPEG runs
  * tolerance-gated through the batched `javax.imageio` seam. This kernel
  * decodes actual pixels end-to-end:
  *
  *   (width, height, n_px, sum_r, sum_g, sum_b, thumb_hex)
  *
  *   - per-channel byte SUMS as exact longs (means are one division away;
  *     sums keep the gate integer-exact on any engine);
  *   - `thumb_hex`: a 2×2 nearest-neighbor resize, 12 bytes hex-encoded —
  *     thumb pixel (ty, tx) samples the source pixel at
  *     row = (ty*height) div 2, col = (tx*width) div 2 (integer div), a
  *     DEFINED sampling grid the oracle reproduces positionally.
  *
  * Header: `P6`, then whitespace-separated width/height/maxval (maxval
  * must be 255 — 2-byte samples are out of scope), then ONE whitespace
  * byte, then exactly width·height·3 raw RGB bytes. Anything else —
  * wrong magic, malformed header, truncated pixel data — decodes to
  * NULL (the "unknown format" convention of the header parsers).
  *
  * Map-only, codegen'd via a static kernel; one pass over the payload.
  */
case class PpmDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PpmDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "ppm_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ppm_decode expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    PpmDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.PpmDecode.decode($v);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): PpmDecode =
    copy(child = c)
}

object PpmDecode {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("thumb_hex", StringType, nullable = false)))

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == 0x0b || b == 0x0c

  /** Parsed P6 header: raster starts at `base` and is exactly w·h·3
    * bytes, all present in the payload.
    */
  final case class P6Header(w: Int, h: Int, base: Int)

  /** The ONE P6 header parser — shared by decode and resize so the two
    * kernels can never disagree on which payloads are valid. Netpbm
    * `#`-comments (from `#` to end of line, legal anywhere whitespace
    * is) are skipped — real P6 files carry tool banners. Null on
    * anything that is not a complete maxval-255 P6 image.
    */
  def parseHeader(bytes: Array[Byte]): P6Header = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return null
    var i = 2
    // three whitespace-separated decimal fields: width, height, maxval
    val fields = new Array[Int](3)
    var f = 0
    while (f < 3) {
      var skipping = true
      while (skipping && i < bytes.length) {
        if (isWs(bytes(i))) i += 1
        else if (bytes(i) == '#') { // comment: to end of line
          while (i < bytes.length && bytes(i) != '\n') i += 1
        } else skipping = false
      }
      if (i >= bytes.length || bytes(i) < '0' || bytes(i) > '9') return null
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0')
        if (v > Int.MaxValue) return null
        i += 1
      }
      fields(f) = v.toInt
      f += 1
    }
    val w = fields(0); val h = fields(1); val maxval = fields(2)
    if (w <= 0 || h <= 0 || maxval != 255) return null
    // exactly ONE whitespace byte separates the header from the raster
    if (i >= bytes.length || !isWs(bytes(i))) return null
    i += 1
    val need = w.toLong * h * 3
    if (need > Int.MaxValue - i || bytes.length < i + need.toInt) return null
    P6Header(w, h, i)
  }

  /** Null on anything that is not a complete maxval-255 P6 image. */
  def decode(bytes: Array[Byte]): InternalRow = {
    val hd = parseHeader(bytes)
    if (hd == null) return null
    val w = hd.w; val h = hd.h
    val base = hd.base
    var sr = 0L; var sg = 0L; var sb = 0L
    var p = base
    val end = base + w * h * 3
    while (p < end) {
      sr += bytes(p) & 0xff
      sg += bytes(p + 1) & 0xff
      sb += bytes(p + 2) & 0xff
      p += 3
    }
    // 2x2 nearest-neighbor: source (row, col) = ((ty*h) div 2, (tx*w) div 2)
    val sbuf = new java.lang.StringBuilder(24)
    var ty = 0
    while (ty < 2) {
      var tx = 0
      while (tx < 2) {
        val r = (ty * h) / 2
        val c = (tx * w) / 2
        val off = base + 3 * (r * w + c)
        var ch = 0
        while (ch < 3) {
          val b = bytes(off + ch) & 0xff
          sbuf.append(Character.forDigit(b >> 4, 16))
          sbuf.append(Character.forDigit(b & 0xf, 16))
          ch += 1
        }
        tx += 1
      }
      ty += 1
    }
    new GenericInternalRow(Array[Any](
      w, h, w.toLong * h, sr, sg, sb, UTF8String.fromString(sbuf.toString)))
  }

  def apply(bytes: Column): Column =
    ColumnBridge.toColumn(PpmDecode(ColumnBridge.toExpression(bytes)))
}
