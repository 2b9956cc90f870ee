package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-sniffing image decode: ONE expression that dispatches an
  * opaque binary payload to the right from-scratch kernel by magic
  * bytes — P6 → [[PpmDecode]], PNG → [[PngDecode]], GIF87a/89a →
  * [[GifDecode]], BM → [[BmpDecode]], RIFF/WEBP → [[WebpDecode]],
  * II·42/MM·42 → [[TiffDecode]],
  * SOI → the ORIENTED JPEG path ([[JpegOriented]]: EXIF applied, so
  * the sniff's geometry/thumb agree with [[ImageDHash]] on
  * tag-rotated photos) — and folds every result into the family's
  * SHARED feature schema:
  *
  *   (format, width, height, n_px, sum_r, sum_g, sum_b, thumb_hex)
  *
  * This is the feature-extraction operator a mixed 100 TB web corpus
  * needs: no format column exists on crawled payloads, so the sniff IS
  * part of the operator. A payload that matches no magic, or matches
  * but fails its kernel's strict decode (truncation, malformed
  * structure, out-of-scope variant), is one null row — the kernels'
  * own null contracts compose.
  *
  * Decode runs ONCE per row (the dispatch is Scala, not a CaseWhen over
  * five decoder expressions, which would defeat common-subexpression
  * elimination across branches); map-only, codegen'd, stream-safe.
  *
  * Format notes: PNG palette/gray variants fold their expanded-RGB
  * statistics (sum_a dropped — alpha is PNG-specific, not family
  * surface); JPEG statistics are REAL but implementation-defined
  * (IDCT), so exact-hash gates over mixed corpora should null them out
  * and band-judge JPEG separately (q_multimodal_jpeg) — the expression
  * itself reports what it decoded.
  */
case class MediaDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MediaDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "media_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"media_decode expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    MediaDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.MediaDecode.decode($v);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): MediaDecode =
    copy(child = c)
}

object MediaDecode {

  /** Test-only decode-call accounting. `Multimodal.decodedFeatures` fans
    * the decoded struct into 9 field extractions; CollapseProject inlines
    * the expression into each, and only whole-stage-codegen COMMON
    * SUBEXPRESSION ELIMINATION folds them back to one evaluation per row
    * (an interpreted-mode fallback would decode 9× per row). The counter
    * lets MediaDecodeSpec PIN the once-per-row property on the compiled
    * plan instead of trusting it. Off by default: one predictable branch
    * on a volatile in the production path, no atomics touched.
    */
  @volatile private[graft] var countEvals = false
  private[graft] val evalCount = new java.util.concurrent.atomic.LongAdder

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("thumb_hex", StringType, nullable = false)))

  private def row(
      format: String, width: Int, height: Int, nPx: Long,
      sr: Long, sg: Long, sb: Long, thumb: UTF8String): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(format), width, height, nPx, sr, sg, sb, thumb))

  def decode(b: Array[Byte]): InternalRow = {
    if (countEvals) evalCount.increment()
    if (b.length < 4) return null
    val b0 = b(0) & 0xff; val b1 = b(1) & 0xff
    if (b0 == 'P' && b1 == '6') {
      val r = PpmDecode.decode(b)
      if (r == null) return null
      // (width, height, n_px, sum_r, sum_g, sum_b, thumb_hex)
      row("ppm", r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getUTF8String(6))
    } else if (b0 == 0x89 && b1 == 'P' && (b(2) & 0xff) == 'N' && (b(3) & 0xff) == 'G') {
      val r = PngDecode.decode(b)
      if (r == null) return null
      // (width, height, color_type, n_px, sum_r, sum_g, sum_b, sum_a, thumb_hex)
      row("png", r.getInt(0), r.getInt(1), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getUTF8String(8))
    } else if (b0 == 'G' && b1 == 'I' && (b(2) & 0xff) == 'F' && (b(3) & 0xff) == '8') {
      val r = GifDecode.decode(b)
      if (r == null) return null
      // (width, height, gct_size, n_px, sum_r, sum_g, sum_b, thumb_hex)
      row("gif", r.getInt(0), r.getInt(1), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getUTF8String(7))
    } else if (b0 == 'B' && b1 == 'M') {
      val r = BmpDecode.decode(b)
      if (r == null) return null
      // (width, height, n_px, sum_r, sum_g, sum_b, thumb_hex)
      row("bmp", r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getUTF8String(6))
    } else if (b0 == 'R' && b1 == 'I' && b.length >= 12 &&
      (b(2) & 0xff) == 'F' && (b(3) & 0xff) == 'F' &&
      (b(8) & 0xff) == 'W' && (b(9) & 0xff) == 'E' &&
      (b(10) & 0xff) == 'B' && (b(11) & 0xff) == 'P') {
      val r = WebpDecode.decode(b)
      if (r == null) return null
      // (width, height, n_px, sum_r, sum_g, sum_b, sum_a, thumb_hex) —
      // alpha dropped to the family schema, like PNG
      row("webp", r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getUTF8String(7))
    } else if ((b0 == 'I' && b1 == 'I' && (b(2) & 0xff) == 42 && b(3) == 0) ||
      (b0 == 'M' && b1 == 'M' && b(2) == 0 && (b(3) & 0xff) == 42)) {
      val r = TiffDecode.decode(b)
      if (r == null) return null
      // (width, height, n_px, sum_r, sum_g, sum_b, thumb_hex)
      row("tiff", r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getUTF8String(6))
    } else if (b0 == 0xff && b1 == 0xd8) {
      // ORIENTED: EXIF orientation is applied (upright geometry, thumb
      // positioned by index remapping; sums are rotation-invariant), so
      // the sniff's positional features agree with [[ImageDHash]] and
      // [[JpegOriented]] on tag-rotated photos — the same photo no
      // longer yields two different geometries depending on which
      // operator you ask (VERDICT r18 #2)
      val r = JpegOriented.decode(b)
      if (r == null) return null
      // (width, height, orientation, n_px, sum_r, sum_g, sum_b, thumb_hex)
      row("jpeg", r.getInt(0), r.getInt(1), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getUTF8String(7))
    } else null
  }

  def apply(bytes: Column): Column =
    ColumnBridge.toColumn(MediaDecode(ColumnBridge.toExpression(bytes)))
}
