package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** REAL image resize for binary PPM (P6) — binary in, binary out: the
  * output is itself a canonical-header P6 (`P6\n<tw> <th>\n255\n` +
  * raster), so resizes compose ([[PpmDecode]] reads the output) and a
  * resized corpus column remains a media column. Nearest-neighbor with
  * the [[PpmDecode]] thumbnail's DEFINED grid generalized to any target:
  * output pixel (ty, tx) samples source (row, col) =
  * ((ty·h) div th, (tx·w) div tw) — integer div, no rounding mode
  * ambiguity, positionally reproducible by the oracle. Payloads that are
  * not complete maxval-255 P6 images resize to NULL (the decode
  * convention). Map-only; only sampled source bytes are read.
  */
case class PpmResize(child: Expression, targetW: Int, targetH: Int)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "ppm_resize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ppm_resize expects binary, got ${child.dataType.catalogString}")
    else if (targetW < 1 || targetH < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ppm_resize target must be >= 1x1, got ${targetW}x$targetH")
    else if (targetW.toLong * targetH * 3 > Int.MaxValue - 32)
      // analysis-time guard: the output allocation is header + tw*th*3
      // bytes in ONE array — an Int-overflowing target must fail the
      // QUERY loudly here, not wrap negative inside the kernel
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ppm_resize target ${targetW}x$targetH exceeds the 2 GiB " +
          "single-payload bound")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    PpmResize.resize(input.asInstanceOf[Array[Byte]], targetW, targetH)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.PpmResize.resize($v, $targetW, $targetH);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): PpmResize =
    copy(child = c)
}

object PpmResize {

  /** Null unless `bytes` is a complete maxval-255 P6 — validation is
    * [[PpmDecode.parseHeader]], THE header parser, so decode and resize
    * can never disagree on payload validity.
    */
  def resize(bytes: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    val hd = PpmDecode.parseHeader(bytes)
    if (hd == null) return null
    val w = hd.w; val h = hd.h
    val base = hd.base

    val header = s"P6\n$tw $th\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + tw * th * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var o = header.length
    var ty = 0
    while (ty < th) {
      val sr = (ty.toLong * h / th).toInt
      var tx = 0
      while (tx < tw) {
        val sc = (tx.toLong * w / tw).toInt
        val off = base + 3 * (sr * w + sc)
        out(o) = bytes(off); out(o + 1) = bytes(off + 1); out(o + 2) = bytes(off + 2)
        o += 3
        tx += 1
      }
      ty += 1
    }
    out
  }

  def apply(bytes: Column, targetW: Int, targetH: Int): Column =
    ColumnBridge.toColumn(
      PpmResize(ColumnBridge.toExpression(bytes), targetW, targetH))
}
