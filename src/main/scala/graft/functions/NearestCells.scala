package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `n` nearest centroid indices for an embedding vector, nearest first —
  * the coarse-quantizer primitive behind IVF ANN (corpus assignment uses
  * `n = 1`, query probing `n = nprobe`).
  *
  * The centroid matrix rides along as a plan REFERENCE OBJECT
  * (`ctx.addReferenceObj`), not as inlined literals: with k cells × d dims
  * the literal form blows the plan up to k·d constant nodes (the round-1
  * "Truncated the string representation of a plan" warning) and every
  * analyzer/optimizer pass re-walks them. Here the plan carries one compact
  * node regardless of k·d, and the per-row work is a tight primitive loop.
  *
  * Distance ranking uses the squared-L2 identity: argmin |v−c|² =
  * argmax 2·v·c − |c|² (|v|² is constant per row), with |c|² precomputed
  * once. Ties break toward the higher cell index, matching the
  * `greatest(struct(score, idx))` composition this replaces.
  */
case class NearestCells(child: Expression, matrix: Seq[Seq[Double]], n: Int)
    extends UnaryExpression {

  require(matrix.nonEmpty && n >= 1, "NearestCells needs >=1 centroid and n>=1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cells"

  @transient private lazy val dims: Int = matrix.head.length
  @transient private lazy val flat: Array[Double] = matrix.flatten.toArray
  @transient private lazy val norms: Array[Double] =
    matrix.map(c => c.map(x => x * x).sum).toArray
  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells expects array<float|double>, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    NearestCells.topCells(v.asInstanceOf[ArrayData], isFloat, flat, norms, dims, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroidFlat", flat, "double[]")
    val no = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.functions.NearestCells.topCells(
         |  $v, $isFloat, $m, $no, $dims, $n);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): NearestCells =
    copy(child = c)
}

/** Two-level variant of [[NearestCells]] for large centroid matrices: the
  * k fine centroids are pre-clustered (driver-side, deterministic —
  * `Similarity.groupCentroids`) into ~√k coarse groups; a row scores the
  * √k coarse centroids, keeps the `coarseProbes` nearest groups, and scans
  * only THEIR member fine centroids. Per-row cost drops from O(k·d) to
  * O((1 + coarseProbes)·√k·d) — the documented flat-assignment wall at
  * ~1e5 cells (Similarity.autoCells scaladoc). Results are approximate in
  * the standard IVF sense (a vector whose true nearest fine cell lives in
  * an unprobed coarse group maps to its best probed cell); with
  * `coarseProbes >= number of groups` the scan is exhaustive and equals
  * the flat expression bit-for-bit (spec-pinned). Returned indices are
  * GLOBAL fine-cell indices with the flat tie-break (score desc, index
  * desc), independent of group scan order.
  */
case class NearestCellsTwoLevel(
    child: Expression,
    matrix: Seq[Seq[Double]],
    coarse: Seq[Seq[Double]],
    members: Seq[Seq[Int]],
    coarseProbes: Int,
    n: Int)
    extends UnaryExpression {

  require(matrix.nonEmpty && coarse.nonEmpty && n >= 1 && coarseProbes >= 1,
    "NearestCellsTwoLevel needs >=1 centroid/group, n>=1, coarseProbes>=1")
  require(members.length == coarse.length,
    "one member list per coarse group")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cells_2l"

  @transient private lazy val dims: Int = matrix.head.length
  @transient private lazy val fineFlat: Array[Double] = matrix.flatten.toArray
  @transient private lazy val fineNorms: Array[Double] =
    matrix.map(c => c.map(x => x * x).sum).toArray
  @transient private lazy val coarseFlat: Array[Double] = coarse.flatten.toArray
  @transient private lazy val coarseNorms: Array[Double] =
    coarse.map(c => c.map(x => x * x).sum).toArray
  @transient private lazy val memberArr: Array[Array[Int]] =
    members.map(_.toArray).toArray
  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells_2l expects array<float|double>, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    NearestCells.topCellsTwoLevel(
      v.asInstanceOf[ArrayData], isFloat, coarseFlat, coarseNorms,
      fineFlat, fineNorms, memberArr, dims, coarseProbes, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cf = ctx.addReferenceObj("coarseFlat", coarseFlat, "double[]")
    val cn = ctx.addReferenceObj("coarseNorms", coarseNorms, "double[]")
    val ff = ctx.addReferenceObj("fineFlat", fineFlat, "double[]")
    val fn = ctx.addReferenceObj("fineNorms", fineNorms, "double[]")
    val me = ctx.addReferenceObj("members", memberArr, "int[][]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.functions.NearestCells.topCellsTwoLevel(
         |  $v, $isFloat, $cf, $cn, $ff, $fn, $me, $dims, $coarseProbes, $n);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): NearestCellsTwoLevel =
    copy(child = c)
}

object NearestCellsTwoLevel {
  def nearestCells(
      vec: Column,
      matrix: Seq[Seq[Double]],
      coarse: Seq[Seq[Double]],
      members: Seq[Seq[Int]],
      coarseProbes: Int,
      n: Int): Column =
    ColumnBridge.toColumn(NearestCellsTwoLevel(
      ColumnBridge.toExpression(vec), matrix, coarse, members, coarseProbes, n))
}

object NearestCells {

  /** Hot loop shared by eval and generated code: score every cell, keep the
    * top `n` by (score desc, cell index desc). `n` is tiny (<= nprobe), so
    * insertion into a fixed array beats any heap.
    */
  def topCells(
      v: ArrayData,
      isFloat: Boolean,
      flat: Array[Double],
      norms: Array[Double],
      dims: Int,
      n: Int): ArrayData = {
    val cells = norms.length
    val keep = math.min(n, cells)
    val vd = new Array[Double](dims)
    val nv = math.min(dims, v.numElements())
    var i = 0
    while (i < nv) {
      vd(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val bestS = Array.fill(keep)(Double.NegativeInfinity)
    val bestI = Array.fill(keep)(-1)
    var c = 0
    while (c < cells) {
      var s = 0.0
      var d = 0
      val off = c * dims
      while (d < dims) {
        s += vd(d) * flat(off + d)
        d += 1
      }
      s = 2 * s - norms(c)
      val last = keep - 1
      if (s > bestS(last) || (s == bestS(last) && c > bestI(last))) {
        var j = last
        while (j > 0 && (s > bestS(j - 1) || (s == bestS(j - 1) && c > bestI(j - 1)))) {
          bestS(j) = bestS(j - 1); bestI(j) = bestI(j - 1)
          j -= 1
        }
        bestS(j) = s; bestI(j) = c
      }
      c += 1
    }
    new GenericArrayData(bestI)
  }

  def nearestCells(vec: Column, matrix: Seq[Seq[Double]], n: Int): Column =
    ColumnBridge.toColumn(NearestCells(ColumnBridge.toExpression(vec), matrix, n))

  /** Two-level hot loop: coarse top-`cp` scan, then a fine scan restricted
    * to the selected groups' members. The fine insertion keeps global
    * (score desc, index desc) order, so the result is independent of the
    * order groups are scanned in.
    */
  def topCellsTwoLevel(
      v: ArrayData,
      isFloat: Boolean,
      coarseFlat: Array[Double],
      coarseNorms: Array[Double],
      fineFlat: Array[Double],
      fineNorms: Array[Double],
      members: Array[Array[Int]],
      dims: Int,
      cp: Int,
      n: Int): ArrayData = {
    val vd = new Array[Double](dims)
    val nv = math.min(dims, v.numElements())
    var i = 0
    while (i < nv) {
      vd(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    // coarse top-cp (same scoring + tie-break as the flat scan)
    val groups = coarseNorms.length
    val keepC = math.min(cp, groups)
    val cS = Array.fill(keepC)(Double.NegativeInfinity)
    val cI = Array.fill(keepC)(-1)
    var g = 0
    while (g < groups) {
      var s = 0.0
      var d = 0
      val off = g * dims
      while (d < dims) { s += vd(d) * coarseFlat(off + d); d += 1 }
      s = 2 * s - coarseNorms(g)
      val last = keepC - 1
      if (s > cS(last) || (s == cS(last) && g > cI(last))) {
        var j = last
        while (j > 0 && (s > cS(j - 1) || (s == cS(j - 1) && g > cI(j - 1)))) {
          cS(j) = cS(j - 1); cI(j) = cI(j - 1)
          j -= 1
        }
        cS(j) = s; cI(j) = g
      }
      g += 1
    }
    // fine scan over the selected groups' members only
    var cand = 0
    var p = 0
    while (p < keepC) {
      if (cI(p) >= 0) cand += members(cI(p)).length
      p += 1
    }
    val keep = math.max(1, math.min(n, cand))
    val bestS = Array.fill(keep)(Double.NegativeInfinity)
    val bestI = Array.fill(keep)(-1)
    p = 0
    while (p < keepC) {
      if (cI(p) >= 0) {
        val mem = members(cI(p))
        var m = 0
        while (m < mem.length) {
          val c = mem(m)
          var s = 0.0
          var d = 0
          val off = c * dims
          while (d < dims) { s += vd(d) * fineFlat(off + d); d += 1 }
          s = 2 * s - fineNorms(c)
          val last = keep - 1
          if (s > bestS(last) || (s == bestS(last) && c > bestI(last))) {
            var j = last
            while (j > 0 && (s > bestS(j - 1) || (s == bestS(j - 1) && c > bestI(j - 1)))) {
              bestS(j) = bestS(j - 1); bestI(j) = bestI(j - 1)
              j -= 1
            }
            bestS(j) = s; bestI(j) = c
          }
          m += 1
        }
      }
      p += 1
    }
    new GenericArrayData(bestI)
  }
}
