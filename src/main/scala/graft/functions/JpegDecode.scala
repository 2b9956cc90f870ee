package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL baseline-JPEG pixel decode, from scratch on the core JDK — the
  * lossy member of the codec family next to [[PngDecode]] (Inflate),
  * [[GifDecode]] (LZW), [[BmpDecode]] and [[PpmDecode]]. Reference:
  * ITU-T T.81 (JPEG, 1992) — Annex B (syntax), F.2 (baseline decode),
  * A.3.3 (IDCT), plus JFIF 1.02 for the YCbCr↔RGB equations.
  *
  * Scope (documented): BASELINE SEQUENTIAL (SOF0) and PROGRESSIVE
  * (SOF2, T.81 Annex G: spectral selection + successive approximation —
  * DC first/refine, AC first/refine with EOBn run codes and the
  * correction-bit algorithm, coefficients accumulated across scans and
  * completed at EOI) — 8-bit precision, Huffman entropy coding,
  * 1 (grayscale), 3 (YCbCr) or 4 (CMYK family: Adobe APP14 transform 2
  * = YCCK, transform 0 = Adobe-inverted CMYK, no marker = plain CMYK —
  * see rasterFromPlanes for the exact RGB contract) components,
  * sampling factors 1..4 per axis (covers 4:4:4, 4:2:2, 4:2:0),
  * restart markers honored in both modes. Everything else — arithmetic
  * coding (DAC/SOF9+), 12-bit, hierarchical, 3-component Adobe RGB,
  * sequential multi-scan non-interleaved files, truncated entropy
  * data — → null, the strict null-on-malformed contract of the family.
  *
  * Decode pipeline per T.81 F.2: marker walk (DQT/DHT/DRI/SOF0/SOS) →
  * per-MCU Huffman decode (canonical tables via the F.2.2.3
  * MINCODE/MAXCODE/VALPTR recipe, with an 8-bit lookahead fast path) →
  * DC prediction + EXTEND (F.2.2.1) → dequantize in zig-zag order →
  * separable 2-D IDCT in doubles (A.3.3 — the reference cosine form;
  * IDCT output is implementation-defined across decoders, which is WHY
  * the gate is tolerance-banded) → level shift + clamp → CENTERED
  * BILINEAR chroma upsampling (at factor 2 this is exactly the classic
  * triangle-filter 3:1 / 9:3:3:1 weights quality decoders use; identity
  * at 1:1, well-defined for any ratio) → JFIF YCbCr→RGB with rounding.
  *
  * Output (width, height, n_comp, n_px, sum_r, sum_g, sum_b, thumb_hex)
  * — the shared decoder convention: exact channel sums over the decoded
  * RGB raster plus the defined 2×2 NN positioned thumb.
  *
  * One fused map-only codegen expression; the decoded raster is an
  * intermediate bounded by [[JpegDecode.MaxPixels]] (the PngDecode-style
  * hostile-header cap).
  */
case class JpegDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = JpegDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jpeg_decode expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    JpegDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.JpegDecode.decode($v);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): JpegDecode =
    copy(child = c)
}

/** Tolerance judge over the from-scratch decoder: decodes `payload` with
  * [[JpegDecode.decodeRaster]] and compares against the pre-encode
  * raster `expected` (a string whose char codes are the interleaved RGB
  * byte values — the mediaTableJpeg convention). Emits exact geometry
  * plus the in-band booleans the gate's oracle pins TRUE:
  * per-channel |mean signed error| ≤ `meanTol` and worst per-channel
  * mean absolute error ≤ `maeTol` (see decodeJpegBatched's scaladoc for
  * why these bands are the honest ceiling for a lossy codec). Null when
  * the payload doesn't decode, the expected raster is missing, or the
  * geometries disagree — matching the batched seam's contract exactly,
  * so the two paths are interchangeable behind the gate.
  */
case class JpegBands(
    left: Expression, right: Expression,
    meanTol: Double, maeTol: Double) extends BinaryExpression {

  override def dataType: DataType = JpegBands.schema
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_bands"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jpeg_bands expects (binary, string), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(payload: Any, expected: Any): Any =
    JpegBands.judge(
      payload.asInstanceOf[Array[Byte]],
      expected.asInstanceOf[UTF8String].toString, meanTol, maeTol)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, e) => s"""
      ${ev.value} = (InternalRow) graft.functions.JpegBands.judge(
        $p, $e.toString(), $meanTol, $maeTol);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JpegBands = copy(left = l, right = r)
}

object JpegBands {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("in_band_r", BooleanType, nullable = false),
    StructField("in_band_g", BooleanType, nullable = false),
    StructField("in_band_b", BooleanType, nullable = false),
    StructField("in_band_mae", BooleanType, nullable = false)))

  def judge(
      payload: Array[Byte], expected: String,
      meanTol: Double, maeTol: Double): InternalRow = {
    val r = JpegDecode.decodeRaster(payload)
    if (r == null) return null
    if (expected.length != r.w * r.h * 3) return null
    var sr = 0L; var sg = 0L; var sb = 0L // signed error sums
    var ar = 0L; var ag = 0L; var ab = 0L // absolute error sums
    val n0 = r.w * r.h
    var i = 0
    while (i < n0) {
      val j = 3 * i
      val dr = (r.rgb(j) & 0xff) - (expected.charAt(j) & 0xff)
      val dg = (r.rgb(j + 1) & 0xff) - (expected.charAt(j + 1) & 0xff)
      val db = (r.rgb(j + 2) & 0xff) - (expected.charAt(j + 2) & 0xff)
      sr += dr; sg += dg; sb += db
      ar += math.abs(dr); ag += math.abs(dg); ab += math.abs(db)
      i += 1
    }
    val n = n0.toDouble
    new GenericInternalRow(Array[Any](
      r.w, r.h, r.w.toLong * r.h,
      math.abs(sr / n) <= meanTol,
      math.abs(sg / n) <= meanTol,
      math.abs(sb / n) <= meanTol,
      math.max(ar, math.max(ag, ab)) / n <= maeTol))
  }

  def apply(payload: Column, expected: Column, meanTol: Double, maeTol: Double): Column =
    ColumnBridge.toColumn(JpegBands(
      ColumnBridge.toExpression(payload), ColumnBridge.toExpression(expected),
      meanTol, maeTol))
}

object JpegDecode {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_comp", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("thumb_hex", StringType, nullable = false)))

  /** Decoded-pixel cap: w·h beyond this rejects — hostile SOF
    * dimensions must not claim gigabytes, like PngDecode's byte budget.
    * Worst-case transient residency per row at the cap: BASELINE ~130
    * MiB (RGB raster + padded byte planes, 4-component worst case);
    * PROGRESSIVE ~380 MiB — the per-component coefficient buffers
    * (≤ 4·MaxPixels·4 = 256 MiB, enforced below; 4 components since
    * CMYK is in scope) live until EOI, and finishProgressive then adds
    * the padded planes + the 48 MiB RGB raster before they free
    * (ADVICE r17: state the true progressive ceiling, don't understate
    * it).
    */
  val MaxPixels: Int = 16 << 20

  /** Decoded raster: interleaved RGB bytes, row-major. */
  final class Raster(val w: Int, val h: Int, val nComp: Int, val rgb: Array[Byte])

  // zig-zag scan order (T.81 Figure A.6): zz(k) = natural index of the
  // k-th coefficient in scan order
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // CS(u)(x) = c(u)/2 · cos((2x+1)uπ/16) — the A.3.3 basis, so the 2-D
  // IDCT is two passes of 8-point dot products against this table
  private val CS: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** One canonical Huffman table (T.81 F.2.2.3): MINCODE/MAXCODE/VALPTR
    * indexed by code length 1..16, plus a 256-entry lookahead for codes
    * ≤ 8 bits (symbol and length packed; -1 = take the slow path).
    */
  private final class Huff(counts: Array[Int], symbols: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    val syms: Array[Byte] = symbols
    val look = new Array[Int](256)

    /** False when the BITS counts are not canonically consistent — more
      * codes of length ≤ l than 2^l prefixes can hold. A malformed DHT
      * must null the decode, not index past the lookahead table.
      */
    var valid = true

    {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) == 0) {
          maxCode(l) = -1
        } else {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxCode(l) = code - 1
        }
        if (code > (1 << l)) valid = false // overfull level (T.81 C.2)
        code <<= 1
        l += 1
      }
      if (!valid) java.util.Arrays.fill(maxCode, -1)
      java.util.Arrays.fill(look, -1)
      // lookahead: every 8-bit window starting with a short code maps
      // straight to (length << 8 | symbol)
      l = if (valid) 1 else 9 // skip the fill entirely on a broken table
      while (l <= 8) {
        var c = 0
        while (c < counts(l - 1)) {
          val prefix = (minCode(l) + c) << (8 - l)
          val span = 1 << (8 - l)
          var s = 0
          while (s < span) {
            look(prefix | s) = (l << 8) | (syms(valPtr(l) + c) & 0xff)
            s += 1
          }
          c += 1
        }
        l += 1
      }
    }
  }

  /** Entropy-coded-segment bit reader: MSB-first bits, 0xFF00 byte
    * stuffing unstuffed, stops (rather than consuming) at any real
    * marker. Running out of bits mid-code is a truncation → the reader
    * trips `bad` and the decode returns null.
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0 // bit accumulator (left-aligned within low 24)
    private var cnt = 0 // bits available in acc
    var bad = false
    var atMarker = false // hit 0xFF<real marker> — entropy data ended

    private def fillByte(): Boolean = {
      if (atMarker || pos >= bytes.length) return false
      val b = bytes(pos) & 0xff
      if (b == 0xff) {
        if (pos + 1 >= bytes.length) { atMarker = true; return false }
        val nx = bytes(pos + 1) & 0xff
        if (nx == 0x00) {
          pos += 2
          acc = (acc << 8) | 0xff
          cnt += 8
          true
        } else {
          // a real marker (RST / EOI / next segment): entropy data ends
          atMarker = true
          false
        }
      } else {
        pos += 1
        acc = (acc << 8) | b
        cnt += 8
        true
      }
    }

    /** Next `n` bits MSB-first (n ≤ 16); 0 and trips `bad` on truncation. */
    def receive(n: Int): Int = {
      while (cnt < n) if (!fillByte()) { bad = true; return 0 }
      val r = (acc >>> (cnt - n)) & ((1 << n) - 1)
      cnt -= n
      r
    }

    /** Peek up to 8 bits without consuming (padded with 1s at stream end
      * — padding only ever feeds the lookahead of the FINAL code, whose
      * real bits are all present; consuming past the end still trips
      * `bad` through receive()).
      */
    def peek8(): Int = {
      while (cnt < 8 && fillByte()) {}
      if (cnt >= 8) (acc >>> (cnt - 8)) & 0xff
      else (((acc & ((1 << cnt) - 1)) << (8 - cnt)) | ((1 << (8 - cnt)) - 1)) & 0xff
    }

    def drop(n: Int): Unit = cnt -= n // only after a successful peek8 match

    /** Byte-align and consume an expected RSTm marker (T.81 F.2.1.3.1). */
    def restart(expectM: Int): Boolean = {
      cnt = 0; acc = 0
      if (!atMarker) {
        // skip to the marker if stuffing logic hasn't hit it yet
        while (pos < bytes.length && (bytes(pos) & 0xff) != 0xff) pos += 1
      }
      // T.81 B.1.1.2: any number of 0xFF FILL bytes may precede a marker
      // code — skip the run so only the last 0xFF pairs with RSTm
      // (ADVICE r17: rejecting fill here nulled valid streams)
      while (pos + 2 < bytes.length && (bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 1 >= bytes.length) return false
      if ((bytes(pos) & 0xff) != 0xff) return false
      val m = bytes(pos + 1) & 0xff
      if (m != 0xd0 + expectM) return false
      pos += 2
      atMarker = false
      true
    }

    def decodeHuff(t: Huff): Int = {
      val la = t.look(peek8())
      if (la >= 0) {
        val l = la >>> 8
        // a stream-end peek pads with 1s; a match that claims more bits
        // than actually remain is a truncated final code, not a symbol
        if (cnt < l) { bad = true; return -1 }
        drop(l)
        return la & 0xff
      }
      // slow path: lengths 9..16 (look==-1 guarantees no code of length
      // ≤ 8 matches this prefix) — extend the 8-bit prefix bit by bit
      var code = receive(8)
      if (bad) return -1
      var l = 8
      while (l < 16) {
        code = (code << 1) | receive(1)
        if (bad) return -1
        l += 1
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l) && code >= t.minCode(l))
          return t.syms(t.valPtr(l) + code - t.minCode(l)) & 0xff
      }
      bad = true
      -1
    }
  }

  /** EXTEND (T.81 F.2.2.1): map the s-bit magnitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Full decode to an interleaved-RGB raster; null on anything outside
    * the documented baseline scope or malformed.
    */
  def decodeRaster(bytes: Array[Byte]): Raster = {
    if (bytes.length < 4) return null
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return null

    // tables + frame state gathered on the marker walk
    val qt = new Array[Array[Int]](4) // entries kept in ZIG-ZAG order (as stored)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var restartInterval = 0

    var w = 0; var h = 0; var nComp = 0
    val compH = new Array[Int](4); val compV = new Array[Int](4)
    val compQ = new Array[Int](4); val compId = new Array[Int](4)
    // APP14 Adobe transform flag: -1 = no marker; 0 = CMYK (4-comp,
    // Adobe-inverted) / RGB (3-comp, out of scope); 1 = YCbCr; 2 = YCCK
    var adobeTransform = -1

    var pos = 2
    var sofSeen = false
    var progressive = false
    // progressive state: per-component natural-order coefficient
    // buffers accumulated across scans (MCU-padded block grids), plus
    // the grid geometry — allocated at the first SOS
    var coefs: Array[Array[Int]] = null
    var blockW: Array[Int] = null // MCU-padded block columns per comp
    var blockH: Array[Int] = null
    var hMaxP = 1; var vMaxP = 1
    // quant tables LATCHED at each component's first scan (reference
    // decoders bind tables then; reading them at EOI would let a
    // mid-frame DQT redefinition silently re-dequantize earlier scans)
    var compQt: Array[Array[Int]] = null
    // strictness floor for EOI: every component must have received its
    // DC FIRST scan (AC-only spectral data is fabrication, and a
    // truncated-then-EOI-patched stream must not render invented chroma)
    var dcSeen: Array[Boolean] = null

    while (true) {
      // markers may be preceded by fill bytes (B.1.1.2)
      while (pos < bytes.length && (bytes(pos) & 0xff) == 0xff &&
        pos + 1 < bytes.length && (bytes(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 1 >= bytes.length) return null
      if ((bytes(pos) & 0xff) != 0xff) return null
      val marker = bytes(pos + 1) & 0xff
      pos += 2
      marker match {
        case 0xd9 => // EOI
          if (progressive && coefs != null) {
            var c = 0
            while (c < nComp) {
              if (!dcSeen(c)) return null // a component never got its DC scan
              c += 1
            }
            return finishProgressive(
              w, h, nComp, compH, compV, compQt,
              coefs, blockW, blockH, hMaxP, vMaxP, adobeTransform)
          }
          return null // EOI before any (baseline) scan
        case m if m >= 0xe0 && m <= 0xef => // APPn
          if (pos + 2 > bytes.length) return null
          val alen = u16(bytes, pos)
          // APP14 "Adobe": version(2) flags0(2) flags1(2) transform(1)
          // after the 5-byte tag — the transform decides 4-component
          // color interpretation (CMYK vs YCCK) below
          if (m == 0xee && alen >= 2 + 12 && pos + 2 + 12 <= bytes.length &&
            bytes(pos + 2) == 'A' && bytes(pos + 3) == 'd' &&
            bytes(pos + 4) == 'o' && bytes(pos + 5) == 'b' &&
            bytes(pos + 6) == 'e')
            adobeTransform = bytes(pos + 13) & 0xff
          pos += alen
        case 0xfe => // COM
          if (pos + 2 > bytes.length) return null
          pos += u16(bytes, pos)
        case 0xdb => // DQT: one or more tables
          if (pos + 2 > bytes.length) return null
          val end = pos + u16(bytes, pos)
          if (end > bytes.length) return null
          var p = pos + 2
          while (p < end) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            if (tq > 3 || pq > 1) return null
            p += 1
            val t = new Array[Int](64)
            var k = 0
            if (pq == 0) {
              if (p + 64 > end) return null
              while (k < 64) { t(k) = bytes(p + k) & 0xff; k += 1 }
              p += 64
            } else {
              if (p + 128 > end) return null
              while (k < 64) { t(k) = u16(bytes, p + 2 * k); k += 1 }
              p += 128
            }
            qt(tq) = t
          }
          pos = end
        case 0xc4 => // DHT: one or more tables
          if (pos + 2 > bytes.length) return null
          val end = pos + u16(bytes, pos)
          if (end > bytes.length) return null
          var p = pos + 2
          while (p < end) {
            val tc = (bytes(p) & 0xff) >> 4
            val th = bytes(p) & 0x0f
            if (tc > 1 || th > 3) return null
            p += 1
            if (p + 16 > end) return null
            val counts = new Array[Int](16)
            var total = 0
            var i = 0
            while (i < 16) { counts(i) = bytes(p + i) & 0xff; total += counts(i); i += 1 }
            p += 16
            if (total > 256 || p + total > end) return null
            val syms = java.util.Arrays.copyOfRange(bytes, p, p + total)
            p += total
            val tab = new Huff(counts, syms)
            if (!tab.valid) return null // overfull canonical level
            if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
          }
          pos = end
        case 0xdd => // DRI
          if (pos + 4 > bytes.length) return null
          if (u16(bytes, pos) != 4) return null
          restartInterval = u16(bytes, pos + 2)
          pos += 4
        case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
          if (sofSeen) return null
          sofSeen = true
          progressive = marker == 0xc2
          if (pos + 2 > bytes.length) return null
          val end = pos + u16(bytes, pos)
          if (end > bytes.length) return null
          var p = pos + 2
          if (p + 6 > end) return null
          val precision = bytes(p) & 0xff
          h = u16(bytes, p + 1)
          w = u16(bytes, p + 3)
          nComp = bytes(p + 5) & 0xff
          p += 6
          if (precision != 8) return null
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return null
          if (nComp != 1 && nComp != 3 && nComp != 4) return null
          var c = 0
          while (c < nComp) {
            if (p + 3 > end) return null
            compId(c) = bytes(p) & 0xff
            val hv = bytes(p + 1) & 0xff
            compH(c) = hv >> 4
            compV(c) = hv & 0x0f
            compQ(c) = bytes(p + 2) & 0xff
            if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 || compV(c) > 4)
              return null
            if (compQ(c) > 3) return null
            p += 3
            c += 1
          }
          pos = end
        case m if (m >= 0xc1 && m <= 0xcf) && m != 0xc4 && m != 0xc8 =>
          return null // arithmetic / hierarchical / 12-bit (SOF0/2 matched above)
        case 0xda => // SOS: baseline decodes and returns; progressive accumulates
          if (!sofSeen) return null
          if (pos + 2 > bytes.length) return null
          val end = pos + u16(bytes, pos)
          if (end > bytes.length) return null
          var p = pos + 2
          if (p >= end) return null
          val ns = bytes(p) & 0xff
          p += 1
          if (ns < 1 || ns > nComp) return null
          val scanComp = new Array[Int](ns) // frame component indices
          val scanDc = new Array[Huff](ns)
          val scanAc = new Array[Huff](ns)
          var s = 0
          var prevCi = -1
          while (s < ns) {
            if (p + 2 > end) return null
            val cs = bytes(p) & 0xff
            var ci = -1
            var c = 0
            while (c < nComp) { if (compId(c) == cs) ci = c; c += 1 }
            // components appear as a subset in frame order (B.2.3)
            if (ci <= prevCi) return null
            prevCi = ci
            scanComp(s) = ci
            val tdta = bytes(p + 1) & 0xff
            val td = tdta >> 4
            val ta = tdta & 0x0f
            if (td > 3 || ta > 3) return null
            scanDc(s) = dcTabs(td)
            scanAc(s) = acTabs(ta)
            p += 2
            s += 1
          }
          if (p + 3 > end) return null
          val ss = bytes(p) & 0xff
          val se = bytes(p + 1) & 0xff
          val ahal = bytes(p + 2) & 0xff
          val ah = ahal >> 4
          val al = ahal & 0x0f
          if (!progressive) {
            // baseline: one full interleaved scan, Ss=0 Se=63 Ah=Al=0
            if (ns != nComp) return null
            if (ss != 0 || se != 63 || ahal != 0) return null
            s = 0
            while (s < ns) {
              if (scanComp(s) != s) return null
              if (scanDc(s) == null || scanAc(s) == null) return null
              if (qt(compQ(s)) == null) return null
              s += 1
            }
            return decodeScan(
              bytes, end, w, h, nComp, compH, compV, compQ, qt,
              scanDc, scanAc, restartInterval, adobeTransform)
          }
          // progressive (T.81 B.2.3 + G.1): DC scans have Ss=Se=0 and
          // may interleave; AC scans are single-component with
          // 1 ≤ Ss ≤ Se ≤ 63; successive approximation refines one bit
          // at a time (Ah = Al + 1 on refinements)
          if (ss == 0 && se != 0) return null
          if (ss > 0 && (ns != 1 || se < ss || se > 63)) return null
          if (ah != 0 && ah != al + 1) return null
          if (al > 13) return null // T.81 G.1.1.1.2 bound
          if (coefs == null) {
            var c = 0
            while (c < nComp) {
              if (compH(c) > hMaxP) hMaxP = compH(c)
              if (compV(c) > vMaxP) vMaxP = compV(c)
              c += 1
            }
            // a single-component FRAME is full-resolution regardless of
            // its sampling factors (same normalization as baseline)
            if (nComp == 1) { compH(0) = 1; compV(0) = 1; hMaxP = 1; vMaxP = 1 }
            val mcusX = (w + 8 * hMaxP - 1) / (8 * hMaxP)
            val mcusY = (h + 8 * vMaxP - 1) / (8 * vMaxP)
            coefs = new Array[Array[Int]](nComp)
            blockW = new Array[Int](nComp)
            blockH = new Array[Int](nComp)
            compQt = new Array[Array[Int]](nComp)
            dcSeen = new Array[Boolean](nComp)
            var bytesTotal = 0L
            c = 0
            while (c < nComp) {
              blockW(c) = mcusX * compH(c)
              blockH(c) = mcusY * compV(c)
              bytesTotal += blockW(c).toLong * blockH(c) * 64 * 4
              // 4L: a full-resolution 4-component (CMYK) frame at the
              // pixel cap is IN scope — a 3L bound would null progressive
              // CMYK images the baseline path decodes (review r18)
              if (bytesTotal > 4L * MaxPixels * 4) return null
              coefs(c) = new Array[Int](blockW(c) * blockH(c) * 64)
              c += 1
            }
          }
          // latch each scanned component's quant table at its FIRST scan
          s = 0
          while (s < ns) {
            val c = scanComp(s)
            if (compQt(c) == null) {
              val q = qt(compQ(c))
              if (q == null) return null // scan before its table arrived
              compQt(c) = q.clone()
            }
            if (ss == 0 && ah == 0) dcSeen(c) = true
            s += 1
          }
          val next = decodeProgScan(
            bytes, end, w, h, compH, compV, hMaxP, vMaxP,
            scanComp, scanDc, scanAc, ss, se, ah, al,
            restartInterval, coefs, blockW, blockH)
          if (next < 0) return null
          pos = next
        case _ => return null // DNL/DAC/unknown: out of scope
      }
    }
    null // unreachable
  }

  /** The entropy-coded scan: MCU loop → blocks → IDCT into padded
    * component planes → upsample + color-convert into the RGB raster.
    */
  private def decodeScan(
      bytes: Array[Byte], scanStart: Int,
      w: Int, h: Int, nComp: Int,
      compH: Array[Int], compV: Array[Int], compQ: Array[Int],
      qt: Array[Array[Int]], scanDc: Array[Huff], scanAc: Array[Huff],
      restartInterval: Int, adobeTransform: Int): Raster = {
    // A single-component scan is NON-INTERLEAVED (T.81 A.2.3): its MCU
    // is ONE data unit and blocks cover the component at full frame
    // resolution in raster order — the frame's sampling factors do NOT
    // scale the grid. Decoding it with the interleaved MCU layout would
    // place every Huffman-valid block at the wrong raster position
    // (silently scrambled pixels, not a decode failure). Normalizing
    // the factors to 1x1 makes the interleaved code path below compute
    // exactly the non-interleaved grid.
    if (nComp == 1) { compH(0) = 1; compV(0) = 1 }
    var hMax = 1; var vMax = 1
    var c = 0
    while (c < nComp) {
      if (compH(c) > hMax) hMax = compH(c)
      if (compV(c) > vMax) vMax = compV(c)
      c += 1
    }
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // padded component planes (MCU-aligned)
    val planeW = new Array[Int](4)
    val planes = new Array[Array[Byte]](4)
    var planeBytes = 0L
    c = 0
    while (c < nComp) {
      planeW(c) = mcusX * compH(c) * 8
      val ph = mcusY * compV(c) * 8
      planeBytes += planeW(c).toLong * ph
      if (planeBytes > 4L * MaxPixels * 4) return null // padded-plane cap (4 comps in scope)
      planes(c) = new Array[Byte](planeW(c) * ph)
      c += 1
    }

    val br = new BitReader(bytes, scanStart)
    val pred = new Array[Int](4)
    val coef = new Array[Double](64)
    val tmp = new Array[Double](64)

    var mcu = 0
    val nMcus = mcusX * mcusY
    var rstExpect = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart(rstExpect)) return null
        rstExpect = (rstExpect + 1) & 7
        java.util.Arrays.fill(pred, 0)
      }
      val mcuX = mcu % mcusX
      val mcuY = mcu / mcusX
      c = 0
      while (c < nComp) {
        val q = qt(compQ(c))
        var by = 0
        while (by < compV(c)) {
          var bx = 0
          while (bx < compH(c)) {
            // --- one 8×8 block: Huffman → dequant (zig-zag) ---
            java.util.Arrays.fill(coef, 0.0)
            val t = br.decodeHuff(scanDc(c))
            if (br.bad || t < 0 || t > 11) return null
            val diff = extend(br.receive(t), t)
            if (br.bad) return null
            pred(c) += diff
            coef(0) = pred(c).toDouble * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = br.decodeHuff(scanAc(c))
              if (br.bad || rs < 0) return null
              val r = rs >> 4
              val sz = rs & 0x0f
              if (sz == 0) {
                if (r == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += r
                if (k > 63) return null
                coef(ZigZag(k)) = extend(br.receive(sz), sz).toDouble * q(k)
                if (br.bad) return null
                k += 1
              }
            }
            idctBlock(coef, tmp, planes(c), planeW(c),
              (mcuX * compH(c) + bx) * 8, (mcuY * compV(c) + by) * 8)
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }

    rasterFromPlanes(planes, planeW, w, h, nComp, compH, compV, hMax, vMax,
      adobeTransform)
  }

  /** One progressive scan (T.81 G.1.2), accumulated into the
    * per-component natural-order coefficient buffers:
    *
    *   - DC first (Ss=0, Ah=0): diff-coded like baseline, the decoded
    *     prediction sum stored `<< Al`; may interleave components (the
    *     MCU grid) or cover one component's own block grid.
    *   - DC refinement (Ah>0): one raw bit per block ORed in at Al.
    *   - AC first (Ss≥1, Ah=0, single component): the baseline RLE plus
    *     EOBn run codes — EOBRUN = 2^r + extra − 1 further all-done
    *     blocks.
    *   - AC refinement: the correction-bit algorithm — every NONZERO
    *     history coefficient passed (including during EOB runs) reads
    *     one bit, adding ±2^Al if not already set at that magnitude;
    *     new coefficients arrive as ±2^Al with s ≡ 1. An insert whose
    *     zero-history slot does not exist before Se is DROPPED (strict
    *     bound; reference decoders overrun into a padded order table).
    *
    * Returns the next marker position, or -1 on malformed/truncated.
    */
  private def decodeProgScan(
      bytes: Array[Byte], scanStart: Int,
      w: Int, h: Int, compH: Array[Int], compV: Array[Int],
      hMax: Int, vMax: Int,
      scanComp: Array[Int], scanDc: Array[Huff], scanAc: Array[Huff],
      ss: Int, se: Int, ah: Int, al: Int,
      restartInterval: Int,
      coefs: Array[Array[Int]], blockW: Array[Int], blockH: Array[Int]): Int = {
    val ns = scanComp.length
    val br = new BitReader(bytes, scanStart)
    val pred = new Array[Int](ns)
    var eobrun = 0L
    val p1 = 1 << al
    val m1 = -(1 << al)

    // table presence by scan kind
    var s = 0
    while (s < ns) {
      if (ss == 0 && ah == 0 && scanDc(s) == null) return -1
      if (ss > 0 && scanAc(s) == null) return -1
      s += 1
    }

    // ---- per-block decoders over the shared coefficient buffer ----
    def dcFirst(si: Int, base: Int): Boolean = {
      val t = br.decodeHuff(scanDc(si))
      if (br.bad || t < 0 || t > 11) return false
      val diff = extend(br.receive(t), t)
      if (br.bad) return false
      pred(si) += diff
      coefs(scanComp(si))(base) = pred(si) << al
      true
    }
    def dcRefine(si: Int, base: Int): Boolean = {
      val bit = br.receive(1)
      if (br.bad) return false
      if (bit != 0) coefs(scanComp(si))(base) |= p1
      true
    }
    def acFirst(si: Int, base: Int): Boolean = {
      val cf = coefs(scanComp(si))
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = br.decodeHuff(scanAc(si))
        if (br.bad || rs < 0) return false
        val r = rs >> 4
        val sz = rs & 0x0f
        if (sz != 0) {
          k += r
          if (k > se) return false
          cf(base + ZigZag(k)) = extend(br.receive(sz), sz) << al
          if (br.bad) return false
          k += 1
        } else if (r == 15) {
          k += 16 // ZRL
        } else {
          eobrun = (1L << r) - 1
          if (r > 0) {
            eobrun += br.receive(r)
            if (br.bad) return false
          }
          return true
        }
      }
      true
    }
    def acRefine(si: Int, base: Int): Boolean = {
      val cf = coefs(scanComp(si))
      var k = ss
      if (eobrun == 0) {
        var ended = false
        while (k <= se && !ended) {
          val rs = br.decodeHuff(scanAc(si))
          if (br.bad || rs < 0) return false
          var r = rs >> 4
          val sz = rs & 0x0f
          var insert = 0
          if (sz == 0) {
            if (r < 15) {
              eobrun = 1L << r
              if (r > 0) {
                eobrun += br.receive(r)
                if (br.bad) return false
              }
              ended = true // remaining band handled by the EOB tail below
            }
            // r == 15 (ZRL): pass 16 zero-history positions
          } else {
            if (sz != 1) return false // refinement inserts are ±1
            val bit = br.receive(1)
            if (br.bad) return false
            insert = if (bit != 0) p1 else m1
          }
          if (!ended) {
            var placed = false
            while (k <= se && !placed) {
              val idx = base + ZigZag(k)
              val c0 = cf(idx)
              if (c0 != 0) {
                val bit = br.receive(1)
                if (br.bad) return false
                if (bit != 0 && (c0 & p1) == 0)
                  cf(idx) = c0 + (if (c0 >= 0) p1 else m1)
              } else if (r == 0) {
                if (insert != 0) cf(idx) = insert
                placed = true
              } else r -= 1
              k += 1
            }
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          val idx = base + ZigZag(k)
          val c0 = cf(idx)
          if (c0 != 0) {
            val bit = br.receive(1)
            if (br.bad) return false
            if (bit != 0 && (c0 & p1) == 0)
              cf(idx) = c0 + (if (c0 >= 0) p1 else m1)
          }
          k += 1
        }
        eobrun -= 1
      }
      true
    }
    def block(si: Int, bx: Int, by: Int): Boolean = {
      val base = (by * blockW(scanComp(si)) + bx) * 64
      if (ss == 0) {
        if (ah == 0) dcFirst(si, base) else dcRefine(si, base)
      } else {
        if (ah == 0) acFirst(si, base) else acRefine(si, base)
      }
    }

    // ---- MCU walk: interleaved (ns > 1) or the component's own grid ----
    var rstExpect = 0
    def atRestart(mcu: Int): Boolean =
      restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0
    def restart(): Boolean = {
      if (!br.restart(rstExpect)) return false
      rstExpect = (rstExpect + 1) & 7
      java.util.Arrays.fill(pred, 0)
      eobrun = 0
      true
    }

    if (ns > 1) {
      val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
      val nMcus = mcusX * mcusY
      var mcu = 0
      while (mcu < nMcus) {
        if (atRestart(mcu) && !restart()) return -1
        val mcuX = mcu % mcusX
        val mcuY = mcu / mcusX
        var si = 0
        while (si < ns) {
          val c = scanComp(si)
          var by = 0
          while (by < compV(c)) {
            var bx = 0
            while (bx < compH(c)) {
              if (!block(si, mcuX * compH(c) + bx, mcuY * compV(c) + by))
                return -1
              bx += 1
            }
            by += 1
          }
          si += 1
        }
        mcu += 1
      }
    } else {
      // single-component scan: the component's UNPADDED block grid in
      // raster order (G.1: one data unit per MCU — restart counts blocks)
      val c = scanComp(0)
      val bw = ((w * compH(c) + hMax - 1) / hMax + 7) / 8
      val bh = ((h * compV(c) + vMax - 1) / vMax + 7) / 8
      var mcu = 0
      val nMcus = bw * bh
      while (mcu < nMcus) {
        if (atRestart(mcu) && !restart()) return -1
        if (!block(0, mcu % bw, mcu / bw)) return -1
        mcu += 1
      }
    }

    // advance to the next marker through any remaining stuffed bytes
    var pos = br.pos
    while (pos + 1 < bytes.length) {
      if ((bytes(pos) & 0xff) == 0xff) {
        if ((bytes(pos + 1) & 0xff) == 0x00) pos += 2
        else return pos
      } else pos += 1
    }
    -1 // ran off the payload without a marker (no EOI): truncated
  }

  /** Progressive completion at EOI: dequantize every accumulated block
    * (natural-order coefficients × the component's natural-order quant
    * table), IDCT into the padded planes, then the shared upsample +
    * color-convert tail.
    */
  private def finishProgressive(
      w: Int, h: Int, nComp: Int,
      compH: Array[Int], compV: Array[Int], compQt: Array[Array[Int]],
      coefs: Array[Array[Int]], blockW: Array[Int], blockH: Array[Int],
      hMax: Int, vMax: Int, adobeTransform: Int): Raster = {
    val planes = new Array[Array[Byte]](4)
    val planeW = new Array[Int](4)
    val coefD = new Array[Double](64)
    val tmp = new Array[Double](64)
    val qNat = new Array[Int](64)
    var c = 0
    while (c < nComp) {
      val q = compQt(c) // latched at the component's first scan
      if (q == null) return null
      var k = 0
      while (k < 64) { qNat(ZigZag(k)) = q(k); k += 1 }
      planeW(c) = blockW(c) * 8
      planes(c) = new Array[Byte](planeW(c) * blockH(c) * 8)
      val cf = coefs(c)
      var by = 0
      while (by < blockH(c)) {
        var bx = 0
        while (bx < blockW(c)) {
          val base = (by * blockW(c) + bx) * 64
          var i = 0
          while (i < 64) { coefD(i) = cf(base + i).toDouble * qNat(i); i += 1 }
          idctBlock(coefD, tmp, planes(c), planeW(c), bx * 8, by * 8)
          bx += 1
        }
        by += 1
      }
      c += 1
    }
    rasterFromPlanes(planes, planeW, w, h, nComp, compH, compV, hMax, vMax,
      adobeTransform)
  }

  /** Separable 2-D IDCT (A.3.3) of one dequantized block into the
    * component plane at (ox, oy), with level shift + clamp — shared by
    * the baseline per-MCU path and the progressive completion pass.
    */
  private def idctBlock(
      coef: Array[Double], tmp: Array[Double],
      plane: Array[Byte], pw: Int, ox: Int, oy: Int): Unit = {
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var u = 0
        while (u < 8) { sum += coef(v * 8 + u) * CS(u)(x); u += 1 }
        tmp(v * 8 + x) = sum
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      val rowOff = (oy + y) * pw + ox
      while (x < 8) {
        var sum = 0.0
        var vv = 0
        while (vv < 8) { sum += tmp(vv * 8 + x) * CS(vv)(y); vv += 1 }
        val px = math.round(sum + 128.0).toInt
        plane(rowOff + x) =
          (if (px < 0) 0 else if (px > 255) 255 else px).toByte
        x += 1
      }
      y += 1
    }
  }

  /** Shared completion tail (baseline + progressive): upsample the
    * decoded component planes and color-convert into the RGB raster.
    *
    * Color interpretation by component count + APP14 Adobe transform:
    *   - 1 comp: grayscale replicated to RGB;
    *   - 3 comp, transform 1 or no marker: JFIF YCbCr; transform 0
    *     (Adobe RGB) or 2 → null (out of scope / invalid);
    *   - 4 comp, transform 2 (YCCK): YCbCr→R'G'B' per JFIF, then
    *     RGB = R'G'B' · k / 255 with the stored (Adobe-INVERTED) K —
    *     Adobe writers store CMYK inverted, so the stored values ARE
    *     the ink-free fractions;
    *   - 4 comp, transform 0 (Adobe CMYK, inverted): RGB = c·k / 255
    *     per channel on the stored values;
    *   - 4 comp, NO Adobe marker: plain (non-inverted) CMYK:
    *     RGB = (255−C)(255−K) / 255;
    *   - 4 comp, transform 1 → null (invalid combination).
    * The ·/255 products round half-up for determinism.
    */
  private def rasterFromPlanes(
      planes: Array[Array[Byte]], planeW: Array[Int],
      w: Int, h: Int, nComp: Int,
      compH: Array[Int], compV: Array[Int], hMax: Int, vMax: Int,
      adobeTransform: Int): Raster = {
    var c = 0
    // --- upsample (replication) + color convert ---
    val rgb = new Array[Byte](w * h * 3)
    if (nComp == 1) {
      val plane = planes(0)
      val pw = planeW(0)
      var y = 0
      var o = 0
      while (y < h) {
        var x = 0
        val rowOff = y * pw
        while (x < w) {
          val g = plane(rowOff + x)
          rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
          o += 3
          x += 1
        }
        y += 1
      }
    } else {
      // Per-component upsampled planes at full resolution, via CENTERED
      // bilinear interpolation: output x samples component coordinate
      // (x + 0.5)·hi/hMax − 0.5 — at factor 2 this is exactly the
      // classic triangle-filter weights (3:1 horizontally, 9:3:3:1 for
      // 2×2), the quality upsampling real decoders use; at factor 1 it
      // is the identity. Interpolation clamps to the component's TRUE
      // sample extent (ceil(w·hi/hMax)), not the MCU-padded plane — the
      // padding columns are encoder fill, not image.
      if (nComp == 3 && (adobeTransform == 0 || adobeTransform == 2))
        return null // Adobe RGB (scope) / YCCK needs 4 components
      if (nComp == 4 && (adobeTransform == 1 ||
        (adobeTransform > 2 && adobeTransform != -1))) return null
      val up = new Array[Array[Byte]](4)
      c = 0
      while (c < nComp) {
        if (compH(c) == hMax && compV(c) == vMax) {
          // full-resolution component: direct copy out of the plane
          val plane = planes(c); val pw = planeW(c)
          val o = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            System.arraycopy(plane, y * pw, o, y * w, w)
            y += 1
          }
          up(c) = o
        } else {
          up(c) = upsampleBilinear(
            planes(c), planeW(c),
            (w * compH(c) + hMax - 1) / hMax, (h * compV(c) + vMax - 1) / vMax,
            w, h, compH(c), compV(c), hMax, vMax)
        }
        c += 1
      }
      val n0 = w * h
      var i = 0
      var o = 0
      if (nComp == 3) {
        val yU = up(0); val cbU = up(1); val crU = up(2)
        while (i < n0) {
          val yy = yU(i) & 0xff
          val cb = (cbU(i) & 0xff) - 128
          val cr = (crU(i) & 0xff) - 128
          // JFIF 1.02 §7 with round-half-up and clamp
          var r = math.round(yy + 1.402 * cr).toInt
          var g = math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt
          var b = math.round(yy + 1.772 * cb).toInt
          if (r < 0) r = 0 else if (r > 255) r = 255
          if (g < 0) g = 0 else if (g > 255) g = 255
          if (b < 0) b = 0 else if (b > 255) b = 255
          rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = b.toByte
          o += 3
          i += 1
        }
      } else { // nComp == 4: CMYK family (see scaladoc contract)
        val c0 = up(0); val c1 = up(1); val c2 = up(2); val kU = up(3)
        val ycck = adobeTransform == 2
        val plain = adobeTransform == -1 // no Adobe marker: non-inverted
        while (i < n0) {
          val k = if (plain) 255 - (kU(i) & 0xff) else kU(i) & 0xff
          var r = 0; var g = 0; var b = 0
          if (ycck) {
            val yy = c0(i) & 0xff
            val cb = (c1(i) & 0xff) - 128
            val cr = (c2(i) & 0xff) - 128
            r = math.round(yy + 1.402 * cr).toInt
            g = math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt
            b = math.round(yy + 1.772 * cb).toInt
            if (r < 0) r = 0 else if (r > 255) r = 255
            if (g < 0) g = 0 else if (g > 255) g = 255
            if (b < 0) b = 0 else if (b > 255) b = 255
          } else if (plain) {
            r = 255 - (c0(i) & 0xff); g = 255 - (c1(i) & 0xff)
            b = 255 - (c2(i) & 0xff)
          } else { // Adobe CMYK: stored values are already inverted
            r = c0(i) & 0xff; g = c1(i) & 0xff; b = c2(i) & 0xff
          }
          rgb(o) = ((r * k + 127) / 255).toByte
          rgb(o + 1) = ((g * k + 127) / 255).toByte
          rgb(o + 2) = ((b * k + 127) / 255).toByte
          o += 3
          i += 1
        }
      }
    }
    new Raster(w, h, nComp, rgb)
  }

  /** Centered bilinear plane upsampling, 12-bit fixed-point weights.
    * `srcW`/`srcH` is the component's true sample extent inside the
    * padded `plane` (row stride `planeStride`); output is `w`×`h`.
    */
  private def upsampleBilinear(
      plane: Array[Byte], planeStride: Int, srcW: Int, srcH: Int,
      w: Int, h: Int, hi: Int, vi: Int, hMax: Int, vMax: Int): Array[Byte] = {
    val F = 12 // fixed-point fraction bits
    val one = 1 << F
    // per-column taps
    val ix0 = new Array[Int](w); val ix1 = new Array[Int](w); val wx = new Array[Int](w)
    var x = 0
    while (x < w) {
      val cx = ((2 * x + 1).toDouble * hi / hMax - 1.0) / 2.0
      if (cx <= 0) { ix0(x) = 0; ix1(x) = 0; wx(x) = 0 }
      else if (cx >= srcW - 1) { ix0(x) = srcW - 1; ix1(x) = srcW - 1; wx(x) = 0 }
      else {
        val f = math.floor(cx)
        ix0(x) = f.toInt; ix1(x) = f.toInt + 1
        wx(x) = ((cx - f) * one + 0.5).toInt
      }
      x += 1
    }
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val cy = ((2 * y + 1).toDouble * vi / vMax - 1.0) / 2.0
      var iy0 = 0; var iy1 = 0; var wyF = 0
      if (cy <= 0) { iy0 = 0; iy1 = 0 }
      else if (cy >= srcH - 1) { iy0 = srcH - 1; iy1 = srcH - 1 }
      else {
        val f = math.floor(cy)
        iy0 = f.toInt; iy1 = f.toInt + 1
        wyF = ((cy - f) * one + 0.5).toInt
      }
      val r0 = iy0 * planeStride
      val r1 = iy1 * planeStride
      val oRow = y * w
      x = 0
      while (x < w) {
        val wxF = wx(x)
        val p00 = plane(r0 + ix0(x)) & 0xff
        val p01 = plane(r0 + ix1(x)) & 0xff
        val p10 = plane(r1 + ix0(x)) & 0xff
        val p11 = plane(r1 + ix1(x)) & 0xff
        val top = (one - wxF).toLong * p00 + wxF.toLong * p01
        val bot = (one - wxF).toLong * p10 + wxF.toLong * p11
        val v = (((one - wyF).toLong * top + wyF.toLong * bot) + (1L << (2 * F - 1))) >> (2 * F)
        out(oRow + x) = v.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Stats row (the shared decoder convention) from a full decode. */
  def decode(bytes: Array[Byte]): InternalRow = {
    val r = decodeRaster(bytes)
    if (r == null) return null
    var sr = 0L; var sg = 0L; var sb = 0L
    val n0 = r.w * r.h
    var i = 0
    while (i < n0) {
      sr += r.rgb(3 * i) & 0xff
      sg += r.rgb(3 * i + 1) & 0xff
      sb += r.rgb(3 * i + 2) & 0xff
      i += 1
    }
    val hx = "0123456789abcdef"
    val sbuf = new java.lang.StringBuilder(24)
    var ty = 0
    while (ty < 2) {
      var tx = 0
      while (tx < 2) {
        val p = 3 * (((ty * r.h) / 2) * r.w + (tx * r.w) / 2)
        var k = 0
        while (k < 3) {
          val v = r.rgb(p + k) & 0xff
          sbuf.append(hx.charAt((v >> 4) & 15)).append(hx.charAt(v & 15))
          k += 1
        }
        tx += 1
      }
      ty += 1
    }
    new GenericInternalRow(Array[Any](
      r.w, r.h, r.nComp, r.w.toLong * r.h, sr, sg, sb,
      UTF8String.fromString(sbuf.toString)))
  }

  def apply(bytes: Column): Column =
    ColumnBridge.toColumn(JpegDecode(ColumnBridge.toExpression(bytes)))
}
