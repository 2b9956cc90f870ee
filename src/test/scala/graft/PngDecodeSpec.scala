package graft

import org.apache.spark.sql.functions._

import graft.functions.PngDecode
import graft.pipeline.Multimodal

/** Real PNG decode: the from-scratch Inflater+unfilter kernel against
  * (a) a REFERENCE encoder written here that exercises every PNG filter
  * type explicitly, (b) `javax.imageio` — the independent encoder the
  * gate's generator uses — and (c) the null guards for everything
  * outside the kernel's declared scope (interlace, odd bit depths,
  * palette, corrupt CRCs, truncation, geometry lies).
  */
class PngDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def decode(bytes: Array[Byte]) = {
    val r = Seq(Tuple1(bytes)).toDF("b")
      .select(PngDecode(col("b")).as("d")).head()
    if (r.isNullAt(0)) None else Some(r.getStruct(0))
  }

  // ---- reference encoder: deliberately minimal and filter-explicit ----

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    val t = tag.getBytes("US-ASCII")
    crc.update(t); crc.update(data)
    val len = data.length
    Array[Byte](
      (len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte) ++
      t ++ data ++ {
        val c = crc.getValue
        Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte)
      }
  }

  private def ihdr(
      w: Int, h: Int, bitDepth: Int = 8, colorType: Int = 2,
      interlace: Int = 0): Array[Byte] =
    chunk("IHDR", Array[Byte](
      (w >>> 24).toByte, (w >>> 16).toByte, (w >>> 8).toByte, w.toByte,
      (h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte, h.toByte,
      bitDepth.toByte, colorType.toByte, 0, 0, interlace.toByte))

  private val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Filter the raster with the GIVEN per-row filter types (the forward
    * transforms PNG spec 9 defines), deflate, and wrap in chunks.
    */
  private def buildPng(
      w: Int, h: Int, bpp: Int, raster: Array[Byte], filters: Seq[Int],
      splitIdat: Boolean = false, extraRasterRows: Int = 0): Array[Byte] = {
    val stride = w * bpp
    val rows = h + extraRasterRows
    val filtered = new Array[Byte](rows * (1 + stride))
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    for (row <- 0 until rows) {
      val f = filters(row % filters.size)
      filtered(row * (1 + stride)) = f.toByte
      for (x <- 0 until stride) {
        val cur = raster(row * stride + x) & 0xff
        val left = if (x >= bpp) raster(row * stride + x - bpp) & 0xff else 0
        val above = if (row > 0) raster((row - 1) * stride + x) & 0xff else 0
        val diag = if (row > 0 && x >= bpp) raster((row - 1) * stride + x - bpp) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - above
          case 3 => cur - ((left + above) >> 1)
          case 4 => cur - paeth(left, above, diag)
        }
        filtered(row * (1 + stride) + 1 + x) = v.toByte
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered); deflater.finish()
    val buf = new Array[Byte](filtered.length + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val z = java.util.Arrays.copyOf(buf, n)
    val colorType = if (bpp == 4) 6 else 2
    val idat =
      if (!splitIdat) chunk("IDAT", z)
      else {
        val (a, b) = z.splitAt(math.max(1, z.length / 2))
        chunk("IDAT", a) ++ chunk("IDAT", b)
      }
    sig ++ ihdr(w, h, colorType = colorType) ++ idat ++ chunk("IEND", Array.empty)
  }

  /** Typed variant of [[buildPng]]: any color type / channel count, with
    * optional PLTE and tRNS chunks between IHDR and IDAT — the reference
    * encoder for the palette/gray/gray+alpha coverage.
    */
  private def buildPngTyped(
      w: Int, h: Int, colorType: Int, channels: Int, raster: Array[Byte],
      filters: Seq[Int], plte: Option[Array[Byte]] = None,
      trns: Option[Array[Byte]] = None, bitDepth: Int = 8): Array[Byte] = {
    // `channels` is the BYTE distance filters use — callers pass
    // samples·bytesPerSample (so ch·2 at depth 16), and `raster` is the
    // already-byte-serialized scanline data (big-endian at depth 16)
    val stride = w * channels
    val filtered = new Array[Byte](h * (1 + stride))
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    for (row <- 0 until h) {
      val f = filters(row % filters.size)
      filtered(row * (1 + stride)) = f.toByte
      for (x <- 0 until stride) {
        val cur = raster(row * stride + x) & 0xff
        val left = if (x >= channels) raster(row * stride + x - channels) & 0xff else 0
        val above = if (row > 0) raster((row - 1) * stride + x) & 0xff else 0
        val diag =
          if (row > 0 && x >= channels) raster((row - 1) * stride + x - channels) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - above
          case 3 => cur - ((left + above) >> 1)
          case 4 => cur - paeth(left, above, diag)
        }
        filtered(row * (1 + stride) + 1 + x) = v.toByte
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered); deflater.finish()
    val buf = new Array[Byte](filtered.length + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val z = java.util.Arrays.copyOf(buf, n)
    sig ++ ihdr(w, h, bitDepth = bitDepth, colorType = colorType) ++
      plte.map(p => chunk("PLTE", p)).getOrElse(Array.empty[Byte]) ++
      trns.map(t => chunk("tRNS", t)).getOrElse(Array.empty[Byte]) ++
      chunk("IDAT", z) ++ chunk("IEND", Array.empty)
  }

  private def sums(raster: Array[Byte], bpp: Int): (Long, Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L; var a = 0L
    var i = 0
    while (i < raster.length) {
      r += raster(i) & 0xff; g += raster(i + 1) & 0xff; b += raster(i + 2) & 0xff
      if (bpp == 4) a += raster(i + 3) & 0xff
      i += bpp
    }
    (r, g, b, a)
  }

  test("every filter type round-trips against the reference encoder") {
    val w = 5; val h = 5; val bpp = 3
    val raster = Array.tabulate(w * h * bpp)(i => ((i * 37 + 11) % 256).toByte)
    val (er, eg, eb, _) = sums(raster, bpp)
    for (f <- 0 to 4) {
      val d = decode(buildPng(w, h, bpp, raster, Seq(f)))
        .getOrElse(fail(s"filter $f: decoded to null"))
      assert((d.getInt(0), d.getInt(1), d.getInt(2)) === ((w, h, 2)), s"filter $f")
      assert((d.getLong(4), d.getLong(5), d.getLong(6)) === ((er, eg, eb)), s"filter $f")
      assert(d.isNullAt(7), s"filter $f: RGB must have null sum_a")
    }
    // mixed filters across rows (the adaptive-encoder shape)
    val mixed = decode(buildPng(w, h, bpp, raster, Seq(0, 1, 2, 3, 4))).get
    assert((mixed.getLong(4), mixed.getLong(5), mixed.getLong(6)) === ((er, eg, eb)))
  }

  test("RGBA: alpha sums exactly; thumb stays RGB-only on the defined grid") {
    val w = 4; val h = 3; val bpp = 4
    val raster = Array.tabulate(w * h * bpp)(i => ((i * 53 + 7) % 256).toByte)
    val (er, eg, eb, ea) = sums(raster, bpp)
    val d = decode(buildPng(w, h, bpp, raster, Seq(4))).get
    assert(d.getInt(2) === 6)
    assert((d.getLong(4), d.getLong(5), d.getLong(6), d.getLong(7)) === ((er, eg, eb, ea)))
    // thumb (ty,tx) -> row (ty*h)/2, col (tx*w)/2 = rows {0,1}, cols {0,2}
    val expected = Seq((0, 0), (0, 2), (1, 0), (1, 2))
      .flatMap { case (r, c) =>
        raster.slice(bpp * (r * w + c), bpp * (r * w + c) + 3).toSeq }
      .map(b => f"${b & 0xff}%02x").mkString
    assert(d.getString(8) === expected)
  }

  test("the zlib stream split across several IDAT chunks decodes") {
    val raster = Array.tabulate(4 * 4 * 3)(i => (i * 3).toByte)
    val whole = decode(buildPng(4, 4, 3, raster, Seq(1))).get
    val split = decode(buildPng(4, 4, 3, raster, Seq(1), splitIdat = true)).get
    assert(whole.toSeq === split.toSeq)
  }

  test("javax.imageio round-trip: RGB and RGBA md5-hex rasters (the gate's generator)") {
    // the raster definition the gate uses: ASCII hex chars
    val hex = "0123456789abcdef" * 11
    for (rgba <- Seq(false, true)) {
      val bpp = if (rgba) 4 else 3
      val w = 7; val h = 6
      val px = hex.substring(0, w * h * bpp)
      val payload = Multimodal.encodeRaster("png", w, h, rgba, px)
      val d = decode(payload).getOrElse(fail(s"rgba=$rgba: imageio png decoded to null"))
      val raster = px.getBytes("US-ASCII")
      val (er, eg, eb, ea) = sums(raster, bpp)
      assert((d.getInt(0), d.getInt(1)) === ((w, h)))
      assert(d.getInt(2) === (if (rgba) 6 else 2))
      assert((d.getLong(4), d.getLong(5), d.getLong(6)) === ((er, eg, eb)))
      if (rgba) assert(d.getLong(7) === ea) else assert(d.isNullAt(7))
    }
  }

  test("null guards: scope, truncation, corruption, geometry lies") {
    val raster = Array.tabulate(3 * 3 * 3)(i => (i * 7).toByte)
    val good = buildPng(3, 3, 3, raster, Seq(2))
    assert(decode(good).isDefined)
    // wrong magic / raw text / empty / null
    assert(decode("not a png at all".getBytes("UTF-8")).isEmpty)
    assert(decode(Array.empty[Byte]).isEmpty)
    val r = Seq(Tuple1(null: Array[Byte])).toDF("b")
      .select(PngDecode(col("b")).as("d")).head()
    assert(r.isNullAt(0))
    // truncated: a tail cut, a 1-byte cut, and the generator's
    // inside-IDAT cut (structurally mid-chunk whatever the writer's
    // chunk layout)
    assert(decode(java.util.Arrays.copyOf(good, good.length - 20)).isEmpty)
    assert(decode(java.util.Arrays.copyOf(good, good.length - 1)).isEmpty)
    assert(decode(Multimodal.truncateInsideIdat(good)).isEmpty)
    // an interlace-1 header over a NON-interlaced stream: the Adam7
    // pass layout implies a different total stream length (33 vs 30
    // bytes at 3x3 RGB) — a geometry lie, nulled
    assert(decode(sig ++ ihdr(3, 3, interlace = 1) ++
      good.drop(8 + 25)).isEmpty)
    // 16-bit samples; a grayscale header over an RGB-sized stream (the
    // type is SUPPORTED now, but the stream length is a geometry lie);
    // a palette header with no PLTE chunk
    assert(decode(sig ++ ihdr(3, 3, bitDepth = 16) ++ good.drop(8 + 25)).isEmpty)
    assert(decode(sig ++ ihdr(3, 3, colorType = 0) ++ good.drop(8 + 25)).isEmpty)
    assert(decode(sig ++ ihdr(3, 3, colorType = 3) ++ good.drop(8 + 25)).isEmpty)
    // trailing bytes after IEND are garbage (spec: IEND ends the stream)
    assert(decode(good ++ Array[Byte](0)).isEmpty)
    // corrupt a CRC byte (last byte of the IDAT chunk)
    val corrupt = good.clone()
    corrupt(corrupt.length - 13) = (corrupt(corrupt.length - 13) ^ 0x5a).toByte
    assert(decode(corrupt).isEmpty)
    // geometry lie: the stream inflates to MORE raster than IHDR declares
    assert(decode(buildPng(3, 3, 3,
      Array.tabulate(3 * 4 * 3)(i => (i * 7).toByte), Seq(0),
      extraRasterRows = 1)).isEmpty)
    // undefined filter byte: hand-patch a filter value of 5 into row 0
    val filtered = new Array[Byte](3 * (1 + 9))
    filtered(0) = 5
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered); deflater.finish()
    val buf = new Array[Byte](256)
    val n = deflater.deflate(buf)
    deflater.end()
    val bad = sig ++ ihdr(3, 3) ++
      chunk("IDAT", java.util.Arrays.copyOf(buf, n)) ++ chunk("IEND", Array.empty)
    assert(decode(bad).isEmpty)
    // a second IHDR mid-stream is malformed
    val doubled = sig ++ ihdr(3, 3) ++ ihdr(3, 3) ++ good.drop(8 + 25)
    assert(decode(doubled).isEmpty)
  }

  test("hostile zlib streams: FDICT must not hang; a stream cut at exactly rasterLen must not pass") {
    // FDICT (preset dictionary, forbidden by PNG spec 10.1): a naive
    // inflate loop spins forever — inflate() returns 0 with
    // needsDictionary() true, needsInput() false, finished() false. The
    // chunk CRCs are attacker-computable, so this is reachable. 0x78BB
    // has the FDICT bit set and passes the zlib header check (%31 == 0)
    val fdict = Array[Byte](0x78, 0xBB.toByte, 1, 2, 3, 4, 9, 9, 9, 9)
    val hostile = sig ++ ihdr(3, 3) ++ chunk("IDAT", fdict) ++ chunk("IEND", Array.empty)
    assert(decode(hostile).isEmpty) // and returns — no infinite loop
    // cut the zlib stream after it yields every raster byte but before
    // the Adler-32 trailer: got == rasterLen yet finished() never fires —
    // the documented "short, long, or malformed all fail" contract
    val raster = Array.tabulate(3 * 3 * 3)(i => (i * 7).toByte)
    val filtered = new Array[Byte](3 * (1 + 9))
    for (r <- 0 until 3; x <- 0 until 9)
      filtered(r * 10 + 1 + x) = raster(r * 9 + x) // filter byte 0 per row
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered); deflater.finish()
    val buf = new Array[Byte](256)
    val n = deflater.deflate(buf)
    deflater.end()
    val cutAdler = java.util.Arrays.copyOf(buf, n - 4)
    val truncExact = sig ++ ihdr(3, 3) ++
      chunk("IDAT", cutAdler) ++ chunk("IEND", Array.empty)
    assert(decode(truncExact).isEmpty)
    // sanity: the SAME stream un-cut decodes
    val whole = sig ++ ihdr(3, 3) ++
      chunk("IDAT", java.util.Arrays.copyOf(buf, n)) ++ chunk("IEND", Array.empty)
    assert(decode(whole).isDefined)
  }

  test("SQL registration: png_decode over a hex literal") {
    graft.functions.GraftExtensions.register(spark)
    val payload = Multimodal.encodeRaster("png", 2, 2, rgba = false, "0123456789ab")
    val hex = payload.map(b => f"${b & 0xff}%02x").mkString
    val r = spark.sql(s"SELECT png_decode(unhex('$hex')) AS d").head().getStruct(0)
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) === ((2, 2, 2)))
    assert(r.getLong(4) === "0369".map(_.toLong).sum) // sum_r = chars 0,3,6,9
    assert(spark.sql("SELECT png_decode(CAST('junk' AS BINARY))").head().isNullAt(0))
  }

  test("grayscale (type 0) and gray+alpha (type 4): expanded sums and thumb") {
    val w = 5; val h = 4
    // gray: every filter type, r=g=b=gray sum, null sum_a
    val gray = Array.tabulate(w * h)(i => ((i * 41 + 3) % 256).toByte)
    val eg = gray.map(_ & 0xff).map(_.toLong).sum
    for (f <- 0 to 4) {
      val d = decode(buildPngTyped(w, h, 0, 1, gray, Seq(f)))
        .getOrElse(fail(s"gray filter $f: null"))
      assert((d.getInt(0), d.getInt(1), d.getInt(2)) === ((w, h, 0)), s"filter $f")
      assert((d.getLong(4), d.getLong(5), d.getLong(6)) === ((eg, eg, eg)), s"filter $f")
      assert(d.isNullAt(7), s"filter $f: gray has null sum_a")
    }
    // thumb: gray byte printed as r=g=b per sampled pixel — rows
    // {(0*h)/2, (1*h)/2} = {0, 2}, cols {0, 2} at w=5, h=4
    val d0 = decode(buildPngTyped(w, h, 0, 1, gray, Seq(2))).get
    val expected = Seq((0, 0), (0, 2), (2, 0), (2, 2))
      .map { case (r, c) => f"${gray(r * w + c) & 0xff}%02x" * 3 }.mkString
    assert(d0.getString(8) === expected)
    // gray+alpha: interleaved pairs; alpha sums exactly
    val ga = Array.tabulate(w * h * 2)(i => ((i * 29 + 11) % 256).toByte)
    var egray = 0L; var ea = 0L
    for (i <- 0 until w * h) { egray += ga(2 * i) & 0xff; ea += ga(2 * i + 1) & 0xff }
    val d4 = decode(buildPngTyped(w, h, 4, 2, ga, Seq(1, 4))).get
    assert(d4.getInt(2) === 4)
    assert((d4.getLong(4), d4.getLong(5), d4.getLong(6), d4.getLong(7)) ===
      ((egray, egray, egray, ea)))
  }

  test("palette (type 3): PLTE lookup, tRNS alpha with default-255 padding, index bounds") {
    val w = 4; val h = 3
    // palette of 5 entries; raster uses indices 0..4
    val plte = Array[Byte](
      10, 20, 30,  40, 50, 60,  70, 80, 90,  100, 110, 120,  (200 - 256).toByte, 5, 15)
    val idx = Array[Byte](0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 0, 1)
    def pal(c: Int) = idx.map(j => (plte(3 * j + c) & 0xff).toLong).sum
    for (f <- 0 to 4) {
      val d = decode(buildPngTyped(w, h, 3, 1, idx, Seq(f), plte = Some(plte)))
        .getOrElse(fail(s"palette filter $f: null"))
      assert((d.getInt(0), d.getInt(1), d.getInt(2)) === ((w, h, 3)), s"filter $f")
      assert((d.getLong(4), d.getLong(5), d.getLong(6)) === ((pal(0), pal(1), pal(2))))
      assert(d.isNullAt(7), "opaque palette (no tRNS) has null sum_a")
    }
    // thumb: sampled pixels (rows {0,1} cols {0,2}) -> palette RGB
    val d = decode(buildPngTyped(w, h, 3, 1, idx, Seq(0), plte = Some(plte))).get
    val expected = Seq(0, 2, 1 * w + 0, 1 * w + 2)
      .map(i => idx(i))
      .map(j => (0 to 2).map(c => f"${plte(3 * j + c) & 0xff}%02x").mkString).mkString
    assert(d.getString(8) === expected)
    // tRNS shorter than the palette: entries past it default to alpha 255
    val trns = Array[Byte](7, 9) // alpha for indices 0, 1; 2..4 -> 255
    val dt = decode(buildPngTyped(w, h, 3, 1, idx, Seq(2),
      plte = Some(plte), trns = Some(trns))).get
    val ealpha = idx.map(j => (if (j < 2) trns(j) & 0xff else 255).toLong).sum
    assert(dt.getLong(7) === ealpha)
    // an index past the palette is an error (spec 11.2.3), not clamped
    val oob = idx.clone(); oob(5) = 5
    assert(decode(buildPngTyped(w, h, 3, 1, oob, Seq(0), plte = Some(plte))).isEmpty)
  }

  test("chunk-ordering strictness: the spec's MUST rules reject") {
    val w = 3; val h = 3
    val idx = Array.tabulate(w * h)(i => (i % 4).toByte)
    val plte = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    val good = buildPngTyped(w, h, 3, 1, idx, Seq(0), plte = Some(plte))
    assert(decode(good).isDefined)
    // PLTE on a grayscale type is forbidden (spec 5.6)
    val gray = Array.tabulate(w * h)(i => (i * 10).toByte)
    val grayChunks = buildPngTyped(w, h, 0, 1, gray, Seq(0))
    val withPlte = grayChunks.take(8 + 25) ++ chunk("PLTE", plte) ++ grayChunks.drop(8 + 25)
    assert(decode(withPlte).isEmpty)
    // tRNS on RGBA is forbidden (types 4/6 carry full alpha)
    val rgba = Array.tabulate(w * h * 4)(i => (i * 3).toByte)
    val rgbaPng = buildPng(w, h, 4, rgba, Seq(0))
    val rgbaTrns = rgbaPng.take(8 + 25) ++ chunk("tRNS", Array[Byte](1)) ++ rgbaPng.drop(8 + 25)
    assert(decode(rgbaTrns).isEmpty)
    // tRNS on RGB is a transparency KEY — out of the statistics model
    val rgb = Array.tabulate(w * h * 3)(i => (i * 3).toByte)
    val rgbPng = buildPng(w, h, 3, rgb, Seq(0))
    val rgbTrns = rgbPng.take(8 + 25) ++
      chunk("tRNS", Array[Byte](0, 1, 0, 2, 0, 3)) ++ rgbPng.drop(8 + 25)
    assert(decode(rgbTrns).isEmpty)
    // tRNS BEFORE PLTE violates ordering (spec 5.6)
    val beforePlte = good.take(8 + 25) ++ chunk("tRNS", Array[Byte](1)) ++ good.drop(8 + 25)
    assert(decode(beforePlte).isEmpty)
    // tRNS longer than the palette
    val longTrns = good.take(8 + 25 + 12 + plte.length) ++
      chunk("tRNS", Array[Byte](1, 2, 3, 4, 5)) ++ good.drop(8 + 25 + 12 + plte.length)
    assert(decode(longTrns).isEmpty)
    // a zero-length tRNS is degenerate (would flip sum_a from null to
    // 255·n_px); rejected like an empty PLTE
    val emptyTrns = good.take(8 + 25 + 12 + plte.length) ++
      chunk("tRNS", Array.empty[Byte]) ++ good.drop(8 + 25 + 12 + plte.length)
    assert(decode(emptyTrns).isEmpty)
    // a second PLTE
    val doublePlte = good.take(8 + 25) ++ chunk("PLTE", plte) ++ good.drop(8 + 25)
    assert(decode(doublePlte).isEmpty)
    // IDAT chunks separated by another chunk are non-consecutive (5.6):
    // split the zlib stream across two IDATs with an ancillary between
    val raster = Array.tabulate(3 * 3 * 3)(i => (i * 7).toByte)
    val split = buildPng(3, 3, 3, raster, Seq(1), splitIdat = true)
    assert(decode(split).isDefined) // adjacent split is legal
    // locate the two IDAT chunks and inject a tEXt between them
    def findIdat(png: Array[Byte], from: Int): Int = {
      var pos = from
      while (!(png(pos + 4) == 'I' && png(pos + 5) == 'D' &&
               png(pos + 6) == 'A' && png(pos + 7) == 'T')) {
        val len = ((png(pos) & 0xff) << 24) | ((png(pos + 1) & 0xff) << 16) |
          ((png(pos + 2) & 0xff) << 8) | (png(pos + 3) & 0xff)
        pos += 12 + len
      }
      pos
    }
    val i1 = findIdat(split, 8)
    val l1 = ((split(i1) & 0xff) << 24) | ((split(i1 + 1) & 0xff) << 16) |
      ((split(i1 + 2) & 0xff) << 8) | (split(i1 + 3) & 0xff)
    val after1 = i1 + 12 + l1
    val interleaved = split.take(after1) ++
      chunk("tEXt", "k v".getBytes("US-ASCII")) ++ split.drop(after1)
    assert(decode(interleaved).isEmpty)
  }

  test("javax.imageio round-trip: palette/gray/gray+alpha md5-hex rasters (the gate's generator)") {
    val hex = "0123456789abcdef" * 11
    val w = 6; val h = 5
    // variant 0: palette — hex chars are INDICES into the formula palette
    val px0 = hex.substring(0, w * h)
    val p0 = Multimodal.encodeRasterIndexedOrGray(0, w, h, px0)
    assert((p0(25) & 0xff) === 3, "JDK writer must emit color type 3")
    val d0 = decode(p0).getOrElse(fail("palette png decoded to null"))
    def palSum(mul: Int, add: Int) =
      px0.map(ch => ((ch.toInt * mul + add) % 256).toLong).sum
    assert(d0.getInt(2) === 3)
    assert(d0.getLong(4) === palSum(7, 13))
    assert(d0.getLong(5) === palSum(11, 5))
    assert(d0.getLong(6) === palSum(3, 77))
    assert(d0.isNullAt(7))
    // variant 1: grayscale
    val p1 = Multimodal.encodeRasterIndexedOrGray(1, w, h, px0)
    assert((p1(25) & 0xff) === 0, "JDK writer must emit color type 0")
    val d1 = decode(p1).get
    val egray = px0.map(_.toLong).sum
    assert((d1.getInt(2), d1.getLong(4), d1.getLong(5), d1.getLong(6)) ===
      ((0, egray, egray, egray)))
    assert(d1.isNullAt(7))
    // variant 2: gray+alpha
    val px2 = hex.substring(0, w * h * 2)
    val p2 = Multimodal.encodeRasterIndexedOrGray(2, w, h, px2)
    assert((p2(25) & 0xff) === 4, "JDK writer must emit color type 4")
    val d2 = decode(p2).get
    var eg = 0L; var ea = 0L
    for (i <- 0 until w * h) { eg += px2.charAt(2 * i).toInt; ea += px2.charAt(2 * i + 1).toInt }
    assert((d2.getInt(2), d2.getLong(4), d2.getLong(7)) === ((4, eg, ea)))
    // independent cross-check: ImageIO reads back the SAME samples this
    // kernel decoded (so the generator's setSample path is byte-exact)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p2))
    val r00 = back.getRaster
    assert(r00.getSample(0, 0, 0) === px2.charAt(0).toInt)
    assert(r00.getSample(0, 0, 1) === px2.charAt(1).toInt)
    val back0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p0))
    val (er, egc, ebc) = Multimodal.paletteEntry(px0.charAt(0).toInt)
    assert((back0.getRGB(0, 0) & 0xffffff) === ((er << 16) | (egc << 8) | ebc))
  }

  /** Forward Adam7: split the raster into the seven passes (pass p
    * covers pixels (x0+i·dx, y0+j·dy)), filter each pass's scanlines
    * independently with the given filter cycle, concatenate, deflate.
    * The reference encoder for the interlaced coverage.
    */
  private def buildPngInterlaced(
      w: Int, h: Int, colorType: Int, channels: Int, raster: Array[Byte],
      filters: Seq[Int], plte: Option[Array[Byte]] = None): Array[Byte] = {
    val x0 = Array(0, 4, 0, 2, 0, 1, 0); val y0 = Array(0, 0, 4, 0, 2, 0, 1)
    val dx = Array(8, 8, 4, 4, 2, 2, 1); val dy = Array(8, 8, 8, 4, 4, 2, 2)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val out = Array.newBuilder[Byte]
    for (p <- 0 until 7) {
      val pw = if (w <= x0(p)) 0 else (w - x0(p) + dx(p) - 1) / dx(p)
      val ph = if (h <= y0(p)) 0 else (h - y0(p) + dy(p) - 1) / dy(p)
      if (pw > 0 && ph > 0) {
        // extract the pass's sub-image
        val sub = new Array[Byte](ph * pw * channels)
        for (j <- 0 until ph; i <- 0 until pw; c <- 0 until channels)
          sub((j * pw + i) * channels + c) =
            raster(((y0(p) + j * dy(p)) * w + (x0(p) + i * dx(p))) * channels + c)
        // filter it like a standalone image
        val stride = pw * channels
        for (row <- 0 until ph) {
          val f = filters((p + row) % filters.size)
          out += f.toByte
          for (x <- 0 until stride) {
            val cur = sub(row * stride + x) & 0xff
            val left = if (x >= channels) sub(row * stride + x - channels) & 0xff else 0
            val above = if (row > 0) sub((row - 1) * stride + x) & 0xff else 0
            val diag =
              if (row > 0 && x >= channels) sub((row - 1) * stride + x - channels) & 0xff
              else 0
            val v = f match {
              case 0 => cur
              case 1 => cur - left
              case 2 => cur - above
              case 3 => cur - ((left + above) >> 1)
              case 4 => cur - paeth(left, above, diag)
            }
            out += v.toByte
          }
        }
      }
    }
    val filtered = out.result()
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered); deflater.finish()
    val buf = new Array[Byte](filtered.length + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val z = java.util.Arrays.copyOf(buf, n)
    sig ++ ihdr(w, h, colorType = colorType, interlace = 1) ++
      plte.map(pl => chunk("PLTE", pl)).getOrElse(Array.empty[Byte]) ++
      chunk("IDAT", z) ++ chunk("IEND", Array.empty)
  }

  test("Adam7 interlace: pass extraction matches the non-interlaced decode on every shape") {
    // shapes chosen to exercise empty passes (w or h < the pass origin),
    // single-row/column images, exact multiples of 8, and off-by-ones
    val shapes = Seq((1, 1), (2, 3), (3, 2), (8, 8), (9, 7), (16, 5),
      (3, 9), (1, 9), (9, 1), (7, 6), (8, 1), (1, 8))
    for ((w, h) <- shapes; channels <- Seq(3, 4)) {
      val colorType = if (channels == 4) 6 else 2
      val raster = Array.tabulate(w * h * channels)(i => ((i * 37 + 11) % 256).toByte)
      val plain = decode(buildPng(w, h, channels, raster, Seq(0)))
        .getOrElse(fail(s"($w,$h,ct$colorType): plain null"))
      val inter = decode(buildPngInterlaced(w, h, colorType, channels, raster, Seq(0, 1, 2, 3, 4)))
        .getOrElse(fail(s"($w,$h,ct$colorType): interlaced null"))
      assert(inter.toSeq === plain.toSeq, s"($w,$h,ct$colorType)")
    }
    // gray and palette interlaced, against the typed plain build
    val w = 9; val h = 6
    val gray = Array.tabulate(w * h)(i => ((i * 41 + 3) % 256).toByte)
    val gPlain = decode(buildPngTyped(w, h, 0, 1, gray, Seq(0))).get
    val gInter = decode(buildPngInterlaced(w, h, 0, 1, gray, Seq(4))).get
    assert(gInter.toSeq === gPlain.toSeq)
    val plte = Array.tabulate(30)(i => ((i * 19 + 7) % 256).toByte)
    val idx = Array.tabulate(w * h)(i => (i % 10).toByte)
    val pPlain = decode(buildPngTyped(w, h, 3, 1, idx, Seq(0), plte = Some(plte))).get
    val pInter = decode(buildPngInterlaced(w, h, 3, 1, idx, Seq(1, 2), plte = Some(plte))).get
    assert(pInter.toSeq === pPlain.toSeq)
    // truncated interlaced stream still nulls
    val full = buildPngInterlaced(5, 5, 2, 3,
      Array.tabulate(75)(i => (i * 3).toByte), Seq(0))
    assert(decode(Multimodal.truncateInsideIdat(full)).isEmpty)
  }

  test("javax.imageio progressive (Adam7) round-trip across all five color types") {
    val hex = "0123456789abcdef" * 25
    val w = 11; val h = 9 // big enough that every pass is non-empty
    // RGB / RGBA through encodeRaster(interlaced = true)
    for (rgba <- Seq(false, true)) {
      val bpp = if (rgba) 4 else 3
      val px = hex.substring(0, w * h * bpp)
      val il = Multimodal.encodeRaster("png", w, h, rgba, px, interlaced = true)
      assert((il(28) & 0xff) === 1, "writer must emit interlace method 1")
      val plain = Multimodal.encodeRaster("png", w, h, rgba, px)
      val a = decode(il).getOrElse(fail(s"rgba=$rgba interlaced null"))
      val b = decode(plain).get
      assert(a.toSeq === b.toSeq, s"rgba=$rgba")
    }
    // palette / gray / gray+alpha / 16-bit gray through
    // encodeRasterIndexedOrGray
    for (variant <- 0 to 3) {
      val bands = if (variant == 2) 2 else 1
      val px = hex.substring(0, w * h * bands)
      val il = Multimodal.encodeRasterIndexedOrGray(variant, w, h, px, interlaced = true)
      assert((il(28) & 0xff) === 1, s"variant $variant: interlace method 1")
      if (variant == 3) assert((il(24) & 0xff) === 16, "16-bit variant writes depth 16")
      val plain = Multimodal.encodeRasterIndexedOrGray(variant, w, h, px)
      val a = decode(il).getOrElse(fail(s"variant $variant interlaced null"))
      val b = decode(plain).get
      assert(a.toSeq === b.toSeq, s"variant $variant")
    }
  }

  test("16-bit channel depth: msb sums across types 0/2/4/6, every filter, ImageIO cross-check") {
    val w = 5; val h = 4
    // deterministic 16-bit samples exercising BOTH bytes
    def raster16(n: Int): Array[Int] = Array.tabulate(n)(i => (i * 26541 + 997) & 0xffff)
    def toBytes(v: Array[Int]): Array[Byte] = {
      val out = new Array[Byte](v.length * 2)
      var i = 0
      while (i < v.length) {
        out(2 * i) = (v(i) >>> 8).toByte; out(2 * i + 1) = v(i).toByte; i += 1
      }
      out
    }
    // msb sum of every ch-th sample starting at k — the kernel's defined
    // 16->8 reduction, recomputed positionally from the sample values
    def msum(vals: Array[Int], ch: Int, k: Int): Long = {
      var s = 0L; var i = k
      while (i < vals.length) { s += vals(i) >>> 8; i += ch }
      s
    }
    // type 2 (RGB): per-channel msb sums, every filter type (filters act
    // on BYTES at distance bpp=6 — the low bytes participate)
    val rgb = raster16(w * h * 3)
    for (f <- 0 to 4) {
      val d = decode(buildPngTyped(w, h, 2, 6, toBytes(rgb), Seq(f), bitDepth = 16))
        .getOrElse(fail(s"16-bit RGB filter $f: null"))
      assert((d.getInt(0), d.getInt(1), d.getInt(2)) === ((w, h, 2)), s"filter $f")
      assert((d.getLong(4), d.getLong(5), d.getLong(6)) ===
        ((msum(rgb, 3, 0), msum(rgb, 3, 1), msum(rgb, 3, 2))), s"filter $f")
      assert(d.isNullAt(7), s"filter $f: 16-bit RGB must have null sum_a")
    }
    // thumb: msbs at the defined 2x2 grid
    val d2 = decode(buildPngTyped(w, h, 2, 6, toBytes(rgb), Seq(4), bitDepth = 16)).get
    val expThumb = (for (ty <- 0 to 1; tx <- 0 to 1) yield {
      val r = (ty * h) / 2; val c = (tx * w) / 2
      (0 to 2).map(k => f"${rgb((r * w + c) * 3 + k) >>> 8}%02x").mkString
    }).mkString
    assert(d2.getString(8) === expThumb)
    // type 6 (RGBA): alpha msb sum rides sum_a
    val rgba = raster16(w * h * 4)
    val d6 = decode(buildPngTyped(w, h, 6, 8, toBytes(rgba), Seq(1, 3), bitDepth = 16)).get
    assert((d6.getLong(4), d6.getLong(7)) === ((msum(rgba, 4, 0), msum(rgba, 4, 3))))
    // type 0 (gray): gray msb expands onto all three of r/g/b
    val gray = raster16(w * h)
    val d0 = decode(buildPngTyped(w, h, 0, 2, toBytes(gray), Seq(2), bitDepth = 16)).get
    val gsum = msum(gray, 1, 0)
    assert((d0.getLong(4), d0.getLong(5), d0.getLong(6)) === ((gsum, gsum, gsum)))
    assert(d0.isNullAt(7))
    // type 4 (gray+alpha)
    val ga = raster16(w * h * 2)
    val d4 = decode(buildPngTyped(w, h, 4, 4, toBytes(ga), Seq(4), bitDepth = 16)).get
    assert((d4.getLong(4), d4.getLong(7)) === ((msum(ga, 2, 0), msum(ga, 2, 1))))
    // 16-bit palette is undefined by the spec (11.2.2): rejects
    val idx = Array.tabulate(w * h * 2)(i => (i % 3).toByte)
    val plte = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    assert(decode(buildPngTyped(w, h, 3, 2, idx, Seq(0),
      plte = Some(plte), bitDepth = 16)).isEmpty)
    // geometry lie: an 8-bit-sized stream under a 16-bit header (the
    // inflated length is half what the header claims)
    val rgb8 = Array.tabulate(w * h * 3)(i => ((i * 31 + 5) % 256).toByte)
    assert(decode(buildPngTyped(w, h, 2, 3, rgb8, Seq(0), bitDepth = 16)).isEmpty)
    // independent cross-check: javax.imageio writes TYPE_USHORT_GRAY as a
    // 16-bit grayscale PNG — same samples, its own encoder
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val wr = img.getRaster
    for (y <- 0 until h; x <- 0 until w) wr.setSample(x, y, 0, gray(y * w + x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val p = bos.toByteArray
    assert((p(24) & 0xff) === 16, "ImageIO must write depth 16 for USHORT_GRAY")
    val di = decode(p).getOrElse(fail("ImageIO 16-bit gray decoded to null"))
    assert((di.getInt(0), di.getInt(1), di.getInt(2)) === ((w, h, 0)))
    assert((di.getLong(4), di.getLong(5), di.getLong(6)) === ((gsum, gsum, gsum)))
  }

  test("mediaTablePngPalette: variant/bad row mix decodes as declared") {
    // doc_ids chosen so variants 0/1/2/3 and both bad kinds all appear:
    // 0 -> palette, 1 -> gray8, 2 -> gray+alpha, 3 -> truncated (%7==3),
    // 4 -> raw text (%5==4), 5 -> gray8 (5%4=1), 6 -> gray+alpha,
    // 7 -> 16-BIT gray (7%4=3)
    val docs = (0L to 7L).map(i =>
      (i, s"document number $i with some text", 20L + i, "web", "en"))
      .toDF("doc_id", "text", "n_chars", "source", "lang")
    val rows = Multimodal.mediaTablePngPalette(spark, docs)
      .select(col("media_id"), PngDecode(col("payload")).as("d"), col("payload"))
      .orderBy("media_id")
      .collect()
    assert(rows(0).getStruct(1).getInt(2) === 3)
    assert(rows(1).getStruct(1).getInt(2) === 0)
    assert(rows(2).getStruct(1).getInt(2) === 4)
    assert(rows(3).isNullAt(1))
    assert(rows(4).isNullAt(1))
    assert(rows(5).getStruct(1).getInt(2) === 0)
    assert(rows(6).getStruct(1).getInt(2) === 4)
    // the 16-bit row really is depth 16 on the wire (IHDR bit-depth byte)
    assert(rows(7).getStruct(1).getInt(2) === 0)
    assert((rows(7).getAs[Array[Byte]](2)(24) & 0xff) === 16)
    // and its msb sums equal the gray8 formula (ASCII positional sum) —
    // the oracle's v=3 arm mirrors v=1
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("document number 7 with some text".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val w7 = (7 % 6 + 2); val h7 = ((20 + 7) % 5 + 2)
    val px7 = (md5hex * 5).substring(0, w7 * h7)
    val want = px7.map(_.toLong).sum
    assert(rows(7).getStruct(1).getLong(4) === want)
  }

  test("mediaTablePng: good/raw/truncated row mix and meta survive the batched encode") {
    val docs = Seq(
      (0L, "alpha beta gamma", 16L, "web", "en"),
      (1L, "delta epsilon", 13L, "web", "en"),
      (2L, "raw text row", 12L, "books", "de"),
      (3L, "truncated row here", 18L, "web", "en"))
      .toDF("doc_id", "text", "n_chars", "source", "lang")
    val rows = Multimodal.mediaTablePng(spark, docs)
      .select(col("media_id"), PngDecode(col("payload")).as("d"), col("meta.origin"))
      .orderBy("media_id")
      .collect()
    // doc 0: good RGB; doc 1: good RGBA; doc 2: raw text (%3==2);
    // doc 3: truncated (%7==3)
    assert(!rows(0).isNullAt(1) && rows(0).getStruct(1).getInt(2) === 2)
    assert(!rows(1).isNullAt(1) && rows(1).getStruct(1).getInt(2) === 6)
    assert(rows(2).isNullAt(1))
    assert(rows(3).isNullAt(1))
    assert(rows.map(_.getString(2)).toSeq === Seq("web", "web", "books", "web"))
  }
}
