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
    // truncated: the generator's cut (IEND + IDAT tail) and a 1-byte cut
    assert(decode(java.util.Arrays.copyOf(good, good.length - 20)).isEmpty)
    assert(decode(java.util.Arrays.copyOf(good, good.length - 1)).isEmpty)
    // interlaced (Adam7 reorders scanlines — out of scope by design)
    assert(decode(sig ++ ihdr(3, 3, interlace = 1) ++
      good.drop(8 + 25)).isEmpty)
    // 16-bit samples, grayscale, palette
    assert(decode(sig ++ ihdr(3, 3, bitDepth = 16) ++ good.drop(8 + 25)).isEmpty)
    assert(decode(sig ++ ihdr(3, 3, colorType = 0) ++ good.drop(8 + 25)).isEmpty)
    assert(decode(sig ++ ihdr(3, 3, colorType = 3) ++ good.drop(8 + 25)).isEmpty)
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
