package graft

import org.apache.spark.sql.functions._

import graft.functions.WebpDecode
import graft.pipeline.Multimodal

/** VP8L lossless WebP: encode→decode round trips across every encoder
  * arm (literals, subtract-green, palette bundled/unbundled, LZ77 runs,
  * color cache, every predictor mode, color transforms), strict null
  * guards, the raster seam, and the codegen path.
  */
class WebpDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def raster(w: Int, h: Int, f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(i => f(i % w, i / w))

  private def gradient(w: Int, h: Int): Array[Int] =
    raster(w, h, (x, y) =>
      (((x * 31 + y * 7) % 256) << 24) | (((x * 17) % 256) << 16) |
        (((y * 13) % 256) << 8) | ((x * 5 + y * 3) % 256))

  private def decodeArgbVia(bytes: Array[Byte], w: Int, h: Int): Array[Int] = {
    val r = WebpDecode.decode(bytes)
    assert(r != null, "decode refused")
    assert(r.getInt(0) === w && r.getInt(1) === h)
    // stats don't reconstruct pixels; use the raster seam + alpha sum
    val ras = WebpDecode.decodeRaster(bytes)
    assert(ras != null)
    Array.tabulate(w * h)(i =>
      ((ras.rgb(3 * i) & 0xff) << 16) | ((ras.rgb(3 * i + 1) & 0xff) << 8) |
        (ras.rgb(3 * i + 2) & 0xff))
  }

  private def rgbOf(px: Array[Int]): Array[Int] = px.map(_ & 0x00ffffff)

  test("round trip: plain literals, subtract-green, LZ77 runs, color cache") {
    val w = 11; val h = 7
    val px = gradient(w, h)
    for (arm <- Seq(0, 1, 3, 4)) {
      val payload = Multimodal.encodeVp8l(w, h, px, arm)
      val r = WebpDecode.decode(payload)
      assert(r != null, s"arm $arm refused")
      assert(r.getInt(0) === w && r.getInt(1) === h)
      assert(r.getLong(3) === px.map(p => (p >>> 16) & 0xff).map(_.toLong).sum, s"arm $arm sum_r")
      assert(r.getLong(4) === px.map(p => (p >>> 8) & 0xff).map(_.toLong).sum, s"arm $arm sum_g")
      assert(r.getLong(5) === px.map(p => p & 0xff).map(_.toLong).sum, s"arm $arm sum_b")
      assert(r.getLong(6) === px.map(p => (p >>> 24) & 0xff).map(_.toLong).sum, s"arm $arm sum_a")
      assert(decodeArgbVia(payload, w, h) === rgbOf(px), s"arm $arm pixels")
    }
    // runs that actually compress: constant rows exercise the LZ77 arm
    val flat = raster(w, h, (_, y) => 0xff000000 | (y << 16) | 0x4010)
    assert(decodeArgbVia(Multimodal.encodeVp8l(w, h, flat, 3), w, h) === rgbOf(flat))
    // repeated colors exercise cache hits
    val twoTone = raster(w, h, (x, _) => if (x % 2 == 0) 0xff102030 else 0xffccddee)
    assert(decodeArgbVia(Multimodal.encodeVp8l(w, h, twoTone, 4), w, h) === rgbOf(twoTone))
  }

  test("round trip: color-indexing — bundled (<=16 colors) and unbundled (256)") {
    val w = 13; val h = 5
    // 4-color palette → widthBits 2 (4 px/byte bundling)
    val pal4 = Array(0xff112233, 0xff445566, 0xff778899, 0xffaabbcc)
    val px4 = raster(w, h, (x, y) => pal4((x * y + x) % 4))
    assert(decodeArgbVia(Multimodal.encodeVp8l(w, h, px4, 2, palette = pal4), w, h)
      === rgbOf(px4))
    // 2-color palette → widthBits 3 (8 px/byte)
    val pal2 = Array(0xff000000, 0xffffffff)
    val px2 = raster(w, h, (x, y) => pal2((x + y) % 2))
    assert(decodeArgbVia(Multimodal.encodeVp8l(w, h, px2, 2, palette = pal2), w, h)
      === rgbOf(px2))
    // 40-color palette → widthBits 0 (no bundling)
    val pal40 = Array.tabulate(40)(i => 0xff000000 | (i * 97 % 256 << 16) |
      (i * 31 % 256 << 8) | (i * 7 % 256))
    val px40 = raster(w, h, (x, y) => pal40((x * 3 + y * 5) % 40))
    assert(decodeArgbVia(Multimodal.encodeVp8l(w, h, px40, 2, palette = pal40), w, h)
      === rgbOf(px40))
  }

  test("round trip: every predictor mode 0..13 and color transforms") {
    val w = 19; val h = 9 // spans tile boundaries at tile bits 4
    val px = gradient(w, h)
    for (mode <- 0 to 13) {
      val payload = Multimodal.encodeVp8l(w, h, px, 5, mode = mode)
      assert(decodeArgbVia(payload, w, h) === rgbOf(px), s"predictor mode $mode")
    }
    for (cte <- Seq(0x000000, 0x7f7f7f, 0x80ff40, 0x123456)) {
      val payload = Multimodal.encodeVp8l(w, h, px, 6, cte = cte)
      assert(decodeArgbVia(payload, w, h) === rgbOf(px), f"color transform $cte%06x")
    }
  }

  test("strict nulls: magic, signature, truncation, trailing garbage, lossy VP8") {
    val good = Multimodal.encodeVp8l(6, 4, gradient(6, 4), 0)
    assert(WebpDecode.decode(good) != null)
    assert(WebpDecode.decode("not a webp".getBytes) == null)
    val vp8 = good.clone(); vp8(15) = ' ' // "VP8 " = lossy codec
    assert(WebpDecode.decode(vp8) == null)
    assert(WebpDecode.decode(java.util.Arrays.copyOf(good, good.length - 3)) == null)
    assert(WebpDecode.decode(good ++ Array[Byte](1, 2, 3)) == null)
    val badSig = good.clone(); badSig(20) = 0x2e
    assert(WebpDecode.decode(badSig) == null)
    val badVer = good.clone()
    // version bits are bits 29..31 of the stream (after 14+14+1)
    badVer(21 + 3) = (badVer(21 + 3) | 0x80).toByte
    assert(WebpDecode.decode(badVer) == null)
  }

  test("the raster seam feeds ImageDHash: WebP of a raster hashes like its P6") {
    val w = 10; val h = 9
    val px3 = ("0123456789abcdef" * 17).substring(0, w * h * 3)
    val argb = Array.tabulate(w * h)(i => 0xff000000 |
      ((px3.charAt(3 * i) & 0xff) << 16) | ((px3.charAt(3 * i + 1) & 0xff) << 8) |
      (px3.charAt(3 * i + 2) & 0xff))
    val webp = Multimodal.encodeVp8l(w, h, argb, 0)
    val ppm = (s"P6\n$w $h\n255\n" + px3).getBytes("US-ASCII")
    val a = graft.functions.ImageDHash.hash(webp, 9, 8)
    val b = graft.functions.ImageDHash.hash(ppm, 9, 8)
    assert(a != null && b != null)
    assert(a.getUTF8String(0).toString === "webp")
    assert(a.getLong(3) === b.getLong(3), "webp dhash must equal the P6 hash")
  }

  test("the expression path (codegen) matches eval, nulls included") {
    val rows = Seq(
      (1L, Multimodal.encodeVp8l(6, 4, gradient(6, 4), 1)),
      (2L, "junk bytes".getBytes("UTF-8")))
    val out = rows.toDF("media_id", "payload")
      .select(col("media_id"), WebpDecode(col("payload")).as("d"))
      .select(col("media_id"), col("d.width"), col("d.sum_g"))
      .orderBy("media_id").collect()
    assert(out(0).getInt(1) === 6)
    val direct = WebpDecode.decode(Multimodal.encodeVp8l(6, 4, gradient(6, 4), 1))
    assert(out(0).getLong(2) === direct.getLong(4))
    assert(out(1).isNullAt(1))
  }
}
