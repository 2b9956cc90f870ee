package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.BmpDecode

class BmpDecodeSpec extends SparkSpec {
  import spark.implicits._

  private val px = "0123456789abcdef0123456789abcdef0123456789abcdef012345"

  private def bmp(wi: Int, hi: Int): Array[Byte] =
    graft.pipeline.Multimodal.encodeRaster("bmp", wi, hi, rgba = false, px)

  private def decode(b: Array[Byte]): Row = {
    val r = Seq(Tuple1(b)).toDF("b").select(BmpDecode(col("b")).as("d")).head()
    if (r.isNullAt(0)) null else r.getStruct(0)
  }

  private def expected(wi: Int, hi: Int): (Long, Long, Long, String) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    for (i <- 0 until wi * hi) {
      sr += px.charAt(3 * i); sg += px.charAt(3 * i + 1); sb += px.charAt(3 * i + 2)
    }
    val tb = (for (ty <- 0 to 1; tx <- 0 to 1) yield {
      val pi = ((ty * hi) / 2) * wi + (tx * wi) / 2
      f"${px.charAt(3 * pi).toInt}%02x${px.charAt(3 * pi + 1).toInt}%02x${px.charAt(3 * pi + 2).toInt}%02x"
    }).mkString
    (sr, sg, sb, tb)
  }

  test("bottom-up decode inverts the JDK writer (padding + BGR + row order)") {
    // w=3 exercises a 9→12 padded stride; w=4 an unpadded one; w=5 13→16
    for ((wi, hi) <- Seq((3, 2), (4, 3), (5, 3), (2, 4))) {
      val r = decode(bmp(wi, hi))
      val (sr, sg, sb, tb) = expected(wi, hi)
      assert(r != null && r.getInt(0) == wi && r.getInt(1) == hi)
      assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((sr, sg, sb)), s"${wi}x$hi")
      assert(r.getString(6) == tb, s"${wi}x$hi thumb (row order/BGR)")
    }
  }

  test("top-down (negative height) decodes to the same raster") {
    // synthesize: negate biHeight and reverse the stored row order
    val wi = 3; val hi = 2
    val up = bmp(wi, hi)
    val down = up.clone()
    val negH = -hi
    for (k <- 0 until 4) down(22 + k) = ((negH >> (8 * k)) & 0xff).toByte
    val stride = ((wi * 3 + 3) / 4) * 4
    val off = 54
    for (row <- 0 until hi; k <- 0 until stride)
      down(off + row * stride + k) = up(off + (hi - 1 - row) * stride + k)
    val a = decode(up); val b = decode(down)
    assert(b != null)
    assert((a.getLong(3), a.getLong(4), a.getLong(5), a.getString(6)) ==
      ((b.getLong(3), b.getLong(4), b.getLong(5), b.getString(6))))
  }

  test("null guards: magic, header variants, truncation, geometry") {
    val good = bmp(3, 2)
    assert(decode("not a bmp file padding".getBytes) == null)
    val badMagic = good.clone(); badMagic(1) = 'X'
    assert(decode(badMagic) == null)
    // 16-bpp claim → out of scope
    val b16 = good.clone(); b16(28) = 16
    assert(decode(b16) == null)
    // BI_BITFIELDS compression claim → out of scope
    val bf = good.clone(); bf(30) = 3
    assert(decode(bf) == null)
    // truncation inside the pixel array and inside the header
    assert(decode(java.util.Arrays.copyOf(good, good.length - 2)) == null)
    assert(decode(java.util.Arrays.copyOf(good, 30)) == null)
    // height lie: raster no longer fits
    val lie = good.clone(); lie(22) = 9
    assert(decode(lie) == null)
  }

  // --- hand-built variant payloads (no JDK encoder emits these) ---

  private def le32b(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def le16b(v: Int): Array[Byte] = Array[Byte](v.toByte, (v >> 8).toByte)

  private def dib(
      w: Int, h: Int, bpp: Int, comp: Int, dataOff: Int,
      palette: Array[Byte], pixels: Array[Byte]): Array[Byte] =
    "BM".getBytes("US-ASCII") ++ le32b(dataOff + pixels.length) ++
      le32b(0) ++ le32b(dataOff) ++
      le32b(40) ++ le32b(w) ++ le32b(h) ++ le16b(1) ++ le16b(bpp) ++
      le32b(comp) ++ le32b(pixels.length) ++ le32b(0) ++ le32b(0) ++
      le32b(palette.length / 4) ++ le32b(0) ++ palette ++ pixels

  test("32-bit BI_RGB: BGRx quads, 4th byte ignored, positioned thumb") {
    // 2x2 bottom-up: stored rows are (y=1) then (y=0); alpha byte 0x7f
    // must not leak into any statistic
    val rowBottom = Array[Byte](10, 20, 30, 0x7f, 40, 50, 60, 0x7f) // y=1: B G R x
    val rowTop = Array[Byte](70, 80, 90, 0x7f, 100, 110, 120, 0x7f) // y=0
    val b = dib(2, 2, 32, 0, 54, Array.empty, rowBottom ++ rowTop)
    val r = decode(b)
    assert(r != null)
    assert(r.getInt(0) === 2 && r.getInt(1) === 2)
    assert(r.getLong(3) === (30L + 60 + 90 + 120)) // sum_r = stored 3rd bytes
    assert(r.getLong(4) === (20L + 50 + 80 + 110))
    assert(r.getLong(5) === (10L + 40 + 70 + 100))
    // thumb: (0,0)=top-left=(90,80,70), (0,1)=(120,110,100),
    //        (1,0)=bottom-left=(30,20,10), (1,1)=(60,50,40)
    assert(r.getString(6) === "5a5046786e641e140a3c3228")
  }

  test("RLE8: runs, absolute mode with padding, EOL, delta and EOB decode exactly") {
    // 4x3 bottom-up RLE over a 2-entry palette: idx0=(1,2,3) idx1=(200,150,100)
    val pal = Array[Byte](3, 2, 1, 0, 100, (150).toByte, (200).toByte, 0) // BGRx
    val rle = Array[Byte](
      4, 1,       // bottom row: 4x idx1
      0, 0,       // EOL
      0, 3, 1, 0, 1, 0, // absolute: 3 literals (1,0,1) + pad byte
      1, 1,       // run of 1 idx1
      0, 0,       // EOL
      0, 2, 1, 0, // delta: skip 1 right (stays idx0)
      3, 1,       // then 3x idx1
      0, 1)       // EOB
    val b = dib(4, 3, 8, 1, 54 + 8, pal, rle)
    val r = decode(b)
    assert(r != null)
    assert(r.getInt(0) === 4 && r.getInt(1) === 3)
    // raster top-down: row0 (stored last) = [0(delta-skip),1,1,1]
    //                  row1 = [1,0,1,1]; row2 (bottom) = [1,1,1,1]
    val idx = Seq(0, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1)
    assert(r.getLong(3) === idx.map(i => if (i == 1) 200L else 1L).sum)
    assert(r.getLong(4) === idx.map(i => if (i == 1) 150L else 2L).sum)
    assert(r.getLong(5) === idx.map(i => if (i == 1) 100L else 3L).sum)
    // malformed RLE: run past the row edge → null
    assert(decode(dib(4, 3, 8, 1, 54 + 8, pal, Array[Byte](5, 1, 0, 1))) == null)
    // truncated (no EOB) → null
    assert(decode(dib(4, 3, 8, 1, 54 + 8, pal, Array[Byte](4, 1, 0, 0))) == null)
    // top-down RLE is invalid by definition → null
    val td = dib(4, 3, 8, 1, 54 + 8, pal, rle)
    val hNeg = le32b(-3)
    System.arraycopy(hNeg, 0, td, 22, 4)
    assert(decode(td) == null)
  }

  test("8-bit raw palette: strict index bound and biClrUsed semantics") {
    val pal = Array[Byte](3, 2, 1, 0, 100, (150).toByte, (200).toByte, 0)
    // biClrUsed = 2: set at offset 46
    def withClrUsed(b: Array[Byte], n: Int): Array[Byte] = {
      val c = b.clone(); System.arraycopy(le32b(n), 0, c, 46, 4); c
    }
    // 4x2 raw: stride 4 (already aligned); bottom-up
    val pix = Array[Byte](1, 1, 0, 0, 0, 1, 0, 1)
    val ok = withClrUsed(dib(4, 2, 8, 0, 54 + 8, pal, pix), 2)
    val r = decode(ok)
    assert(r != null)
    assert(r.getLong(3) === (4L * 200 + 4 * 1)) // four idx1, four idx0
    // an index past biClrUsed → null (strict palette contract)
    val bad = withClrUsed(dib(4, 2, 8, 0, 54 + 8, pal,
      Array[Byte](1, 1, 2, 0, 0, 1, 0, 1)), 2)
    assert(decode(bad) == null)
  }

  test("SQL registration works") {
    graft.functions.GraftExtensions.register(spark)
    Seq(Tuple1(bmp(3, 2))).toDF("b").createOrReplaceTempView("bmp_docs")
    assert(spark.sql("SELECT bmp_decode(b).n_px AS n FROM bmp_docs")
      .head().getLong(0) == 6L)
  }
}
