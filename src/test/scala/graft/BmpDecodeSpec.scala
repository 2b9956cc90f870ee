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
    // 32-bpp claim → out of scope
    val b32 = good.clone(); b32(28) = 32
    assert(decode(b32) == null)
    // RLE compression claim → out of scope
    val rle = good.clone(); rle(30) = 1
    assert(decode(rle) == null)
    // truncation inside the pixel array and inside the header
    assert(decode(java.util.Arrays.copyOf(good, good.length - 2)) == null)
    assert(decode(java.util.Arrays.copyOf(good, 30)) == null)
    // height lie: raster no longer fits
    val lie = good.clone(); lie(22) = 9
    assert(decode(lie) == null)
  }

  test("SQL registration works") {
    graft.functions.GraftExtensions.register(spark)
    Seq(Tuple1(bmp(3, 2))).toDF("b").createOrReplaceTempView("bmp_docs")
    assert(spark.sql("SELECT bmp_decode(b).n_px AS n FROM bmp_docs")
      .head().getLong(0) == 6L)
  }
}
