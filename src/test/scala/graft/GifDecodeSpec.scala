package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.GifDecode

class GifDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def decode(bytes: Array[Byte]): Row =
    Seq(Tuple1(bytes)).toDF("b")
      .select(GifDecode(col("b")).as("g")).select("g.*").head()

  private def decodeOrNull(bytes: Array[Byte]): Row = {
    val r = Seq(Tuple1(bytes)).toDF("b").select(GifDecode(col("b")).as("g")).head()
    if (r.isNullAt(0)) null else r.getStruct(0)
  }

  private val px =
    "0123456789abcdef0123456789abcdef0123456789abcdef0123456789abcdef"

  private def pal(j: Int): (Int, Int, Int) =
    ((j * 7 + 13) % 256, (j * 11 + 5) % 256, (j * 3 + 77) % 256)

  private def expected(wi: Int, hi: Int): (Long, Long, Long, String) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    for (i <- 0 until wi * hi) {
      val (r, g, b) = pal(px.charAt(i).toInt)
      sr += r; sg += g; sb += b
    }
    val tb = (for (ty <- 0 to 1; tx <- 0 to 1) yield {
      val (r, g, b) = pal(px.charAt(((ty * hi) / 2) * wi + (tx * wi) / 2).toInt)
      f"$r%02x$g%02x$b%02x"
    }).mkString
    (sr, sg, sb, tb)
  }

  test("sequential GIF: decode equals the raster AND the JDK reader agrees") {
    for ((wi, hi) <- Seq((2, 2), (6, 3), (2, 5), (7, 6), (5, 4))) {
      val bytes = graft.pipeline.Multimodal.encodeGifIndexed(wi, hi, px, interlaced = false)
      val r = decode(bytes)
      val (sr, sg, sb, tb) = expected(wi, hi)
      assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((wi, hi, 256)))
      assert((r.getLong(4), r.getLong(5), r.getLong(6)) == ((sr, sg, sb)), s"${wi}x$hi sums")
      assert(r.getString(7) == tb, s"${wi}x$hi thumb")
      // triangulation: the JDK reader reproduces the natural raster on
      // sequential files (it does NOT on interlaced ones — reader bug)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      for (i <- 0 until wi * hi)
        assert(img.getRaster.getSample(i % wi, i / wi, 0) == px.charAt(i).toInt)
    }
  }

  test("interlaced GIF: the 4-pass deinterlace inverts the JDK writer's interlacer") {
    // thumb pins ROW PLACEMENT (sums are scan-order blind): heights 3..6
    // make the pass structure non-trivial
    for ((wi, hi) <- Seq((6, 3), (5, 4), (2, 5), (7, 6))) {
      val bytes = graft.pipeline.Multimodal.encodeGifIndexed(wi, hi, px, interlaced = true)
      // the interlace flag is actually set (bit 6 of the descriptor)
      var off = 13 + 3 * 256
      while ((bytes(off) & 0xff) == 0x21) {
        off += 2
        var len = bytes(off) & 0xff
        while (len != 0) { off += 1 + len; len = bytes(off) & 0xff }
        off += 1
      }
      assert((bytes(off + 9) & 0x40) != 0, s"${wi}x$hi should be interlaced")
      val r = decode(bytes)
      val (sr, sg, sb, tb) = expected(wi, hi)
      assert((r.getLong(4), r.getLong(5), r.getLong(6)) == ((sr, sg, sb)))
      assert(r.getString(7) == tb, s"${wi}x$hi interlaced thumb (row placement)")
    }
  }

  test("LZW edge paths: constant raster (K-omega chains) and full-alphabet raster") {
    // constant image: the encoder emits code==next repeatedly (K-omega)
    val const = "7" * 48
    val bytes = graft.pipeline.Multimodal.encodeGifIndexed(8, 6, const, interlaced = false)
    val r = decode(bytes)
    val (pr, pg, pb) = pal('7'.toInt)
    assert(r.getLong(4) == 48L * pr && r.getLong(5) == 48L * pg && r.getLong(6) == 48L * pb)
    // wide-alphabet raster: indices spanning the byte range exercise the
    // table growth path
    val wide = (0 until 48).map(i => ((i * 37 + 11) % 256).toChar).mkString
    val b2 = graft.pipeline.Multimodal.encodeGifIndexed(8, 6, wide, interlaced = false)
    val r2 = decode(b2)
    var er = 0L
    for (i <- 0 until 48) er += pal(wide.charAt(i).toInt)._1
    assert(r2.getLong(4) == er)
  }

  test("null guards: junk, truncation at every structural boundary, geometry lies") {
    val good = graft.pipeline.Multimodal.encodeGifIndexed(6, 3, px, interlaced = false)
    assert(decodeOrNull("not a gif at all".getBytes("UTF-8")) == null)
    assert(decodeOrNull(Array.empty[Byte]) == null)
    // magic off by one byte
    val badMagic = good.clone(); badMagic(4) = '6'
    assert(decodeOrNull(badMagic) == null)
    // truncation at every prefix that cuts inside the structure
    for (cut <- Seq(5, 12, 200, good.length - 3))
      assert(decodeOrNull(java.util.Arrays.copyOf(good, cut)) == null, s"cut=$cut")
    // geometry lie: screen height bumped — first image is no longer
    // full-frame (and the pixel stream cannot fill the larger frame)
    val lie = good.clone(); lie(8) = (lie(8) + 1).toByte
    assert(decodeOrNull(lie) == null)
    // trailer-first stream (no image descriptor)
    val hdr = java.util.Arrays.copyOf(good, 13 + 3 * 256 + 1)
    hdr(13 + 3 * 256) = 0x3b.toByte
    assert(decodeOrNull(hdr) == null)
  }

  test("SQL registration works") {
    graft.functions.GraftExtensions.register(spark)
    val bytes = graft.pipeline.Multimodal.encodeGifIndexed(3, 2, px, interlaced = false)
    Seq(Tuple1(bytes)).toDF("b").createOrReplaceTempView("gif_docs")
    val out = spark.sql("SELECT gif_decode(b).n_px AS n FROM gif_docs").head()
    assert(out.getLong(0) == 6L)
  }

  // ---- the write path: GifEncode (from-scratch LZW compressor) ----------

  private def p6Of(wi: Int, hi: Int, idx: Seq[Int]): Array[Byte] = {
    val header = s"P6\n$wi $hi\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * wi * hi)
    System.arraycopy(header, 0, out, 0, header.length)
    for (i <- 0 until wi * hi) {
      val (r, g, b) = pal(idx(i))
      out(header.length + 3 * i) = r.toByte
      out(header.length + 3 * i + 1) = g.toByte
      out(header.length + 3 * i + 2) = b.toByte
    }
    out
  }

  test("encode round-trip: GifDecode(GifEncode(p6)) == raster, JDK reader agrees") {
    for ((wi, hi) <- Seq((2, 2), (6, 3), (7, 6))) {
      val idx = (0 until wi * hi).map(i => px.charAt(i).toInt)
      val gif = graft.functions.GifEncode.encode(p6Of(wi, hi, idx))
      assert(gif != null)
      val r = graft.functions.GifDecode.decode(gif)
      assert(r != null)
      val (sr, sg, sb, tb) = expected(wi, hi)
      assert((r.getLong(4), r.getLong(5), r.getLong(6)) == ((sr, sg, sb)))
      assert(r.getString(7) == tb)
      // independent LZW decoder: the JDK reader reproduces the indices
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
      assert(img.getWidth == wi && img.getHeight == hi)
      for (i <- 0 until wi * hi)
        assert(img.getRaster.getSample(i % wi, i / wi, 0) == idx(i),
          s"${wi}x$hi pixel $i (JDK reader vs source index)")
    }
  }

  test("encode: table-full CLEAR path (large varied raster) survives both decoders") {
    // 128x64 = 8192 px of a high-variety deterministic pattern fills the
    // 4096-entry table and forces the mid-stream CLEAR + reset
    val wi = 128; val hi = 64
    val idx = (0 until wi * hi).map(i => (i * 37 + (i * i % 251)) % 256)
    val gif = graft.functions.GifEncode.encode(p6Of(wi, hi, idx))
    assert(gif != null)
    val r = graft.functions.GifDecode.decode(gif)
    assert(r != null && r.getLong(3) == wi.toLong * hi)
    var er = 0L
    idx.foreach(j => er += pal(j)._1)
    assert(r.getLong(4) == er)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    for (i <- 0 until wi * hi)
      assert(img.getRaster.getSample(i % wi, i / wi, 0) == idx(i))
  }

  test("encode: constant raster compresses (LZW table actually reused)") {
    val wi = 32; val hi = 32
    val gif = graft.functions.GifEncode.encode(p6Of(wi, hi, Seq.fill(wi * hi)(55)))
    assert(gif != null)
    // 1024 px → far fewer than 1024 code emissions; header+GCT is 781 B
    assert(gif.length < 781 + 200, s"constant image should compress, got ${gif.length}")
    val r = graft.functions.GifDecode.decode(gif)
    assert(r.getLong(4) == 1024L * pal(55)._1)
  }

  test("encode: non-palette pixel and malformed P6 refuse with null") {
    val good = p6Of(3, 2, Seq(1, 2, 3, 4, 5, 6))
    val poisoned = good.clone()
    poisoned(good.length - 2) = (poisoned(good.length - 2) + 1).toByte // g channel off
    assert(graft.functions.GifEncode.encode(poisoned) == null)
    assert(graft.functions.GifEncode.encode("P5\n2 2\n255\n0000".getBytes) == null)
    assert(graft.functions.GifEncode.encode(java.util.Arrays.copyOf(good, good.length - 1)) == null)
    assert(graft.functions.GifEncode.encode(Array.empty[Byte]) == null)
  }
}
