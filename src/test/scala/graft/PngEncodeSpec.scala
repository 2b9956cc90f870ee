package graft

import org.apache.spark.sql.functions._

import graft.functions.{PngDecode, PngEncode, PpmResize}

/** The PNG write path: P6 in, spec-conformant PNG out. The circularity
  * trap (our encoder validated only by our decoder could hide a matched
  * pair of bugs) is broken by decoding the encoder's output with
  * javax.imageio — an independent decoder — and asserting pixel
  * equality.
  */
class PngEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def p6(w: Int, h: Int, px: Array[Byte]): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes("UTF-8") ++ px

  test("encode then decode reproduces the raster exactly (both decoders)") {
    val w = 5; val h = 4
    val px = Array.tabulate(w * h * 3)(i => ((i * 41 + 3) % 256).toByte)
    val encoded = PngEncode.encode(p6(w, h, px))
    assert(encoded != null)
    // our decoder
    val d = PngDecode.decode(encoded)
    assert(d != null)
    assert((d.getInt(0), d.getInt(1), d.getInt(2)) === ((w, h, 2)))
    def chanSum(c: Int) = px.indices.filter(_ % 3 == c).map(px(_) & 0xff).sum.toLong
    assert((d.getLong(4), d.getLong(5), d.getLong(6)) ===
      ((chanSum(0), chanSum(1), chanSum(2))))
    // the INDEPENDENT decoder: javax.imageio must read our bytes and see
    // the identical pixels
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(encoded))
    assert(img != null && img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val i = 3 * (y * w + x)
      assert(((rgb >> 16) & 0xff) === (px(i) & 0xff), s"R at ($x,$y)")
      assert(((rgb >> 8) & 0xff) === (px(i + 1) & 0xff), s"G at ($x,$y)")
      assert((rgb & 0xff) === (px(i + 2) & 0xff), s"B at ($x,$y)")
    }
  }

  test("composes with resize: P6 -> resize -> PNG -> decode, all fused") {
    val px = Array.tabulate(6 * 4 * 3)(i => (i * 7).toByte)
    val out = Seq(Tuple1(p6(6, 4, px))).toDF("b")
      .select(PngDecode(PngEncode(PpmResize(col("b"), 3, 2))).as("d"))
      .head().getStruct(0)
    assert((out.getInt(0), out.getInt(1)) === ((3, 2)))
  }

  test("non-P6 payloads encode to null (the shared parser's scope)") {
    assert(PngEncode.encode("not a ppm".getBytes("UTF-8")) == null)
    assert(PngEncode.encode(p6(4, 4, Array[Byte](1, 2, 3))) == null) // truncated
    assert(PngEncode.encode(Array.empty[Byte]) == null)
    val r = Seq(Tuple1(null: Array[Byte])).toDF("b")
      .select(PngEncode(col("b")).as("e")).head()
    assert(r.isNullAt(0))
  }

  test("deterministic bytes within a run; 1x1 minimum image") {
    val one = p6(1, 1, Array[Byte](9, 8, 7))
    val a = PngEncode.encode(one)
    val b = PngEncode.encode(one)
    assert(a.toSeq === b.toSeq)
    val d = PngDecode.decode(a)
    assert((d.getLong(4), d.getLong(5), d.getLong(6)) === ((9L, 8L, 7L)))
  }

  test("SQL registration: png_encode composes in SQL") {
    graft.functions.GraftExtensions.register(spark)
    val hex = p6(1, 1, Array[Byte](1, 2, 3)).map(b => f"${b & 0xff}%02x").mkString
    val r = spark.sql(
      s"SELECT png_decode(png_encode(unhex('$hex'))).sum_g AS g").head()
    assert(r.getLong(0) === 2L)
  }
}
