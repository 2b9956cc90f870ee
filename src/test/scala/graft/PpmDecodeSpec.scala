package graft

import org.apache.spark.sql.functions._

import graft.functions.PpmDecode

/** Real pixel decode for the codec-free format: header edge cases,
  * hand-computed sums/thumbnail, and the null guards for everything
  * that is not a complete maxval-255 P6 image.
  */
class PpmDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def ppm(w: Int, h: Int, px: Array[Byte], header: String = null): Array[Byte] = {
    val hd = Option(header).getOrElse(s"P6\n$w $h\n255\n")
    hd.getBytes("UTF-8") ++ px
  }

  private def decode(bytes: Array[Byte]) = {
    val r = Seq(Tuple1(bytes)).toDF("b")
      .select(PpmDecode(col("b")).as("d")).head()
    if (r.isNullAt(0)) None else Some(r.getStruct(0))
  }

  test("hand-computed sums and 2x2 nearest-neighbor thumbnail") {
    // 2x2 image, pixels (r,g,b): (1,2,3) (4,5,6) / (7,8,9) (10,11,12)
    val px = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    val d = decode(ppm(2, 2, px)).get
    assert((d.getInt(0), d.getInt(1), d.getLong(2)) === ((2, 2, 4L)))
    assert((d.getLong(3), d.getLong(4), d.getLong(5)) === ((22L, 26L, 30L)))
    // thumb (ty,tx) samples row (ty*2)/2, col (tx*2)/2 -> the identity
    // grid here: pixels (0,0),(0,1),(1,0),(1,1) in order
    assert(d.getString(6) === "0102030405060708090a0b0c")
    // 1x1 image: all four thumb samples are the single pixel
    val one = decode(ppm(1, 1, Array[Byte](0x10, 0x20, 0x30))).get
    assert(one.getString(6) === "102030" * 4)
    // 3x3: thumb rows {0, 1}, cols {0, 1} (integer div of 3/2) —
    // pixel indices r*w + c = 0, 1, 3, 4
    val px3 = (1 to 27).map(_.toByte).toArray
    val d3 = decode(ppm(3, 3, px3)).get
    assert(d3.getString(6) ===
      Seq(0, 1, 3, 4).flatMap(p => px3.slice(3 * p, 3 * p + 3).toSeq)
        .map(b => f"$b%02x").mkString)
  }

  test("header whitespace variants parse; broken containers decode to null") {
    val px = Array[Byte](1, 2, 3)
    // space-separated header with \r\n — any whitespace run between fields
    assert(decode(ppm(1, 1, px, header = "P6 1\t1\r\n255 ")).isDefined)
    // netpbm # comments are legal anywhere whitespace is (tool banners)
    assert(decode(ppm(1, 1, px,
      header = "P6\n# made by sometool\n1 1\n# note\n255\n")).isDefined)
    // a comment may not replace the single raster separator byte
    assert(decode(ppm(1, 1, px, header = "P6\n1 1\n255")).isEmpty)
    // wrong magic (P5 is grayscale PGM), bad maxval, truncated raster,
    // missing raster separator, empty payload
    assert(decode(ppm(1, 1, px, header = "P5\n1 1\n255\n")).isEmpty)
    assert(decode(ppm(1, 1, px, header = "P6\n1 1\n65535\n")).isEmpty)
    assert(decode(ppm(2, 2, px)).isEmpty) // promises 12 bytes, has 3
    assert(decode("P6\n1 1\n255".getBytes("UTF-8")).isEmpty)
    assert(decode(Array.emptyByteArray).isEmpty)
    assert(decode("just text".getBytes("UTF-8")).isEmpty)
    // zero dimension and overflow-shaped headers
    assert(decode(ppm(0, 1, px)).isEmpty)
    assert(decode("P6\n999999999 999999999\n255\nxyz".getBytes("UTF-8")).isEmpty)
    // null input
    val n = Seq(Tuple1(null: Array[Byte])).toDF("b")
      .select(PpmDecode(col("b"))).head()
    assert(n.isNullAt(0))
  }

  test("ppm_resize: nearest-neighbor grid, composition, null pass-through") {
    import graft.functions.PpmResize
    def resize(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(PpmResize(col("b"), tw, th).as("r")).head()
      if (r.isNullAt(0)) None else Some(r.getAs[Array[Byte]](0))
    }
    // 2x2 -> 4x4 upscale: each source pixel becomes a 2x2 block
    // (src row = (ty*2)/4 = ty/2, same for cols)
    val px = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    val up = resize(ppm(2, 2, px), 4, 4).get
    assert(new String(up.take(11), "US-ASCII") === "P6\n4 4\n255\n")
    val raster = up.drop(11)
    assert(raster.length === 48)
    // row 0 of the output: pixels (0,0),(0,0),(0,1),(0,1)
    assert(raster.take(12).toSeq ===
      Seq[Byte](1, 2, 3, 1, 2, 3, 4, 5, 6, 4, 5, 6))
    // composition: the output decodes, sums = block-weighted source sums
    val d = decode(up).get
    assert((d.getInt(0), d.getInt(1)) === ((4, 4)))
    assert(d.getLong(3) === 4L * (1 + 4 + 7 + 10))
    // downscale 2x2 -> 1x1: the (0,0) pixel survives
    val down = resize(ppm(2, 2, px), 1, 1).get
    assert(down.drop(11).toSeq === Seq[Byte](1, 2, 3))
    // identity resize reproduces the raster under a canonical header
    assert(resize(ppm(2, 2, px), 2, 2).get.drop(11).toSeq === px.toSeq)
    // non-P6 resizes to null
    assert(resize("nope".getBytes("UTF-8"), 2, 2).isEmpty)
    assert(resize(ppm(2, 2, px.take(3)), 2, 2).isEmpty) // truncated
    // an Int-overflowing target fails ANALYSIS loudly, never wraps the
    // output allocation negative inside the kernel
    val e = intercept[Exception] {
      Seq(Tuple1(ppm(2, 2, px))).toDF("b")
        .select(PpmResize(col("b"), 26755, 26755)).head()
    }
    assert(e.getMessage.contains("2 GiB") ||
      Option(e.getCause).exists(_.getMessage.contains("2 GiB")), e.getMessage)
  }

  test("map-only codegen'd plan; SQL registration") {
    val plan = graft.pipeline.Multimodal
      .mediaTablePpm(graft.core.Tables.documents(spark, sf("sf0.001")))
      .select(PpmDecode(col("payload")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("Exchange"), plan)
    graft.functions.GraftExtensions.register(spark)
    val s = spark.sql(
      "SELECT ppm_decode(encode('P6\n1 1\n255\nABC', 'UTF-8')).sum_r AS r")
      .head().getLong(0)
    assert(s === 'A'.toLong)
  }
}
