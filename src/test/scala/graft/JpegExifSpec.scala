package graft

import graft.functions.{JpegDecode, JpegExif}
import graft.pipeline.Multimodal

/** The EXIF APP1 walk: both TIFF byte orders, inline left-justified
  * SHORT values, strings at offsets, the no-EXIF null row, malformed
  * TIFF rejection, and composition — the same payload carrying EXIF
  * AND a decodable image serves both operators.
  */
class JpegExifSpec extends SparkSpec {

  private def payload(little: Boolean): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Multimodal.exifApp1(little, orientation = 6,
        datetime = "2021:07:04 10:00:59", make = "cam_web", model = "mx_en") ++
      "body".getBytes("UTF-8")

  test("both byte orders extract identical fields") {
    for (little <- Seq(true, false)) {
      val r = JpegExif.extract(payload(little))
      assert(r != null, s"little=$little")
      assert(r.getInt(0) === 6)
      assert(r.getUTF8String(1).toString === "2021:07:04 10:00:59")
      assert(r.getUTF8String(2).toString === "cam_web")
      assert(r.getUTF8String(3).toString === "mx_en")
    }
  }

  test("no-EXIF, bad magic, malformed TIFF and truncations null (never throw)") {
    // SOI + body, no APP1
    assert(JpegExif.extract(
      Array[Byte](0xff.toByte, 0xd8.toByte) ++ "plain".getBytes) == null)
    assert(JpegExif.extract("not a jpeg".getBytes) == null)
    val good = payload(little = true)
    // corrupt the TIFF byte-order mark
    val badBom = good.clone()
    badBom(12) = 'X' // 2 SOI + 2 marker + 2 len + 6 "Exif\0\0" → TIFF at 12
    assert(JpegExif.extract(badBom) == null)
    // truncations at every prefix never throw
    for (cut <- 2 until good.length)
      JpegExif.extract(java.util.Arrays.copyOfRange(good, 0, cut))
    // out-of-range orientation → that FIELD nulls, the row survives
    // (orientation is a 1..8 enum; 0 is reserved)
    val badOrient = good.clone()
    // the orientation entry's inline value: find tag 0x0112 (LE: 12 01)
    var i = 12
    var found = -1
    while (i + 1 < badOrient.length && found < 0) {
      if ((badOrient(i) & 0xff) == 0x12 && (badOrient(i + 1) & 0xff) == 0x01) found = i
      i += 1
    }
    assert(found > 0)
    badOrient(found + 8) = 0 // value 0 (reserved)
    val r = JpegExif.extract(badOrient)
    assert(r != null && r.isNullAt(0) && !r.isNullAt(1))
  }

  test("composition: APP1 spliced into a REAL encoded JPEG serves exif AND decode") {
    val jpeg = Multimodal.encodeRaster("jpeg", 8, 8, rgba = false,
      "0123456789abcdef" * 12, quality = 0.95f)
    val app1 = Multimodal.exifApp1(little = true, orientation = 3,
      datetime = "2020:01:02 03:04:05", make = "cam_x", model = "mx_y")
    val spliced = jpeg.take(2) ++ app1 ++ jpeg.drop(2)
    val e = JpegExif.extract(spliced)
    assert(e != null && e.getInt(0) === 3)
    val d = JpegDecode.decodeRaster(spliced)
    assert(d != null && d.w === 8 && d.h === 8,
      "an APP1 segment must not break the pixel decode")
    val plain = JpegDecode.decodeRaster(jpeg)
    assert(java.util.Arrays.equals(d.rgb, plain.rgb))
  }

  test("expression path: the gate's shape with null rows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Seq(
      (1L, payload(little = true)),
      (2L, "junk".getBytes("UTF-8")))
    val out = rows.toDF("media_id", "payload")
      .select(col("media_id"), JpegExif(col("payload")).as("e"))
      .select(col("media_id"), col("e.orientation"), col("e.make"))
      .orderBy("media_id").collect()
    assert(out(0).getInt(1) === 6 && out(0).getString(2) === "cam_web")
    assert(out(1).isNullAt(1))
  }
}
