package graft

import java.awt.geom.AffineTransform
import java.awt.image.{AffineTransformOp, BufferedImage}

import graft.functions.{JpegDecode, JpegOriented, JpegOrientedBands, Orient}
import graft.pipeline.Multimodal

/** EXIF-orientation-applied decode: the coordinate maps for all 8
  * orientations pinned against ImageIO AffineTransformOp references
  * (the independent referee), end-to-end payload decode upright-ness,
  * no-EXIF pass-through, and the band judge's discrimination.
  */
class JpegOrientedSpec extends SparkSpec {

  /** ImageIO reference: upright view of `src` under EXIF orientation o
    * via the standard AffineTransform compositions (exact nearest-
    * neighbor quadrant ops — no resampling error).
    */
  private def imageioUpright(src: BufferedImage, o: Int): BufferedImage = {
    val w = src.getWidth; val h = src.getHeight
    val t = new AffineTransform()
    o match {
      case 1 => ()
      case 2 => t.translate(w, 0); t.scale(-1, 1)
      case 3 => t.translate(w, h); t.quadrantRotate(2)
      case 4 => t.translate(0, h); t.scale(1, -1)
      case 5 => t.setTransform(0, 1, 1, 0, 0, 0)
      case 6 => t.translate(h, 0); t.quadrantRotate(1)
      case 7 => t.setTransform(0, -1, -1, 0, h, w)
      case 8 => t.translate(0, w); t.quadrantRotate(3)
    }
    val (ow, oh) = if (o >= 5) (h, w) else (w, h)
    val dst = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
    new AffineTransformOp(t, AffineTransformOp.TYPE_NEAREST_NEIGHBOR).filter(src, dst)
    dst
  }

  private def toImage(r: JpegDecode.Raster): BufferedImage = {
    val img = new BufferedImage(r.w, r.h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < r.h) {
      var x = 0
      while (x < r.w) {
        val j = 3 * (y * r.w + x)
        img.setRGB(x, y,
          ((r.rgb(j) & 0xff) << 16) | ((r.rgb(j + 1) & 0xff) << 8) | (r.rgb(j + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    img
  }

  // a 5x3 noise raster: asymmetric dims catch w/h swaps, noise catches
  // any coordinate mix-up
  private val seedRaster: JpegDecode.Raster = {
    val px = "0f3a96c2e4517d8b0a6f294c83d1e5b7f09a4c26e8d3715b0c9f6a2d4e8137".take(45)
    new JpegDecode.Raster(5, 3, 3, px.map(c => (c & 0xff).toByte).toArray)
  }

  test("Orient.transformRaster matches ImageIO AffineTransformOp for all 8 orientations") {
    for (o <- 1 to 8) {
      val ours = Orient.transformRaster(seedRaster, o)
      val ref = imageioUpright(toImage(seedRaster), o)
      assert(ours.w === ref.getWidth && ours.h === ref.getHeight, s"o=$o dims")
      var y = 0
      while (y < ours.h) {
        var x = 0
        while (x < ours.w) {
          val j = 3 * (y * ours.w + x)
          val got = ((ours.rgb(j) & 0xff) << 16) |
            ((ours.rgb(j + 1) & 0xff) << 8) | (ours.rgb(j + 2) & 0xff)
          assert(got === (ref.getRGB(x, y) & 0xffffff), s"o=$o pixel ($x,$y)")
          x += 1
        }
        y += 1
      }
    }
  }

  /** Gradient upright raster + its stored (inverse-transformed) JPEG
    * with an EXIF APP1 carrying orientation o — the generator shape.
    */
  private def orientedPayload(
      o: Int, bw: Int, bh: Int, bConst: Int,
      withExif: Boolean = true): (Array[Byte], Array[Char]) = {
    val upright = new Array[Char](bw * bh * 3)
    for (y <- 0 until bh; x <- 0 until bw) {
      val d = 3 * (y * bw + x)
      upright(d) = ((x * 191) / (bw - 1)).toChar
      upright(d + 1) = ((y * 191) / (bh - 1)).toChar
      upright(d + 2) = bConst.toChar
    }
    val (sw, sh) = if (o >= 5) (bh, bw) else (bw, bh)
    val stored = new Array[Char](bw * bh * 3)
    for (y <- 0 until bh; x <- 0 until bw) {
      val s = 3 * Orient.srcIndex(o, sw, sh, x, y)
      val d = 3 * (y * bw + x)
      stored(s) = upright(d); stored(s + 1) = upright(d + 1); stored(s + 2) = upright(d + 2)
    }
    val jpeg = Multimodal.encodeRaster(
      "jpeg", sw, sh, rgba = false, new String(stored), quality = 0.97f)
    val payload =
      if (!withExif) jpeg
      else jpeg.take(2) ++ Multimodal.exifApp1(
        little = o % 2 == 0, orientation = o,
        datetime = "2022:01:05 09:00:00", make = "cam_x", model = "mx_y") ++ jpeg.drop(2)
    (payload, upright)
  }

  test("end-to-end: all 8 orientations decode to the upright gradient (ImageIO referee)") {
    for (o <- 1 to 8) {
      val (payload, upright) = orientedPayload(o, bw = 28, bh = 25, bConst = 90)
      val r = JpegOriented.decode(payload)
      assert(r != null, s"o=$o must decode")
      assert(r.getInt(0) === 28 && r.getInt(1) === 25, s"o=$o upright dims")
      assert(r.getInt(2) === o, s"o=$o orientation")
      // thumb vs the upright FORMULA (positional discrimination): each
      // channel within a lossy-decode tolerance
      val thumb = r.getUTF8String(7).toString
      var k = 0
      for (ty <- 0 to 1; tx <- 0 to 1) {
        val px = (tx * 28) / 2; val py = (ty * 25) / 2
        val d = 3 * (py * 28 + px)
        for (c <- 0 until 3) {
          val got = Integer.parseInt(thumb.substring(k, k + 2), 16)
          val want = upright(d + c) & 0xff
          assert(math.abs(got - want) <= 12,
            s"o=$o thumb ($tx,$ty) ch$c: got $got want $want")
          k += 2
        }
      }
      // independent referee: ImageIO decodes the same payload (ignoring
      // EXIF), the AffineTransform reference uprights it, thumbs agree
      val im0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      // normalize to TYPE_INT_RGB: AffineTransformOp refuses some
      // decoder-native layouts (TYPE_3BYTE_BGR) for flip transforms
      val im = new BufferedImage(im0.getWidth, im0.getHeight, BufferedImage.TYPE_INT_RGB)
      im.getGraphics.drawImage(im0, 0, 0, null)
      val ref = imageioUpright(im, o)
      k = 0
      for (ty <- 0 to 1; tx <- 0 to 1) {
        val px = (tx * 28) / 2; val py = (ty * 25) / 2
        val rgb = ref.getRGB(px, py)
        for ((shift, c) <- Seq(16, 8, 0).zipWithIndex) {
          val got = Integer.parseInt(thumb.substring(k, k + 2), 16)
          val want = (rgb >> shift) & 0xff
          assert(math.abs(got - want) <= 6,
            s"o=$o vs ImageIO thumb ($tx,$ty) ch$c: got $got want $want")
          k += 2
        }
      }
    }
  }

  test("no-EXIF payloads pass through unchanged as orientation 1") {
    val (payload, _) = orientedPayload(1, 28, 25, 90, withExif = false)
    val plain = JpegDecode.decode(payload)
    val oriented = JpegOriented.decode(payload)
    assert(plain != null && oriented != null)
    assert(oriented.getInt(2) === 1)
    assert(oriented.getInt(0) === plain.getInt(0))
    assert(oriented.getInt(1) === plain.getInt(1))
    assert(oriented.getLong(4) === plain.getLong(4)) // sum_r
    assert(oriented.getUTF8String(7) === plain.getUTF8String(7)) // thumb
    // undecodable payloads stay null
    assert(JpegOriented.decode("not a jpeg".getBytes("UTF-8")) == null)
  }

  test("channel sums are orientation-invariant; geometry swaps for 5..8") {
    val (p1, _) = orientedPayload(1, 28, 25, 90)
    val (p6, _) = orientedPayload(6, 28, 25, 90)
    val r1 = JpegOriented.decode(p1)
    val r6 = JpegOriented.decode(p6)
    // same upright geometry even though the stored rasters are swapped
    assert(r1.getInt(0) === r6.getInt(0) && r1.getInt(1) === r6.getInt(1))
    // the STORED-orientation decode of the o=6 payload has swapped dims
    val plain6 = JpegDecode.decode(orientedPayload(6, 28, 25, 90)._1)
    assert(plain6.getInt(0) === 25 && plain6.getInt(1) === 28)
  }

  test("band judge: good rows in band; skipped/wrong rotation flips the bands") {
    for (o <- 1 to 8) {
      val (payload, upright) = orientedPayload(o, 28, 25, 90)
      val j = JpegOrientedBands.judge(payload, new String(upright), 12, 8.0)
      assert(j != null, s"o=$o judge")
      assert(j.getInt(0) === 28 && j.getInt(1) === 25 && j.getInt(2) === o)
      assert(j.getBoolean(4), s"o=$o thumb_ok")
      assert(j.getBoolean(5), s"o=$o mae band")
    }
    // NEGATIVE: an upright-stored image mis-tagged orientation 3 (the
    // judge "applies" a rotation that shouldn't be there — exactly what
    // a kernel that misreads the tag would produce) lands out of band
    val (untagged, upright) = orientedPayload(1, 28, 25, 90, withExif = false)
    val misTagged = untagged.take(2) ++ Multimodal.exifApp1(
      little = true, orientation = 3,
      datetime = "2022:01:05 09:00:00", make = "cam_x", model = "mx_y") ++ untagged.drop(2)
    val j3 = JpegOrientedBands.judge(misTagged, new String(upright), 12, 8.0)
    assert(j3 != null && !j3.getBoolean(4), "misapplied rotation must flip thumb_ok")
    assert(!j3.getBoolean(5), "misapplied rotation must flip the MAE band")
    // geometry disagreement (orientation 6 tag on a non-square upright
    // expectation of the WRONG shape) → null, not a silent pass
    val (p6, up6) = orientedPayload(6, 28, 25, 90)
    assert(JpegOrientedBands.judge(p6, new String(up6).substring(3), 12, 8.0) == null)
  }
}
