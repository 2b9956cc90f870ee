package graft

import org.apache.spark.sql.functions._

import graft.functions.{ImageDHash, MediaDecode, TiffDecode}
import graft.pipeline.Multimodal

/** Baseline-TIFF decode: hand-built byte-exact fixtures for the IFD
  * walk and the white-is-zero trap, BOTH referee directions against
  * `javax.imageio` (the JDK's independent TIFF plugin), the own-encoder
  * round trip across every arm the gate cycles (byte order ×
  * photometric × compression × predictor × strip split), raster-seam
  * agreement with the statistics fold, cross-format dHash equality,
  * and the strict malformation nulls.
  */
class TiffDecodeSpec extends SparkSpec {
  import spark.implicits._

  /** Tiny byte-order-aware TIFF builder for hand fixtures. */
  private def handTiff(
      le: Boolean, entries: Seq[(Int, Int, Int, Array[Byte])],
      tail: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def p16(v: Int): Unit =
      if (le) { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      else { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    def p32(v: Int): Unit =
      if (le) { p16(v & 0xffff); p16(v >>> 16) } else { p16(v >>> 16); p16(v & 0xffff) }
    bos.write(if (le) 'I' else 'M'); bos.write(if (le) 'I' else 'M')
    p16(42); p32(8)
    p16(entries.length)
    entries.foreach { case (tag, typ, count, value) =>
      p16(tag); p16(typ); p32(count)
      val before = bos.size()
      value.foreach(b => bos.write(b & 0xff))
      while (bos.size() < before + 4) bos.write(0)
    }
    p32(0)
    bos.write(tail, 0, tail.length)
    bos.toByteArray
  }

  private def i16(le: Boolean, v: Int): Array[Byte] =
    if (le) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    else Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def i32(le: Boolean, v: Int): Array[Byte] =
    if (le) i16(le, v & 0xffff) ++ i16(le, v >>> 16)
    else i16(le, v >>> 16) ++ i16(le, v & 0xffff)

  /** 2×2 gray uncompressed fixture: samples 10, 200, 30, 255; data
    * right after the IFD (offset 8 + 2 + 8·12 + 4 = 110).
    */
  private def gray2x2(le: Boolean, photometric: Int): Array[Byte] = handTiff(le, Seq(
    (256, 3, 1, i16(le, 2)), (257, 3, 1, i16(le, 2)),
    (258, 3, 1, i16(le, 8)), (259, 3, 1, i16(le, 1)),
    (262, 3, 1, i16(le, photometric)), (273, 4, 1, i32(le, 110)),
    (277, 3, 1, i16(le, 1)), (279, 4, 1, i32(le, 4))),
    Array[Byte](10, 200.toByte, 30, 255.toByte))

  test("hand-built 2x2 gray decodes in BOTH byte orders; white-is-zero INVERTS") {
    for (le <- Seq(true, false)) {
      val r = TiffDecode.decode(gray2x2(le, photometric = 1))
      assert(r != null, s"le=$le")
      assert(r.getInt(0) === 2 && r.getInt(1) === 2 && r.getLong(2) === 4L)
      assert(r.getLong(3) === 10L + 200 + 30 + 255)
      assert(r.getLong(4) === r.getLong(3) && r.getLong(5) === r.getLong(3))
      // thumb: 2x2 source → thumb IS the image, row-major
      assert(r.getUTF8String(6).toString ===
        "0a0a0a" + "c8c8c8" + "1e1e1e" + "ffffff")
      val r0 = TiffDecode.decode(gray2x2(le, photometric = 0))
      assert(r0.getLong(3) === (255L - 10) + (255 - 200) + (255 - 30) + 0)
      assert(r0.getUTF8String(6).toString ===
        "f5f5f5" + "373737" + "e1e1e1" + "000000")
    }
  }

  test("referee 1: javax.imageio-written TIFFs (every compression) decode exactly") {
    val w = 7; val h = 5
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 37 + y) % 256) << 16 | ((y * 91 + x * 3) % 256) << 8 | ((x * y * 7) % 256))
    var expR = 0L; var expG = 0L; var expB = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      expR += (p >> 16) & 0xff; expG += (p >> 8) & 0xff; expB += p & 0xff
    }
    for (ct <- Seq(null, "LZW", "PackBits", "Deflate", "ZLib")) {
      val bytes = writeImageIoTiff(img, ct)
      val r = TiffDecode.decode(bytes)
      assert(r != null, s"compression $ct decoded null")
      assert(r.getInt(0) === w && r.getInt(1) === h)
      assert(r.getLong(3) === expR && r.getLong(4) === expG && r.getLong(5) === expB,
        s"compression $ct sums")
    }
    // gray and indexed variants through the same writer
    val gimg = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) gimg.getRaster.setSample(x, y, 0, (x * 31 + y * 17) % 256)
    val gr = TiffDecode.decode(writeImageIoTiff(gimg, "LZW"))
    assert(gr != null)
    val gExp = (for (y <- 0 until h; x <- 0 until w) yield ((x * 31 + y * 17) % 256).toLong).sum
    assert(gr.getLong(3) === gExp && gr.getLong(4) === gExp && gr.getLong(5) === gExp)
    val cmap = Array.tabulate(256)(j => j.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256,
      Array.tabulate(256)(j => ((j * 7 + 13) % 256).toByte),
      Array.tabulate(256)(j => ((j * 11 + 5) % 256).toByte),
      Array.tabulate(256)(j => ((j * 3 + 77) % 256).toByte))
    val pimg = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w) pimg.getRaster.setSample(x, y, 0, (x + y * w) % 256)
    val prr = TiffDecode.decode(writeImageIoTiff(pimg, "PackBits"))
    assert(prr != null)
    var peR = 0L
    for (y <- 0 until h; x <- 0 until w) peR += ((x + y * w) % 256 * 7 + 13) % 256
    assert(prr.getLong(3) === peR, "palette reds through the 16-bit colormap")
  }

  private def writeImageIoTiff(
      img: java.awt.image.BufferedImage, compression: String): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val params = writer.getDefaultWriteParam
    if (compression != null) {
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionType(compression)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(out)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { writer.dispose(); out.close() }
    bos.toByteArray
  }

  test("referee 2: javax.imageio READS graft-encoded TIFFs pixel-for-pixel") {
    val px = "0123456789abcdef0123456789abcdef0123456789abcdef0123456789abcdef" * 3
    for {
      le <- Seq(true, false)
      p <- Seq(0, 1, 2, 3)
      comp <- Seq(1, 5, 8, 32773)
      pred <- if (comp == 5 || comp == 8) Seq(1, 2) else Seq(1)
    } {
      val w = 5; val h = 4
      val need = w * h * (if (p == 2) 3 else 1)
      val bytes = Multimodal.encodeTiff(le, p, comp, pred, 2, w, h, px.substring(0, need))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected le=$le p=$p comp=$comp pred=$pred")
      assert(img.getWidth === w && img.getHeight === h)
      val r = TiffDecode.decode(bytes)
      assert(r != null)
      // gray TIFFs read back as TYPE_BYTE_GRAY, where getRGB would pass
      // through the NON-LINEAR gray→sRGB ICC conversion — compare in
      // sample space for single-band images (ImageIO delivers
      // white-is-zero already inverted), color space for the rest
      var sr = 0L
      val gray = img.getColorModel.getColorSpace.getType == java.awt.color.ColorSpace.TYPE_GRAY
      for (y <- 0 until h; x <- 0 until w)
        sr += (if (gray) img.getRaster.getSample(x, y, 0) else (img.getRGB(x, y) >> 16) & 0xff)
      assert(r.getLong(3) === sr, s"red sums vs ImageIO le=$le p=$p comp=$comp pred=$pred")
    }
  }

  test("own-encoder round trip: every gate arm, exact sums from the px derivation") {
    val px = ("00112233445566778899aabbccddeeff" * 8)
    for {
      le <- Seq(true, false)
      p <- Seq(0, 1, 2, 3)
      comp <- Seq(1, 5, 8, 32773)
      pred <- if (comp == 5 || comp == 8) Seq(1, 2) else Seq(1)
      rps <- Seq(1, 3, 7)
    } {
      val w = 6; val h = 7
      val need = w * h * (if (p == 2) 3 else 1)
      val s = px.substring(0, need)
      val r = TiffDecode.decode(Multimodal.encodeTiff(le, p, comp, pred, rps, w, h, s))
      assert(r != null, s"le=$le p=$p comp=$comp pred=$pred rps=$rps")
      val expected = p match {
        case 2 => (0 until w * h).map(i => (s.charAt(3 * i) & 0xff).toLong).sum
        case 1 => (0 until w * h).map(i => (s.charAt(i) & 0xff).toLong).sum
        case 0 => (0 until w * h).map(i => 255L - (s.charAt(i) & 0xff)).sum
        case 3 => (0 until w * h).map(i => (((s.charAt(i) & 0xff) * 7 + 13) % 256).toLong).sum
      }
      assert(r.getLong(3) === expected, s"le=$le p=$p comp=$comp pred=$pred rps=$rps")
    }
  }

  test("raster seam agrees with the fold; P6 and TIFF of the same raster dHash EQUAL") {
    val px = "fedcba9876543210fedcba9876543210fedcba9876543210fedcba9876543210"
    val w = 4; val h = 5
    val tiff = Multimodal.encodeTiff(le = true, 2, 5, 2, 2, w, h, px.substring(0, w * h * 3))
    val raster = TiffDecode.decodeRaster(tiff)
    assert(raster != null && raster.w === w && raster.h === h)
    var sr = 0L
    for (i <- 0 until w * h) sr += raster.rgb(3 * i) & 0xff
    assert(sr === TiffDecode.decode(tiff).getLong(3))
    val p6 = s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++
      px.substring(0, w * h * 3).getBytes("US-ASCII")
    val hT = ImageDHash.hash(tiff, 3, 2)
    val hP = ImageDHash.hash(p6, 3, 2)
    assert(hT != null && hP != null)
    assert(hT.getUTF8String(0).toString === "tiff")
    assert(hT.getLong(3) === hP.getLong(3),
      "lossless containers of one raster must hash identically")
    // sniff dispatch
    val m = MediaDecode.decode(tiff)
    assert(m != null && m.getUTF8String(0).toString === "tiff")
    assert(m.getLong(4) === sr)
  }

  test("strict nulls: every out-of-scope or malformed layout refuses") {
    val good = Multimodal.encodeTiff(le = true, 1, 5, 1, 2, 4, 4,
      "0123456789abcdef")
    assert(TiffDecode.decode(good) != null)
    // truncated inside strip data
    assert(TiffDecode.decode(java.util.Arrays.copyOf(good, good.length - 3)) == null)
    // wrong version word
    val badVer = good.clone(); badVer(2) = 43
    assert(TiffDecode.decode(badVer) == null)
    // tile tags, planar 2, orientation 2, fillorder 2, predictor on
    // uncompressed, 16-bit samples, missing colormap, extra samples
    def with1(tag: Int, v: Int, drop: Int = -1): Array[Byte] = handTiff(le = true,
      Seq(
        (256, 3, 1, i16(le = true, 2)), (257, 3, 1, i16(le = true, 2)),
        (258, 3, 1, i16(le = true, 8)), (259, 3, 1, i16(le = true, 1)),
        (262, 3, 1, i16(le = true, 1)), (273, 4, 1, i32(le = true, 122)),
        (277, 3, 1, i16(le = true, 1)), (279, 4, 1, i32(le = true, 4)),
        (tag, 3, 1, i16(le = true, v)))
        .filterNot(_._1 == drop).sortBy(_._1),
      Array[Byte](1, 2, 3, 4))
    // baseline: the builder with a harmless extra tag still decodes
    assert(TiffDecode.decode(with1(296, 2)) != null)
    assert(TiffDecode.decode(with1(322, 16)) == null) // TileWidth
    assert(TiffDecode.decode(with1(284, 2)) == null) // planar separated
    assert(TiffDecode.decode(with1(274, 2)) == null) // orientation
    assert(TiffDecode.decode(with1(266, 2)) == null) // fillorder
    assert(TiffDecode.decode(with1(317, 2)) == null) // predictor w/o LZW
    assert(TiffDecode.decode(with1(339, 2)) == null) // float samples
    assert(TiffDecode.decode(with1(338, 0)) == null) // extra samples
    // 16-bit samples
    val b16 = handTiff(le = true, Seq(
      (256, 3, 1, i16(le = true, 2)), (257, 3, 1, i16(le = true, 2)),
      (258, 3, 1, i16(le = true, 16)), (259, 3, 1, i16(le = true, 1)),
      (262, 3, 1, i16(le = true, 1)), (273, 4, 1, i32(le = true, 110)),
      (277, 3, 1, i16(le = true, 1)), (279, 4, 1, i32(le = true, 8))),
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    assert(TiffDecode.decode(b16) == null)
    // photometric 3 without a colormap
    val noCmap = handTiff(le = true, Seq(
      (256, 3, 1, i16(le = true, 2)), (257, 3, 1, i16(le = true, 2)),
      (258, 3, 1, i16(le = true, 8)), (259, 3, 1, i16(le = true, 1)),
      (262, 3, 1, i16(le = true, 3)), (273, 4, 1, i32(le = true, 110)),
      (277, 3, 1, i16(le = true, 1)), (279, 4, 1, i32(le = true, 4))),
      Array[Byte](1, 2, 3, 4))
    assert(TiffDecode.decode(noCmap) == null)
    // strip byte count that disagrees with uncompressed geometry
    val shortStrip = handTiff(le = true, Seq(
      (256, 3, 1, i16(le = true, 2)), (257, 3, 1, i16(le = true, 2)),
      (258, 3, 1, i16(le = true, 8)), (259, 3, 1, i16(le = true, 1)),
      (262, 3, 1, i16(le = true, 1)), (273, 4, 1, i32(le = true, 110)),
      (277, 3, 1, i16(le = true, 1)), (279, 4, 1, i32(le = true, 3))),
      Array[Byte](1, 2, 3, 4))
    assert(TiffDecode.decode(shortStrip) == null)
    // LZW stream whose data ends before EOI
    val lzwGood = Multimodal.encodeTiff(le = true, 1, 5, 1, 4, 4, 4, "0123456789abcdef")
    assert(TiffDecode.decode(java.util.Arrays.copyOf(lzwGood, lzwGood.length - 1)) == null)
    // wrong magic entirely
    assert(TiffDecode.decode("not a tiff at all".getBytes("UTF-8")) == null)
    assert(TiffDecode.decode(Array[Byte](73, 73)) == null)
  }

  test("LZW code-width boundaries (511/1023/2047): big strips, refereed both ways") {
    // 128×96 RGB = 36,864 bytes/strip-set — the dictionary crosses every
    // width bump (the gate's tiny images never leave 9-bit codes, which
    // is exactly where an encoder/decoder early-change misalignment
    // hides; regression for the one found during development)
    val w = 128; val h = 96
    val px = {
      val sb = new java.lang.StringBuilder(w * h * 3)
      var i = 0
      while (sb.length < w * h * 3) { sb.append("%08x".format(i * 2654435761L & 0xffffffffL)); i += 1 }
      sb.substring(0, w * h * 3)
    }
    val expected = (0 until w * h).map(i => (px.charAt(3 * i) & 0xff).toLong).sum
    for (le <- Seq(true, false); pred <- Seq(1, 2); rps <- Seq(h, 17)) {
      val bytes = Multimodal.encodeTiff(le, 2, 5, pred, rps, w, h, px)
      val r = TiffDecode.decode(bytes)
      assert(r != null, s"le=$le pred=$pred rps=$rps")
      assert(r.getLong(3) === expected, s"le=$le pred=$pred rps=$rps")
      // referee: the JDK reader accepts the same bytes pixel-for-pixel
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected le=$le pred=$pred rps=$rps")
      var sr = 0L
      for (y <- 0 until h; x <- 0 until w) sr += (img.getRGB(x, y) >> 16) & 0xff
      assert(sr === expected, s"ImageIO read differs le=$le pred=$pred rps=$rps")
    }
    // and the other direction: a JDK-written LZW image of the same size
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val i = y * w + x
      img.setRGB(x, y, ((px.charAt(3 * i) & 0xff) << 16) |
        ((px.charAt(3 * i + 1) & 0xff) << 8) | (px.charAt(3 * i + 2) & 0xff))
    }
    val r2 = TiffDecode.decode(writeImageIoTiff(img, "LZW"))
    assert(r2 != null && r2.getLong(3) === expected, "JDK-encoded big LZW")
  }

  test("the expression path (codegen) matches eval, nulls included") {
    val rows = Seq(
      (1L, Multimodal.encodeTiff(le = false, 2, 8, 2, 2, 3, 3, "0123456789abcdefghijklmnopq")),
      (2L, "raw text".getBytes("UTF-8")))
    val out = rows.toDF("media_id", "payload")
      .select(col("media_id"), TiffDecode(col("payload")).as("d"))
      .select(col("media_id"), col("d.width"), col("d.sum_r"))
      .orderBy("media_id").collect()
    assert(out(0).getInt(1) === 3)
    val direct = TiffDecode.decode(rows.head._2)
    assert(out(0).getLong(2) === direct.getLong(3))
    assert(out(1).isNullAt(1))
  }
}
