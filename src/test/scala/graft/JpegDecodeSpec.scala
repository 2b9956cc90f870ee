package graft

import java.io.ByteArrayOutputStream

import graft.functions.JpegDecode

/** The from-scratch baseline JPEG kernel against REAL encoded bytes from
  * the independent javax.imageio encoder (the encode side stays ImageIO,
  * so every assertion here is a true cross-implementation check: our
  * Huffman/IDCT/upsample path must agree with what a foreign encoder
  * wrote).
  */
class JpegDecodeSpec extends SparkSpec {

  private def encodeGray(w: Int, h: Int, px: (Int, Int) => Int, quality: Float): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    // RAW raster samples, not setRGB: TYPE_BYTE_GRAY's setRGB/getRGB
    // convert through the linear gray color space — the encoder codes
    // the raw samples, which is what the decode contract is about
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(x, y) & 0xff)
    encodeImg(img, quality)
  }

  private def encodeRgb(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int), quality: Float): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
    }
    encodeImg(img, quality)
  }

  private def encodeImg(
      img: java.awt.image.BufferedImage, quality: Float,
      progressive: Boolean = false): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    if (progressive)
      params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val out = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(out)
    try writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    finally { writer.dispose(); out.close() }
    bos.toByteArray
  }

  private def imageioRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    (im.getWidth, im.getHeight, im.getRGB(0, 0, im.getWidth, im.getHeight, null, 0, im.getWidth))
  }

  test("grayscale: agrees with ImageIO's decoder within IDCT rounding") {
    // 1 component — no chroma upsampling in play, so the ONLY legal
    // divergence between two correct decoders is IDCT rounding (T.81
    // A.3.3 note: IDCT output is implementation-defined within ±1)
    for ((w, h, q) <- Seq((8, 8, 0.97f), (16, 24, 0.97f), (13, 9, 0.8f), (64, 40, 0.5f))) {
      val bytes = encodeGray(w, h, (x, y) => (x * 31 + y * 17 + (x * y) % 23) % 256, q)
      val r = JpegDecode.decodeRaster(bytes)
      assert(r != null, s"decode failed for ${w}x$h q=$q")
      assert(r.w === w && r.h === h && r.nComp === 1)
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(im.getWidth === w && im.getHeight === h)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        // raw samples again — getRGB would run the gray→sRGB conversion
        val d = math.abs(im.getRaster.getSample(x, y, 0) - (r.rgb(3 * (y * w + x)) & 0xff))
        if (d > maxDiff) maxDiff = d
      }
      assert(maxDiff <= 2, s"grayscale ${w}x$h q=$q: max per-pixel diff $maxDiff > 2")
    }
  }

  test("color 4:2:0: mean parity with ImageIO; fidelity vs source not worse than ImageIO's") {
    // chroma upsampling filters legitimately differ (we replicate per
    // T.81 A.3.3's note, the JDK triangle-filters), so per-pixel
    // equality between decoders is not the contract. Two contracts ARE:
    //   1. per-channel MEANS agree with ImageIO to ≤ 2 counts — a
    //      channel-order or geometry bug shifts means by tens;
    //   2. MAE against the PRE-ENCODE source is not worse than
    //      ImageIO's own (+2 slack) — our upsampling choice must not
    //      cost fidelity (measured: replication is slightly CLOSER on
    //      noise, 49.6 vs 55.3).
    val cases = Seq[(Int, Int, (Int, Int) => (Int, Int, Int))](
      (32, 32, (x, y) => (x * 8 % 256, y * 8 % 256, (x + y) * 4 % 256)),  // smooth ramps
      (17, 23, (x, y) => ((x * 97 + y * 31) % 256, (x * 53 + y * 71) % 256, (x * 13 + y * 119) % 256)), // noise
      (8, 8, (_, _) => (200, 30, 120)),                                   // flat color
      (40, 12, (x, y) => (if (x < 20) 255 else 0, if (y < 6) 255 else 0, 128))) // hard edges
    for ((w, h, px) <- cases) {
      val bytes = encodeRgb(w, h, px, 0.97f)
      val r = JpegDecode.decodeRaster(bytes)
      assert(r != null, s"decode failed for ${w}x$h")
      assert(r.w === w && r.h === h && r.nComp === 3)
      val (_, _, rgbs) = imageioRgb(bytes)
      var dr = 0L; var dg = 0L; var db = 0L       // mine vs ImageIO, signed
      val mineMae = Array(0L, 0L, 0L)             // mine vs source
      val iioMae = Array(0L, 0L, 0L)              // ImageIO vs source
      for (i <- 0 until w * h) {
        val (sr, sg, sb) = px(i % w, i / w)
        val er = (rgbs(i) >> 16) & 0xff; val eg = (rgbs(i) >> 8) & 0xff; val eb = rgbs(i) & 0xff
        val or = r.rgb(3 * i) & 0xff; val og = r.rgb(3 * i + 1) & 0xff; val ob = r.rgb(3 * i + 2) & 0xff
        dr += or - er; dg += og - eg; db += ob - eb
        mineMae(0) += math.abs(or - sr); mineMae(1) += math.abs(og - sg); mineMae(2) += math.abs(ob - sb)
        iioMae(0) += math.abs(er - sr); iioMae(1) += math.abs(eg - sg); iioMae(2) += math.abs(eb - sb)
      }
      val n = (w * h).toDouble
      assert(math.abs(dr / n) <= 2.0 && math.abs(dg / n) <= 2.0 && math.abs(db / n) <= 2.0,
        s"${w}x$h: mean diff vs ImageIO (${dr / n}, ${dg / n}, ${db / n})")
      for (k <- 0 until 3)
        assert(mineMae(k) / n <= iioMae(k) / n + 2.0,
          s"${w}x$h ch$k: MAE vs source ${mineMae(k) / n} worse than ImageIO's ${iioMae(k) / n}")
    }
  }

  test("malformed and out-of-scope payloads decode to null, never throw") {
    val good = encodeRgb(16, 16, (x, y) => (x * 16, y * 16, 128), 0.9f)
    assert(JpegDecode.decodeRaster(good) != null)
    // corrupt magic
    val corrupt = good.clone(); corrupt(0) = (corrupt(0) ^ 0x77).toByte
    assert(JpegDecode.decodeRaster(corrupt) == null)
    // raw text
    assert(JpegDecode.decodeRaster("not a jpeg at all".getBytes("UTF-8")) == null)
    // truncations at every length below the full payload must not throw
    for (cut <- Seq(2, 4, 20, good.length / 2, good.length - 1))
      JpegDecode.decodeRaster(java.util.Arrays.copyOfRange(good, 0, cut)) // no throw
    // truncated entropy data specifically → null (strict contract)
    assert(JpegDecode.decodeRaster(
      java.util.Arrays.copyOfRange(good, 0, good.length - 10)) == null)
    // progressive JPEG (SOF2) → null, not garbage: flip SOF0's marker to
    // SOF2 — the structure is otherwise intact so only the SOF dispatch
    // can reject it
    val prog = good.clone()
    var i = 2
    var flipped = false
    while (i + 1 < prog.length && !flipped) {
      if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0) {
        prog(i + 1) = 0xc2.toByte; flipped = true
      }
      i += 1
    }
    assert(flipped)
    assert(JpegDecode.decodeRaster(prog) == null)
  }

  test("restart markers: DRI honored, DC predictors reset, wrong RST index nulls") {
    // the JDK encoder never writes DRI, so this path gets a hand-built
    // file: 8x16 grayscale, two MCUs with restart interval 1, trivial
    // canonical tables (DC: one 1-bit code → category 0; AC: one 1-bit
    // code → EOB). Each block is bits "00" → byte 0x3F after 1-padding;
    // all-zero coefficients decode to flat 128 after the level shift.
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val dqt = bytes(0xff, 0xdb, 0x00, 0x43, 0x00) ++ Array.fill(64)(1.toByte)
    val sof = bytes(0xff, 0xc0, 0x00, 0x0b, 8, 0x00, 16, 0x00, 8, 1, 1, 0x11, 0)
    val dhtDc = bytes(0xff, 0xc4, 0x00, 0x14, 0x00, 1) ++
      Array.fill(15)(0.toByte) ++ bytes(0x00)
    val dhtAc = bytes(0xff, 0xc4, 0x00, 0x14, 0x10, 1) ++
      Array.fill(15)(0.toByte) ++ bytes(0x00)
    val dri = bytes(0xff, 0xdd, 0x00, 0x04, 0x00, 0x01)
    val sos = bytes(0xff, 0xda, 0x00, 0x08, 1, 1, 0x00, 0, 63, 0)
    val head = bytes(0xff, 0xd8) ++ dqt ++ sof ++ dhtDc ++ dhtAc ++ dri ++ sos
    val good = head ++ bytes(0x3f, 0xff, 0xd0, 0x3f, 0xff, 0xd9)
    val r = JpegDecode.decodeRaster(good)
    assert(r != null, "restart-interval file must decode")
    assert(r.w === 8 && r.h === 16)
    assert(r.rgb.forall(b => (b & 0xff) === 128), "flat DC-only file decodes to 128s")
    // wrong restart index (RST3 where RST0 is due) → strict null
    val wrongIdx = head ++ bytes(0x3f, 0xff, 0xd3, 0x3f, 0xff, 0xd9)
    assert(JpegDecode.decodeRaster(wrongIdx) == null)
    // missing restart marker entirely → strict null
    val missing = head ++ bytes(0x3f, 0x3f, 0xff, 0xd9)
    assert(JpegDecode.decodeRaster(missing) == null)
    // T.81 B.1.1.2: 0xFF FILL bytes before RSTm are legal — a run of
    // them must not null the stream (ADVICE r17)
    val filled = head ++ bytes(0x3f, 0xff, 0xff, 0xff, 0xd0, 0x3f, 0xff, 0xd9)
    val rf = JpegDecode.decodeRaster(filled)
    assert(rf != null, "fill bytes before RST0 must decode")
    assert(rf.rgb.forall(b => (b & 0xff) === 128))
  }

  test("progressive (SOF2): real multi-scan ImageIO streams decode; parity with the baseline contracts") {
    // the JDK writer's progressive mode emits genuine SOF2 spectral
    // selection + successive approximation scans (DC first/refine, AC
    // first/refine with EOB runs) — a full Annex-G exercise
    def isProgressive(b: Array[Byte]): Boolean = {
      var i = 2
      while (i + 1 < b.length) {
        if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc2) return true
        if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc0) return false
        i += 1
      }
      false
    }
    // grayscale: IDCT-rounding-only agreement with ImageIO
    for ((w, h, q) <- Seq((8, 8, 0.97f), (16, 24, 0.9f), (64, 40, 0.5f))) {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, (x * 31 + y * 17 + (x * y) % 23) % 256)
      val bytes = encodeImg(img, q, progressive = true)
      assert(isProgressive(bytes), "the JDK writer must emit SOF2 here")
      val r = JpegDecode.decodeRaster(bytes)
      assert(r != null, s"progressive gray ${w}x$h q=$q decode failed")
      assert(r.w === w && r.h === h && r.nComp === 1)
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs(im.getRaster.getSample(x, y, 0) - (r.rgb(3 * (y * w + x)) & 0xff))
        if (d > maxDiff) maxDiff = d
      }
      assert(maxDiff <= 2, s"progressive gray ${w}x$h q=$q: max diff $maxDiff")
    }
    // color 4:2:0: mean parity with ImageIO (chroma filters differ)
    for ((w, h) <- Seq((32, 32), (17, 23), (40, 12))) {
      val px = (x: Int, y: Int) => ((x * 97 + y * 31) % 256, (x * 53 + y * 71) % 256, (x * 13 + y * 119) % 256)
      val bytes = encodeRgbP(w, h, px, 0.95f)
      assert(isProgressive(bytes))
      val r = JpegDecode.decodeRaster(bytes)
      assert(r != null, s"progressive color ${w}x$h decode failed")
      val (_, _, rgbs) = imageioRgb(bytes)
      var dr = 0L; var dg = 0L; var db = 0L
      for (i <- 0 until w * h) {
        dr += (r.rgb(3 * i) & 0xff) - ((rgbs(i) >> 16) & 0xff)
        dg += (r.rgb(3 * i + 1) & 0xff) - ((rgbs(i) >> 8) & 0xff)
        db += (r.rgb(3 * i + 2) & 0xff) - (rgbs(i) & 0xff)
      }
      val n = (w * h).toDouble
      assert(math.abs(dr / n) <= 2.0 && math.abs(dg / n) <= 2.0 && math.abs(db / n) <= 2.0,
        s"progressive ${w}x$h: mean diff vs ImageIO (${dr / n}, ${dg / n}, ${db / n})")
    }
    // truncation at every prefix must never throw; mid-stream cuts null
    val full = encodeRgbP(16, 16, (x, y) => (x * 16, y * 16, 128), 0.9f)
    for (cut <- 2 until full.length by 7)
      JpegDecode.decodeRaster(java.util.Arrays.copyOfRange(full, 0, cut))
    assert(JpegDecode.decodeRaster(
      java.util.Arrays.copyOfRange(full, 0, full.length - 4)) == null,
      "no EOI -> null (coefficients incomplete)")
  }

  private def encodeRgbP(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int), quality: Float): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
    }
    encodeImg(img, quality, progressive = true)
  }

  test("progressive strictness: missing DC scans null; mid-frame DQT redefinition is latched") {
    val full = encodeRgbP(24, 16, (x, y) => (x * 11, y * 13, (x + y) * 7), 0.9f)
    // locate the scans
    def sosOffsets(b: Array[Byte]): Seq[Int] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 2
      while (i + 1 < b.length) {
        if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xda) out += i
        i += 1
      }
      out.toSeq
    }
    val sos = sosOffsets(full)
    assert(sos.size >= 2, "the JDK progressive writer emits multiple scans")
    // (a) truncate after the FIRST scan and re-append EOI: some
    // component never received its DC scan → strict null, not a gray
    // fabrication (the JDK's first progressive scan is DC for Y only
    // or interleaved DC at reduced precision — either way chroma AC /
    // refinements are missing; if the first scan happens to cover all
    // DC, cut before it instead)
    val cutAtFirst = java.util.Arrays.copyOfRange(full, 0, sos(1)) ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
    val r1 = JpegDecode.decodeRaster(cutAtFirst)
    // the first JDK scan is an interleaved DC-first covering ALL
    // components, so this CAN legally render; cutting before ANY scan
    // must null though
    val cutBeforeAll = java.util.Arrays.copyOfRange(full, 0, sos(0)) ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
    assert(JpegDecode.decodeRaster(cutBeforeAll) == null,
      "EOI with no scans at all must null")
    if (r1 != null) {
      // legal partial render: geometry still exact
      assert(r1.w === 24 && r1.h === 16)
    }
    // (b) a DQT redefinition between scans must NOT re-dequantize the
    // already-decoded scans: tables are latched at each component's
    // first scan, so the decode equals the unmodified stream's
    val bogusDqt = Array[Byte](0xff.toByte, 0xdb.toByte, 0x00, 0x43, 0x00) ++
      Array.fill(64)(1.toByte)
    val patched = java.util.Arrays.copyOfRange(full, 0, sos(1)) ++ bogusDqt ++
      java.util.Arrays.copyOfRange(full, sos(1), full.length)
    val want = JpegDecode.decodeRaster(full)
    val got = JpegDecode.decodeRaster(patched)
    assert(want != null && got != null)
    assert(java.util.Arrays.equals(got.rgb, want.rgb),
      "latched tables: a mid-frame DQT redefinition must not change the decode")
  }

  test("overfull canonical DHT (more codes than 2^l prefixes) nulls, never throws") {
    // counts[0] = 3 claims three 1-bit codes — canonically impossible
    // (T.81 C.2); the lookahead fill would index past its table. Found
    // by review; reproduced as AIOOBE before the validity guard.
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val evil = bytes(0xff, 0xd8, 0xff, 0xc4, 0x00, 0x16, 0x00, 3) ++
      Array.fill(15)(0.toByte) ++ bytes(0, 1, 2)
    assert(JpegDecode.decodeRaster(evil) == null)
    // and through the sniff dispatch too (any FFD8 payload routes here)
    assert(graft.functions.MediaDecode.decode(evil) == null)
  }

  test("single-component scan with sampling factors > 1 uses the non-interleaved grid") {
    // T.81 A.2.3: a one-component scan's MCU is ONE data unit and blocks
    // cover the frame in raster order — the 2x2 sampling factors in SOF
    // must NOT scale the grid. Hand-built 32x16 grayscale, 8 DC-only
    // blocks with distinct flat values: the k-th stream block must land
    // at raster position (k%4, k/4). An interleaved-grid decode places
    // stream block 2 at (0,1) instead of (2,0) — Huffman-valid, silently
    // scrambled.
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val dqt = bytes(0xff, 0xdb, 0x00, 0x43, 0x00) ++ Array.fill(64)(1.toByte)
    val sof = bytes(0xff, 0xc0, 0x00, 0x0b, 8, 0x00, 16, 0x00, 32, 1, 1, 0x22, 0)
    val dhtDc = bytes(0xff, 0xc4, 0x00, 0x14, 0x00, 1) ++
      Array.fill(15)(0.toByte) ++ bytes(0x04) // one 1-bit code -> category 4
    val dhtAc = bytes(0xff, 0xc4, 0x00, 0x14, 0x10, 1) ++
      Array.fill(15)(0.toByte) ++ bytes(0x00) // EOB
    val sos = bytes(0xff, 0xda, 0x00, 0x08, 1, 1, 0x00, 0, 63, 0)
    // per block: DC "0" + extra "1000" (+8) + EOB "0" = 010000; x8 blocks
    val entropy = bytes(0x41, 0x04, 0x10, 0x41, 0x04, 0x10)
    val jpeg = bytes(0xff, 0xd8) ++ dqt ++ sof ++ dhtDc ++ dhtAc ++ sos ++
      entropy ++ bytes(0xff, 0xd9)
    val r = JpegDecode.decodeRaster(jpeg)
    assert(r != null, "2x2-sampled grayscale must decode")
    assert(r.w === 32 && r.h === 16)
    // block k carries DC prediction 8(k+1) -> flat pixel 128 + (k+1)
    for (by <- 0 until 2; bx <- 0 until 4) {
      val k = by * 4 + bx
      val px = r.rgb(3 * ((by * 8 + 3) * 32 + bx * 8 + 3)) & 0xff
      assert(px === 128 + k + 1, s"block ($bx,$by) raster placement")
    }
  }

  test("expression surface: stats row matches a direct raster fold; null rows stay null") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val payloads = Seq(
      (1L, encodeRgb(12, 10, (x, y) => (x * 20, y * 25, (x + y) * 10), 0.95f)),
      (2L, "plain text".getBytes("UTF-8")),
      (3L, encodeGray(9, 9, (x, y) => x * 28 + y, 0.9f)))
    val df = payloads.toDF("media_id", "payload")
      .select(col("media_id"), JpegDecode(col("payload")).as("d"))
      .select(col("media_id"), col("d.width"), col("d.n_comp"), col("d.sum_r"), col("d.thumb_hex"))
      .orderBy("media_id")
      .collect()
    val direct = JpegDecode.decodeRaster(payloads.head._2)
    var sr = 0L
    for (i <- 0 until direct.w * direct.h) sr += direct.rgb(3 * i) & 0xff
    assert(df(0).getInt(1) === 12 && df(0).getInt(2) === 3 && df(0).getLong(3) === sr)
    assert(df(1).isNullAt(1))
    assert(df(2).getInt(1) === 9 && df(2).getInt(2) === 1)
    assert(df(2).getString(4).length === 24)
  }

  // ---- CMYK / APP14 (4-component) fixtures: DC-only blocks make the
  //      decode EXACT (IDCT of a constant block is flat), so the color
  //      contract is pinned byte-precisely without a lossy band ----

  /** The shared flat DC-only builder (the generator behind the CMYK
    * gate); the DECODER under test is independent of it and the
    * expected values below are hand-worked from the spec's transforms.
    */
  private def flatJpeg(comps: Seq[Int], transform: Int, w: Int = 8, h: Int = 8): Array[Byte] =
    graft.pipeline.Multimodal.encodeFlatJpeg(comps, transform, w, h)

  private def flatRgbOf(payload: Array[Byte]): (Int, Int, Int, Int) = {
    val r = JpegDecode.decodeRaster(payload)
    assert(r != null, "CMYK fixture must decode")
    // flat: every pixel identical — assert that and return pixel 0
    for (i <- 0 until r.w * r.h; c <- 0 until 3)
      assert(r.rgb(3 * i + c) === r.rgb(c), s"raster not flat at $i/$c")
    (r.nComp, r.rgb(0) & 0xff, r.rgb(1) & 0xff, r.rgb(2) & 0xff)
  }

  test("CMYK (APP14 transform 0, Adobe-inverted): RGB = c·k/255 exactly") {
    val (n, r, g, b) = flatRgbOf(flatJpeg(Seq(100, 150, 200, 250), transform = 0))
    assert(n === 4)
    assert((r, g, b) === ((98, 147, 196)))
  }

  test("YCCK (APP14 transform 2): JFIF YCbCr then ·k/255 exactly") {
    // Y=120 Cb=148 Cr=108 → R'G'B' = (92, 127, 155); k=230
    val (n, r, g, b) = flatRgbOf(flatJpeg(Seq(120, 148, 108, 230), transform = 2))
    assert(n === 4)
    assert((r, g, b) === ((83, 115, 140)))
  }

  test("4-component with NO Adobe marker: plain (non-inverted) CMYK") {
    val (n, r, g, b) = flatRgbOf(flatJpeg(Seq(55, 105, 155, 5), transform = -1))
    assert(n === 4)
    assert((r, g, b) === ((196, 147, 98)))
  }

  test("PROGRESSIVE 4-component CMYK/YCCK: the Annex-G path shares the color contract") {
    // SOF2 with one interleaved DC scan, completing at EOI — the same
    // flat values must decode byte-identically to the baseline form
    val p0 = graft.pipeline.Multimodal.encodeFlatJpeg(
      Seq(100, 150, 200, 250), transform = 0, w = 13, h = 11, progressive = true)
    val r0 = JpegDecode.decodeRaster(p0)
    assert(r0 != null, "progressive CMYK must decode")
    assert(r0.nComp === 4 && r0.w === 13)
    assert((r0.rgb(0) & 0xff, r0.rgb(1) & 0xff, r0.rgb(2) & 0xff) === ((98, 147, 196)))
    val p2 = graft.pipeline.Multimodal.encodeFlatJpeg(
      Seq(120, 148, 108, 230), transform = 2, w = 8, h = 8, progressive = true)
    val r2 = JpegDecode.decodeRaster(p2)
    assert(r2 != null)
    assert((r2.rgb(0) & 0xff, r2.rgb(1) & 0xff, r2.rgb(2) & 0xff) === ((83, 115, 140)))
  }

  test("multi-MCU flat CMYK: later MCUs carry zero diffs, decode stays exact") {
    val (n, r, g, b) = flatRgbOf(flatJpeg(Seq(100, 150, 200, 250), transform = 0, w = 13, h = 11))
    assert(n === 4)
    assert((r, g, b) === ((98, 147, 196)))
    val rast = JpegDecode.decodeRaster(flatJpeg(Seq(100, 150, 200, 250), 0, 13, 11))
    assert(rast.w === 13 && rast.h === 11)
  }

  test("invalid transform combinations null: YCbCr-coded 4-comp, Adobe RGB 3-comp") {
    assert(JpegDecode.decodeRaster(flatJpeg(Seq(1, 2, 3, 4), transform = 1)) == null)
    assert(JpegDecode.decodeRaster(flatJpeg(Seq(1, 2, 3), transform = 0)) == null)
    // sanity: the same 3-comp stream without APP14 decodes (as YCbCr)
    assert(JpegDecode.decodeRaster(flatJpeg(Seq(128, 128, 128), transform = -1)) != null)
    // 5 components stays out of scope
    assert(JpegDecode.decodeRaster(flatJpeg(Seq(1, 2, 3, 4, 5), transform = 0)) == null)
  }
}
