package graft

import org.apache.spark.sql.functions._

/** Adversarial-input hardening for the binary media kernels: random
  * buffers and mutated VALID payloads must decode to null or a value —
  * never throw. The kernels are called directly (not through Spark) so a
  * failure names the seed, and one spot-check per family runs through
  * the expression path to cover codegen too.
  */
class MediaFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(0xD13C0DE)

  private def randomBuffers(n: Int, maxLen: Int): Seq[Array[Byte]] =
    (0 until n).map { _ =>
      val b = new Array[Byte](rng.nextInt(maxLen))
      rng.nextBytes(b)
      b
    }

  private def mutate(valid: Array[Byte], n: Int): Seq[Array[Byte]] =
    (0 until n).map { _ =>
      rng.nextInt(3) match {
        case 0 => // single byte flip
          val b = valid.clone()
          if (b.nonEmpty) b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
          b
        case 1 => valid.take(rng.nextInt(valid.length + 1)) // truncate
        case 2 => valid ++ randomBuffers(1, 16).head // trailing junk
      }
    }

  private def neverThrows(name: String, decode: Array[Byte] => Any)(
      inputs: Seq[Array[Byte]]): Unit =
    inputs.zipWithIndex.foreach { case (b, i) =>
      try decode(b)
      catch {
        case e: Throwable =>
          fail(s"$name threw on fuzz input #$i (${b.length} bytes): $e")
      }
    }

  private val validPpm =
    "P6\n3 2\n255\n".getBytes("UTF-8") ++ Array.fill(18)(42.toByte)
  private val validWav = {
    val fmt = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      .array()
    "RIFF".getBytes("US-ASCII") ++ Array[Byte](40, 0, 0, 0) ++
      "WAVEfmt ".getBytes("US-ASCII") ++ Array[Byte](16, 0, 0, 0) ++ fmt ++
      "data".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      Array[Byte](1, 0, 2, 0)
  }
  private val validY4m =
    "YUV4MPEG2 W2 H2 C444\nFRAME\n".getBytes("US-ASCII") ++
      Array.fill(12)(9.toByte)
  private val validPng =
    graft.pipeline.Multimodal.encodeRaster("png", 3, 2, rgba = false,
      "0123456789abcdef01")
  // palette (PLTE walk) and Adam7 (deinterlace) seeds: mutations over
  // these reach the lookup/pass-extraction paths plain RGB never does
  private val validPngPal =
    graft.pipeline.Multimodal.encodeRasterIndexedOrGray(0, 3, 2, "012345")
  private val validPngIl =
    graft.pipeline.Multimodal.encodeRaster("png", 9, 9, rgba = false,
      "0123456789abcdef" * 16, interlaced = true)
  // 16-bit gray seed: mutations reach the sw=2 stride/filter/stats paths
  private val validPng16 =
    graft.pipeline.Multimodal.encodeRasterIndexedOrGray(3, 3, 2, "012345")
  private val validBmp =
    graft.pipeline.Multimodal.encodeRaster("bmp", 3, 2, rgba = false,
      "0123456789abcdef01")
  // GIF seeds: sequential + interlaced, reaching the LZW and 4-pass paths
  private val validGif =
    graft.pipeline.Multimodal.encodeGifIndexed(3, 2, "012345", interlaced = false)
  private val validGifIl =
    graft.pipeline.Multimodal.encodeGifIndexed(5, 5, "0123456789abcdef" * 2,
      interlaced = true)
  // animated GIF seed: 3-frame sequence — mutations reach the GCE walk,
  // compositing and the multi-image block loop
  private val validGifAnim =
    graft.pipeline.Multimodal.encodeGifAnimated(3, 2, Seq("012345", "6789ab", "cdef01"))
  // EXIF seed: SOI + a byte-exact APP1 — mutations reach the TIFF/IFD
  // walk and its inline/offset value paths
  private val validExif =
    Array[Byte](0xff.toByte, 0xd8.toByte) ++
      graft.pipeline.Multimodal.exifApp1(little = true, 6,
        "2021:01:01 00:00:00", "cam_a", "mx_b") ++ "tail".getBytes("UTF-8")
  // JPEG seeds: color 4:2:0 and grayscale, through the independent
  // ImageIO encoder — mutations reach the Huffman/IDCT/upsample paths
  private val validJpeg =
    graft.pipeline.Multimodal.encodeRaster("jpeg", 9, 7, rgba = false,
      "0123456789abcdefghij" * 10, quality = 0.9f)
  private val validJpegProg =
    graft.pipeline.Multimodal.encodeRaster("jpeg", 9, 7, rgba = false,
      "0123456789abcdefghij" * 10, quality = 0.9f, interlaced = true)
  // FLAC seed: a mixed-strategy multi-frame stereo stream — mutations
  // reach the Rice/LPC/CRC and decorrelation paths
  private val validFlac = graft.pipeline.Multimodal.encodeFlac(
    Array(Array.tabulate(400)(i => (i * 37) % 200 - 100),
      Array.tabulate(400)(i => (i * 53) % 180 - 90)), 16, 5L)
  // flat CMYK seed: mutations reach the APP14/4-component paths
  private val validCmyk =
    graft.pipeline.Multimodal.encodeFlatJpeg(Seq(100, 150, 200, 250), 2, 13, 11)
  // oriented seed: EXIF orientation 6 spliced onto a real JPEG —
  // mutations reach the orientation-composition path
  private val validOriented = {
    val j = graft.pipeline.Multimodal.encodeRaster("jpeg", 9, 7, rgba = false,
      "0123456789abcdefghij" * 10, quality = 0.9f)
    j.take(2) ++ graft.pipeline.Multimodal.exifApp1(little = false, 6,
      "2021:01:01 00:00:00", "cam_a", "mx_b") ++ j.drop(2)
  }

  // VP8L seeds: one per encoder arm family — mutations reach the
  // huffman/code-length machinery, the cache/LZ77 paths and all four
  // inverse transforms
  private def webpPx(n: Int): Array[Int] =
    Array.tabulate(n)(i => ((i * 31 & 0xff) << 24) | ((i * 17 & 0xff) << 16) |
      ((i * 13 & 0xff) << 8) | (i * 7 & 0xff))
  private val validWebp =
    graft.pipeline.Multimodal.encodeVp8l(9, 7, webpPx(63), 0)
  private val validWebpPal = {
    val pal = Array(0xff112233, 0xff445566, 0xff778899, 0xffaabbcc)
    graft.pipeline.Multimodal.encodeVp8l(9, 7,
      Array.tabulate(63)(i => pal(i % 4)), 2, palette = pal)
  }
  private val validWebpPred =
    graft.pipeline.Multimodal.encodeVp8l(9, 7, webpPx(63), 5, mode = 11)
  private val validWebpCache =
    graft.pipeline.Multimodal.encodeVp8l(9, 7,
      Array.tabulate(63)(i => if (i % 2 == 0) 0xff102030 else 0xffccddee), 4)

  // TIFF seeds: one per compression family (incl. predictor) plus the
  // palette photometric — mutations reach the IFD walk, the strip
  // machinery and each decompressor's guards
  private val validTiffLzw = graft.pipeline.Multimodal.encodeTiff(
    le = true, 2, 5, 2, 2, 5, 4, "0123456789abcdef0123456789abcdef" * 2)
  private val validTiffPack = graft.pipeline.Multimodal.encodeTiff(
    le = false, 1, 32773, 1, 4, 5, 4, "01234567890123456789")
  private val validTiffZip = graft.pipeline.Multimodal.encodeTiff(
    le = false, 0, 8, 2, 1, 5, 4, "fedcba9876543210fedc")
  private val validTiffPal = graft.pipeline.Multimodal.encodeTiff(
    le = true, 3, 1, 1, 4, 5, 4, "abcdefghijklmnopqrst")
  // AIFF seed: stereo 16-bit — mutations reach the chunk walk, the
  // extended-float parser and the frame-declaration guard
  private val validAiff = graft.pipeline.Multimodal.encodeAiff(
    Array(Array.tabulate(80)(i => i * 7 - 280), Array.tabulate(80)(i => 100 - i * 3)),
    16, declareExtraFrame = false)

  private val validJpegGray = {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 8; x <- 0 until 8)
      img.getRaster.setSample(x, y, 0, (x * 37 + y * 11) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    bos.toByteArray
  }

  test("random and mutated buffers never throw in any media kernel") {
    val rand = randomBuffers(4000, 96)
    neverThrows("PpmDecode", graft.functions.PpmDecode.decode)(
      rand ++ mutate(validPpm, 2000))
    neverThrows("PpmResize", b => graft.functions.PpmResize.resize(b, 2, 2))(
      rand ++ mutate(validPpm, 2000))
    neverThrows("PcmDecode", graft.functions.PcmDecode.decode)(
      rand ++ mutate(validWav, 2000))
    neverThrows("Y4mSample", b => graft.functions.Y4mSample.sample(b, 2))(
      rand ++ mutate(validY4m, 2000))
    neverThrows("PngDecode", graft.functions.PngDecode.decode)(
      rand ++ mutate(validPng, 2000) ++ mutate(validPngPal, 2000) ++
        mutate(validPngIl, 2000) ++ mutate(validPng16, 2000))
    neverThrows("PngEncode", graft.functions.PngEncode.encode)(
      rand ++ mutate(validPpm, 2000))
    neverThrows("GifDecode", graft.functions.GifDecode.decode)(
      rand ++ mutate(validGif, 2000) ++ mutate(validGifIl, 2000))
    neverThrows("GifFrames", b => graft.functions.GifDecode.decodeFrames(b, 2))(
      rand ++ mutate(validGifAnim, 2000) ++ mutate(validGif, 2000))
    neverThrows("JpegExif", graft.functions.JpegExif.extract)(
      rand ++ mutate(validExif, 3000))
    neverThrows("GifEncode", graft.functions.GifEncode.encode)(
      rand ++ mutate(validPpm, 2000))
    neverThrows("BmpDecode", graft.functions.BmpDecode.decode)(
      rand ++ mutate(validBmp, 2000) ++
        randomBuffers(2000, 64).map(validBmp.take(18) ++ _))
    neverThrows("JpegDecode", graft.functions.JpegDecode.decode)(
      rand ++ mutate(validJpeg, 2000) ++ mutate(validJpegGray, 2000) ++
        mutate(validJpegProg, 2000) ++ mutate(validCmyk, 2000))
    neverThrows("JpegOriented", graft.functions.JpegOriented.decode)(
      rand ++ mutate(validOriented, 2000))
    neverThrows("FlacDecode", graft.functions.FlacDecode.decode)(
      rand ++ mutate(validFlac, 3000))
    neverThrows("AudioDecode", graft.functions.AudioDecode.decode)(
      rand ++ mutate(validFlac, 1000) ++ mutate(validWav, 1000) ++
        mutate(validAiff, 1000))
    neverThrows("WebpDecode", graft.functions.WebpDecode.decode)(
      rand ++ mutate(validWebp, 1500) ++ mutate(validWebpPal, 1500) ++
        mutate(validWebpPred, 1500) ++ mutate(validWebpCache, 1500))
    neverThrows("TiffDecode", graft.functions.TiffDecode.decode)(
      rand ++ mutate(validTiffLzw, 1500) ++ mutate(validTiffPack, 1500) ++
        mutate(validTiffZip, 1500) ++ mutate(validTiffPal, 1500))
    neverThrows("AiffDecode", graft.functions.AiffDecode.decode)(
      rand ++ mutate(validAiff, 2500))
    // perceptual-hash wrappers (VERDICT r18 #8): the grid/orientation
    // logic and the window envelope sit ABOVE fuzzed kernels, but the
    // wrappers' own guards (below-grid nulls, quarter packing, window
    // init) deserve their own seeds across every dispatched format
    neverThrows("ImageDHash", b => graft.functions.ImageDHash.hash(b, 9, 8))(
      rand ++ mutate(validPpm, 1000) ++ mutate(validPng, 1000) ++
        mutate(validPngPal, 1000) ++ mutate(validGif, 1000) ++
        mutate(validBmp, 1000) ++ mutate(validJpeg, 1000) ++
        mutate(validOriented, 1000) ++ mutate(validWebp, 1000) ++
        mutate(validTiffLzw, 1000))
    neverThrows("ImageDHash/3x2", b => graft.functions.ImageDHash.hash(b, 3, 2))(
      mutate(validPpm, 500) ++ mutate(validGifIl, 500) ++ mutate(validPngIl, 500))
    neverThrows("AudioFingerprint", b => graft.functions.AudioFingerprint.fingerprint(b, 65))(
      rand ++ mutate(validFlac, 1500) ++ mutate(validWav, 1500) ++
        mutate(validAiff, 1500))
    neverThrows("AudioFingerprint/9", b => graft.functions.AudioFingerprint.fingerprint(b, 9))(
      mutate(validFlac, 500) ++ mutate(validWav, 500))
    // prefix-targeted fuzz: buffers that START like each format stress
    // the deep parse paths plain randoms rarely reach
    def prefixed(magic: Array[Byte]) =
      randomBuffers(2000, 64).map(magic ++ _)
    neverThrows("PpmDecode/prefixed", graft.functions.PpmDecode.decode)(
      prefixed("P6\n".getBytes("UTF-8")))
    neverThrows("PcmDecode/prefixed", graft.functions.PcmDecode.decode)(
      prefixed("RIFF    WAVE".getBytes("US-ASCII")))
    neverThrows("Y4mSample/prefixed", b => graft.functions.Y4mSample.sample(b, 1))(
      prefixed("YUV4MPEG2 ".getBytes("US-ASCII")))
    // PNG deep-parse fuzz: a valid signature + IHDR prefix, random chunk
    // soup after — stresses the chunk walk, CRC and inflate guards
    neverThrows("PngDecode/prefixed", graft.functions.PngDecode.decode)(
      prefixed(validPng.take(33)))
    // GIF deep-parse fuzz: header + GCT prefix, random block soup after
    // stresses the sub-block walk and the LZW guards
    neverThrows("GifDecode/prefixed", graft.functions.GifDecode.decode)(
      prefixed(validGif.take(13 + 3 * 256)))
    // JPEG deep-parse fuzz: everything up to (and including) the SOS
    // header intact, random entropy soup after — stresses the Huffman
    // decode, restart and truncation guards
    val sosAt = {
      var i = 2
      while (!((validJpeg(i) & 0xff) == 0xff && (validJpeg(i + 1) & 0xff) == 0xda)) i += 1
      i + 2 + (((validJpeg(i + 2) & 0xff) << 8) | (validJpeg(i + 3) & 0xff))
    }
    neverThrows("JpegDecode/prefixed", graft.functions.JpegDecode.decode)(
      prefixed(validJpeg.take(sosAt)))
    // FLAC deep-parse fuzz: magic + STREAMINFO intact, random frame soup
    // after — stresses the frame-header/CRC/subframe guards
    neverThrows("FlacDecode/prefixed", graft.functions.FlacDecode.decode)(
      prefixed(validFlac.take(4 + 4 + 34)))
    // WebP deep-parse fuzz: container + VP8L signature + dims intact,
    // random entropy soup after — stresses the huffman/transform guards
    neverThrows("WebpDecode/prefixed", graft.functions.WebpDecode.decode)(
      randomBuffers(2000, 64).map { tail =>
        val body = validWebp.slice(20, 25) ++ tail
        val bos = new java.io.ByteArrayOutputStream()
        bos.write("RIFF".getBytes("US-ASCII"))
        val chunkLen = body.length
        def le32(v: Int): Unit = {
          bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
          bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
        }
        le32(4 + 8 + chunkLen + (chunkLen & 1))
        bos.write("WEBPVP8L".getBytes("US-ASCII"))
        le32(chunkLen)
        bos.write(body)
        if ((chunkLen & 1) == 1) bos.write(0)
        bos.toByteArray
      })
    // TIFF deep-parse fuzz: header + IFD entry count intact, random
    // entry soup after — stresses the tag/type/offset guards
    neverThrows("TiffDecode/prefixed", graft.functions.TiffDecode.decode)(
      prefixed(validTiffLzw.take(10)) ++ prefixed(validTiffPack.take(10)))
    // AIFF deep-parse fuzz: FORM/AIFF magic intact, random chunk soup
    neverThrows("AiffDecode/prefixed", graft.functions.AiffDecode.decode)(
      prefixed("FORM    AIFF".getBytes("US-ASCII")))
    neverThrows("ImageDHash/prefixed", b => graft.functions.ImageDHash.hash(b, 9, 8))(
      prefixed(validPng.take(33)) ++ prefixed(validGif.take(13 + 3 * 256)) ++
        prefixed(validTiffLzw.take(10)))
    neverThrows("AudioFingerprint/prefixed",
      b => graft.functions.AudioFingerprint.fingerprint(b, 65))(
      prefixed(validFlac.take(4 + 4 + 34)) ++
        prefixed("RIFF    WAVE".getBytes("US-ASCII")) ++
        prefixed("FORM    AIFF".getBytes("US-ASCII")))
  }

  test("media kernels run statelessly on a STREAM, identical to batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = Seq(
      (1L, validPpm), (2L, validWav), (3L, validY4m),
      (4L, "junk".getBytes("UTF-8")), (5L, validPng), (6L, validFlac),
      (7L, validWebp), (8L, validWebpPal))
    def features(df: org.apache.spark.sql.DataFrame) =
      df.select(
        col("id"),
        graft.functions.PpmDecode(col("b")).getField("sum_r").as("pr"),
        graft.functions.PcmDecode(col("b")).getField("sum_c0").as("pc"),
        graft.functions.Y4mSample(col("b"), 1).getField("y_sum").as("ys"),
        graft.functions.PngDecode(col("b")).getField("sum_g").as("gg"),
        graft.functions.JpegDecode(col("b")).getField("sum_b").as("jb"),
        graft.functions.MediaDecode(col("b")).getField("format").as("fmt"),
        graft.functions.FlacDecode(col("b")).getField("sum_c0").as("fc"),
        graft.functions.AudioDecode(col("b")).getField("format").as("afmt"),
        graft.functions.JpegOriented(col("b")).getField("orientation").as("ori"),
        graft.functions.WebpDecode(col("b")).getField("sum_a").as("wa"),
        graft.functions.AudioFingerprint(col("b"), 9).getField("fp").as("afp"),
        graft.functions.VideoFrameSigs(col("b"), 2, 3, 2).getField("n_sampled").as("vfs"),
        graft.functions.ImageDHash(col("b"), 3, 2).getField("dhash").as("dh"),
        md5(graft.functions.PpmResize(col("b"), 2, 2)).as("rz"))
    val batch = features(rows.toDF("id", "b")).orderBy("id").collect().toSeq
    val in = MemoryStream[(Long, Array[Byte])](spark)
    val q = features(in.toDF().toDF("id", "b"))
      .writeStream.outputMode("append")
      .format("memory").queryName("media_stream_out").start()
    try {
      in.addData(rows.take(2): _*)
      q.processAllAvailable()
      in.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("media_stream_out").orderBy("id").collect().toSeq
      assert(streamed === batch)
      assert(q.lastProgress == null || q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("the valid seeds actually decode (the fuzz is mutating real payloads)") {
    assert(graft.functions.PpmDecode.decode(validPpm) != null)
    assert(graft.functions.PcmDecode.decode(validWav) != null)
    assert(graft.functions.Y4mSample.sample(validY4m, 1) != null)
    assert(graft.functions.PngDecode.decode(validPng) != null)
    assert(graft.functions.BmpDecode.decode(validBmp) != null)
    assert(graft.functions.GifDecode.decode(validGif) != null)
    assert(graft.functions.GifDecode.decode(validGifIl) != null)
    assert(graft.functions.GifDecode.decodeFrames(validGifAnim, 2) != null)
    assert(graft.functions.JpegExif.extract(validExif) != null)
    assert(graft.functions.JpegDecode.decode(validJpeg) != null)
    assert(graft.functions.JpegDecode.decode(validJpegGray) != null)
    assert(graft.functions.JpegDecode.decode(validJpegProg) != null)
    assert(graft.functions.FlacDecode.decode(validFlac) != null)
    assert(graft.functions.JpegDecode.decode(validCmyk) != null)
    assert(graft.functions.JpegOriented.decode(validOriented) != null)
    assert(graft.functions.AudioDecode.decode(validFlac) != null)
    assert(graft.functions.WebpDecode.decode(validWebp) != null)
    assert(graft.functions.WebpDecode.decode(validWebpPal) != null)
    assert(graft.functions.WebpDecode.decode(validWebpPred) != null)
    assert(graft.functions.WebpDecode.decode(validWebpCache) != null)
    assert(graft.functions.TiffDecode.decode(validTiffLzw) != null)
    assert(graft.functions.TiffDecode.decode(validTiffPack) != null)
    assert(graft.functions.TiffDecode.decode(validTiffZip) != null)
    assert(graft.functions.TiffDecode.decode(validTiffPal) != null)
    assert(graft.functions.AiffDecode.decode(validAiff) != null)
    // expression-path spot check (codegen kernels share the statics)
    val r = Seq((validPpm, validWav, validY4m)).toDF("p", "w", "y")
      .select(
        graft.functions.PpmDecode(col("p")).getField("n_px"),
        graft.functions.PcmDecode(col("w")).getField("n_frames"),
        graft.functions.Y4mSample(col("y"), 1).getField("n_sampled"))
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((6L, 2L, 1L)))
  }
}
