package graft

import graft.core.Tables
import graft.pipeline.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.mediaTable(Tables.documents(spark, sf("sf0.001")).limit(20))

  test("mediaTable: binary payload + typed metadata struct") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    assert(media.count() === 20)
  }

  test("ImageHeader parses PNG/JPEG containers and rejects the rest") {
    import graft.functions.ImageHeader
    def parse(bytes: Array[Byte]): (String, Any, Any, Any) = {
      val r = Seq(Tuple1(bytes)).toDF("payload")
        .select(ImageHeader($"payload").as("i"))
        .select("i.format", "i.width", "i.height", "i.color_type")
        .collect()(0)
      (r.getString(0), r.get(1), r.get(2), r.get(3))
    }
    // minimal real PNG IHDR: 640x480 RGBA
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80.toByte, 0, 0, 0x01, 0xe0.toByte, // 640, 480
      8, 6, 0, 0, 0, 1, 2, 3, 4)
    assert(parse(png) === (("png", 640, 480, 6)))
    // JPEG with APP0 + a COM segment BEFORE SOF0, and a 0xFF fill byte:
    // the marker walk must skip both (real camera files do this)
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xe0.toByte, 0x00, 0x04, 0x4a, 0x46, // APP0 len 4
      0xff.toByte, 0xfe.toByte, 0x00, 0x05, 'h', 'i', '!', // COM len 5
      0xff.toByte, // fill byte
      0xff.toByte, 0xc2.toByte, 0x00, 0x0b, 0x08, // SOF2 (progressive)
      0x00, 0x64, 0x01, 0x2c, 0x01) // h=100, w=300, 1 component
    assert(parse(jpeg) === (("jpeg", 300, 100, 1)))
    // truncated PNG (signature only) and SOF-less JPEG: format known,
    // dimensions honestly NULL
    assert(parse(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
      === (("png", null, null, null)))
    assert(parse(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte))
      === (("jpeg", null, null, null)))
    // not a container at all
    assert(parse("hello world".getBytes("UTF-8"))._1 === "unknown")
    assert(parse(Array.emptyByteArray)._1 === "unknown")
  }

  test("mediaTableEncoded round-trip: parsed dimensions equal the generator's") {
    val enc = Multimodal.mediaTableEncoded(
      Tables.documents(spark, sf("sf0.001")).limit(60))
    val meta = Multimodal.extractMeta(enc)
    val docs = Tables.documents(spark, sf("sf0.001")).limit(60)
      .select($"doc_id", (($"n_chars" % 300) + 16).cast("int").as("w"),
        (($"doc_id" % 240) + 16).cast("int").as("h"))
    val joined = meta.join(docs, meta("media_id") === docs("doc_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val id = r.getAs[Long]("media_id")
      (id % 3, id % 2 == 0) match {
        case (0, even) =>
          assert(r.getAs[String]("format") === "png")
          assert(r.getAs[Int]("width") === r.getAs[Int]("w"))
          assert(r.getAs[Int]("height") === r.getAs[Int]("h"))
          assert(r.getAs[Int]("color_type") === (if (even) 2 else 6))
        case (1, even) =>
          assert(r.getAs[String]("format") === "jpeg")
          assert(r.getAs[Int]("width") === r.getAs[Int]("w"))
          assert(r.getAs[Int]("height") === r.getAs[Int]("h"))
          assert(r.getAs[Int]("color_type") === (if (even) 3 else 1))
        case _ =>
          assert(r.getAs[String]("format") === "unknown")
          assert(r.isNullAt(r.fieldIndex("width")))
      }
    }
  }

  test("extractFeatures (decode stub) is deterministic and batched") {
    val f1 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.forall(f => f.n_bytes > 0 && f.byte_sum > 0))
  }

  test("extractFeaturesArrow: bit-identical to the row form, batch seams invisible") {
    val enc = Multimodal.mediaTableEncoded(
      Tables.documents(spark, sf("sf0.001")).limit(50))
    val rowForm = Multimodal.extractFeatures(spark, enc)
      .collect().sortBy(_.media_id).toSeq
    // batchRows = 7 over ~50 rows per partition: many partial batches, so
    // a fencepost at a batch seam cannot hide
    val arrowForm = Multimodal.extractFeaturesArrow(spark, enc, batchRows = 7)
      .collect().sortBy(_.media_id).toSeq
    assert(arrowForm === rowForm)
    assert(arrowForm.nonEmpty)

    // coarse throughput sanity on the larger corpus: the batched path must
    // not be meaningfully slower than the per-row path (loose 3x bound —
    // this is a regression tripwire, not a benchmark)
    val big = Multimodal.mediaTableEncoded(Tables.documents(spark, sf("sf0.01")))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    time(Multimodal.extractFeatures(spark, big).write.format("noop").mode("overwrite").save())
    val tRow = time(
      Multimodal.extractFeatures(spark, big).write.format("noop").mode("overwrite").save())
    val tArrow = time(
      Multimodal.extractFeaturesArrow(spark, big).write.format("noop").mode("overwrite").save())
    info(f"row form $tRow%.3fs, arrow form $tArrow%.3fs")
    assert(tArrow < tRow * 3, f"arrow path too slow: $tArrow%.3fs vs $tRow%.3fs")
  }

  test("resizeStub pools every payload to the same fixed shape") {
    val out = Multimodal.resizeStub(spark, media, 32).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Array[Byte]]("resized").length === 32))
    // deterministic: same input, same pooled bytes
    val again = Multimodal.resizeStub(spark, media, 32).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    out.foreach(r => assert(again(r.getLong(0)) === r.getAs[Array[Byte]](1).toSeq))
  }

  test("sampleBytes keeps every k-th byte") {
    val out = Multimodal.sampleBytes(spark, media, 4)
      .join(media, "media_id")
      .select("sampled", "payload")
      .collect()
    out.foreach { r =>
      val sampled = r.getAs[Array[Byte]](0)
      val full = r.getAs[Array[Byte]](1)
      assert(sampled.length === (full.length + 3) / 4)
      assert(sampled(0) === full(0))
    }
  }

  test("AudioHeader walks RIFF chunks: extra chunks, odd padding, truncation") {
    import graft.functions.AudioHeader
    import java.nio.{ByteBuffer, ByteOrder}
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      b.array() // trailing pad byte (if odd) left zero per RIFF
    }
    def fmt(ch: Int, rate: Int, bits: Int): Array[Byte] = {
      val ba = ch * bits / 8
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(1).putShort(ch.toShort).putInt(rate).putInt(rate * ba)
        .putShort(ba.toShort).putShort(bits.toShort)
      b.array()
    }
    def riff(chunks: Array[Byte]*): Array[Byte] = {
      val body = chunks.flatten.toArray
      val b = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
        .put("WAVE".getBytes("US-ASCII")).put(body)
      b.array()
    }
    val canonical = riff(chunk("fmt ", fmt(2, 44100, 16)), chunk("data", new Array[Byte](88200)))
    // an odd-sized LIST chunk BEFORE fmt: the walk must pad to even and continue
    val listed = riff(
      chunk("LIST", Array[Byte](1, 2, 3)),
      chunk("fmt ", fmt(1, 8000, 8)), chunk("data", new Array[Byte](4000)))
    val noFmt = riff(chunk("data", new Array[Byte](10)))
    val notWav = "plain bytes".getBytes("UTF-8")
    val rows = Seq((1, canonical), (2, listed), (3, noFmt), (4, notWav))
      .toDF("id", "payload")
      .select($"id", AudioHeader($"payload").as("a"))
      .select("id", "a.format", "a.channels", "a.sample_rate", "a.bits_per_sample", "a.duration_ms")
      .as[(Int, String, Option[Int], Option[Int], Option[Int], Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(rows(0) === ((1, "wav", Some(2), Some(44100), Some(16), Some(500L)))) // 88200/176400 s
    assert(rows(1) === ((2, "wav", Some(1), Some(8000), Some(8), Some(500L))))   // 4000/8000 s
    assert(rows(2) === ((3, "wav", None, None, None, None)))
    assert(rows(3) === ((4, "unknown", None, None, None, None)))
  }

  test("AudioHeader terminates and stays sane on adversarial chunk sizes") {
    import graft.functions.AudioHeader
    import java.nio.{ByteBuffer, ByteOrder}
    def riffRaw(body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
        .put("WAVE".getBytes("US-ASCII")).put(body)
      b.array()
    }
    def chunkHdr(id: String, declaredSize: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt((declaredSize & 0xffffffffL).toInt)
      b.array()
    }
    // a chunk declaring size 0xFFFFFFF8 (Int-wraps to -8: the old Int
    // advance stepped 0 bytes and the walk never terminated)
    val wrapEven = riffRaw(chunkHdr("LIST", 0xFFFFFFF8L) ++ new Array[Byte](32))
    // odd variant (old advance stepped -8 + pad 1 = -7, also stuck/looping)
    val wrapOdd = riffRaw(chunkHdr("LIST", 0xFFFFFFF7L) ++ new Array[Byte](32))
    // fmt declaring size 0: the PCM fields are NOT there — the walk must
    // not read the following data chunk's bytes as channels/rate
    val shortFmt = riffRaw(chunkHdr("fmt ", 0L) ++ chunkHdr("data", 4L) ++ new Array[Byte](4))
    val rows = Seq((1, wrapEven), (2, wrapOdd), (3, shortFmt))
      .toDF("id", "payload")
      .select($"id", AudioHeader($"payload").as("a"))
      .select("id", "a.format", "a.channels", "a.sample_rate", "a.bits_per_sample", "a.duration_ms")
      .as[(Int, String, Option[Int], Option[Int], Option[Int], Option[Long])]
      .collect().sortBy(_._1).toSeq
    // all three parse as unplayable wav (no usable fmt), and terminate
    assert(rows(0) === ((1, "wav", None, None, None, None)))
    assert(rows(1) === ((2, "wav", None, None, None, None)))
    assert(rows(2) === ((3, "wav", None, None, None, None)))
  }

  test("mediaTableEncodedAudio round-trip: parsed layout equals the generator's") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf("sf0.001"))
    val meta = Multimodal.extractAudioMeta(Multimodal.mediaTableEncodedAudio(docs))
      .join(docs.select(col("doc_id").as("media_id"), col("n_chars")), Seq("media_id"))
      .collect()
    meta.foreach { r =>
      val id = r.getAs[Long]("media_id")
      if (id % 3 == 2) assert(r.getAs[String]("format") === "unknown")
      else {
        assert(r.getAs[String]("format") === "wav")
        assert(r.getAs[Int]("channels") === (id % 2 + 1).toInt)
        assert(r.getAs[Int]("sample_rate") === ((r.getAs[Long]("n_chars") % 4 + 1) * 8000).toInt)
      }
    }
  }

  test("mediaTableEncodedVideo round-trip: parsed boxes equal the generator's") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf("sf0.001"))
    val meta = Multimodal.extractVideoMeta(Multimodal.mediaTableEncodedVideo(docs))
      .join(docs.select(col("doc_id").as("media_id"), col("n_chars")), Seq("media_id"))
      .collect()
    meta.foreach { r =>
      val id = r.getAs[Long]("media_id")
      if (id % 3 == 1) assert(r.getAs[String]("format") === "unknown")
      else {
        assert(r.getAs[String]("format") === "mp4")
        assert(r.getAs[String]("brand") === (if (id % 2 == 0) "isom" else "mp42"))
        assert(r.getAs[Int]("width") === (r.getAs[Long]("n_chars") % 1280 + 16).toInt)
        assert(r.getAs[Int]("height") === (id % 720 + 16).toInt)
        assert(r.getAs[Long]("duration_ms") === r.getAs[Long]("n_chars") * 5)
      }
    }
  }

  test("VideoHeader terminates and stays sane on adversarial box sizes") {
    import graft.functions.VideoHeader
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tpe: String, size: Long, body: Array[Byte]): Array[Byte] =
      be32(size) ++ tpe.getBytes("US-ASCII") ++ body
    val ftyp = box("ftyp", 16, "isom".getBytes ++ Array[Byte](0, 0, 0, 0))
    // size 0 ("to end of file") must end the walk, not loop
    val zeroSize = ftyp ++ box("free", 0, new Array[Byte](16))
    // size 1 (64-bit largesize) likewise
    val largeSize = ftyp ++ box("free", 1, new Array[Byte](16))
    // a box whose declared size wraps a 32-bit Int negative
    val wrap = ftyp ++ box("free", 0xFFFFFFF0L, new Array[Byte](16))
    // an mvhd too short for its v0 fields must not be read
    val shortMvhd = ftyp ++ box("moov", 8 + 8 + 4, box("mvhd", 12, Array[Byte](0, 0, 0, 0)))
    // a short mvhd FOLLOWED by a sibling box: the fields must not be read
    // from the sibling's bytes (the box's own end bounds the read)
    val shortThenSibling = ftyp ++ box("moov", 8 + 12 + 24,
      box("mvhd", 12, Array[Byte](0, 0, 0, 0)) ++
        box("free", 24, Array.fill[Byte](16)(0x2a)))
    val rows = Seq((1, zeroSize), (2, largeSize), (3, wrap), (4, shortMvhd),
      (5, shortThenSibling))
      .toDF("id", "payload")
      .select($"id", VideoHeader($"payload").as("v"))
      .select("id", "v.format", "v.brand", "v.width", "v.height", "v.duration_ms")
      .as[(Int, String, Option[String], Option[Int], Option[Int], Option[Long])]
      .collect().sortBy(_._1).toSeq
    rows.foreach { r =>
      assert(r._2 === "mp4") // valid ftyp: it IS an mp4, just empty-headed
      assert(r._3 === Some("isom"))
      assert((r._4, r._5, r._6) === ((None, None, None)))
    }
  }
}
