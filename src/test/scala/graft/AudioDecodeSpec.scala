package graft

import org.apache.spark.sql.functions._

import graft.functions.{AudioDecode, FlacDecode, PcmDecode}
import graft.pipeline.Multimodal

/** The audio sniff-dispatch operator: each magic routes to its sample
  * kernel with values IDENTICAL to the direct call; junk and corrupted
  * containers are null rows; the codegen path matches eval.
  */
class AudioDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def wav(ch: Int, bits: Int, data: Array[Byte]): Array[Byte] = {
    val bpf = ch * bits / 8
    val bos = new java.io.ByteArrayOutputStream(44 + data.length)
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    bos.write("RIFF".getBytes("US-ASCII")); le32(36 + data.length)
    bos.write("WAVEfmt ".getBytes("US-ASCII")); le32(16)
    le16(1); le16(ch); le32(8000); le32(8000 * bpf); le16(bpf); le16(bits)
    bos.write("data".getBytes("US-ASCII")); le32(data.length)
    bos.write(data)
    bos.toByteArray
  }

  test("magic dispatch: wav and flac parity with the direct kernels") {
    val data = "the quick brown fox jumps over it".getBytes("US-ASCII")
    val w = wav(2, 8, data)
    val direct = PcmDecode.decode(w)
    val sniffed = AudioDecode.decode(w)
    assert(direct != null && sniffed != null)
    assert(sniffed.getUTF8String(0).toString === "wav")
    for (i <- 0 until 7) {
      assert(sniffed.isNullAt(i + 1) === direct.isNullAt(i),
        s"null parity at field $i")
      if (!direct.isNullAt(i))
        assert(sniffed.get(i + 1, PcmDecode.schema.fields(i).dataType) ===
          direct.get(i, PcmDecode.schema.fields(i).dataType), s"field $i")
    }
    val samples = Array(Array.tabulate(300)(i => i % 200 - 100))
    val f = Multimodal.encodeFlac(samples, 8, 4L)
    val fd = FlacDecode.decode(f)
    val fs = AudioDecode.decode(f)
    assert(fs != null && fs.getUTF8String(0).toString === "flac")
    assert(fs.getLong(3) === fd.getLong(2) && fs.getLong(4) === fd.getLong(3))
  }

  test("junk, short, and corrupted payloads null; wrong magic never misroutes") {
    assert(AudioDecode.decode("no audio here padded".getBytes("UTF-8")) == null)
    assert(AudioDecode.decode(Array[Byte](1, 2, 3)) == null)
    // RIFF magic on junk hits PcmDecode's strict null, not a throw
    assert(AudioDecode.decode("RIFFxxxxWAVEgarbagegarbage".getBytes("US-ASCII")) == null)
    assert(AudioDecode.decode("fLaCgarbagegarbagegarbage".getBytes("US-ASCII")) == null)
    // corrupted FLAC CRC nulls through the sniff too
    val f = Multimodal.encodeFlac(Array(Array.tabulate(100)(_ - 50)), 8, 1L)
    f(f.length - 1) = (f(f.length - 1) ^ 1).toByte
    assert(AudioDecode.decode(f) == null)
  }

  test("the expression path (codegen) matches eval, nulls included") {
    val rows = Seq(
      (1L, wav(1, 16, "abcdefghij".getBytes("US-ASCII"))),
      (2L, "raw text".getBytes("UTF-8")),
      (3L, Multimodal.encodeFlac(Array(Array.tabulate(50)(_ * 3 - 75)), 16, 2L)))
    val out = rows.toDF("media_id", "payload")
      .select(col("media_id"), AudioDecode(col("payload")).as("d"))
      .select(col("media_id"), col("d.format"), col("d.n_frames"), col("d.sum_c0"))
      .orderBy("media_id").collect()
    assert(out(0).getString(1) === "wav")
    assert(out(0).getLong(2) === 5L)
    assert(out(1).isNullAt(1))
    assert(out(2).getString(1) === "flac")
    val direct = FlacDecode.decode(rows(2)._2)
    assert(out(2).getLong(3) === direct.getLong(3))
  }
}
