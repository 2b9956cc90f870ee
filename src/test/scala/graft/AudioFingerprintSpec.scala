package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.functions.AudioFingerprint
import graft.pipeline.{Dedup, Multimodal}

/** Perceptual audio fingerprint: hand-pinned bit semantics on amplitude
  * ramps, the WAV == FLAC cross-codec invariance (the audio-dedup
  * property the operator exists for), strict nulls, the shared-miner
  * pair path, and codegen parity.
  */
class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  /** Canonical 8-bit mono PCM WAV around raw sample bytes. */
  private def wav8(data: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(44 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
    b.put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
    b.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    b.array()
  }

  test("rising amplitude ramp sets every bit; falling ramp clears every bit") {
    // 9 windows of 4 frames; window k's |sample| strictly grows with k
    val rising = Array.tabulate(36)(f => (128 + 10 + (f / 4) * 5).toByte)
    val falling = Array.tabulate(36)(f => (128 + 60 - (f / 4) * 5).toByte)
    val ri = AudioFingerprint.fingerprint(wav8(rising), 9)
    val rf = AudioFingerprint.fingerprint(wav8(falling), 9)
    assert(ri != null && rf != null)
    assert(ri.getUTF8String(0).toString === "wav")
    assert(ri.getLong(1) === 36L)
    assert(ri.getLong(2) === 255L, "rising envelope: all 8 bits set")
    assert(rf.getLong(2) === 0L, "falling envelope: no bits set")
  }

  test("windows compare by MEAN (cross-multiplied), not by sum; mix is c0 + c1") {
    // 10 frames, 9 windows -> window 8 holds 2 frames, the rest 1. A
    // flat stream must fingerprint 0 even though window 8's SUM doubles.
    val flat = Array.fill(10)((128 + 40).toByte)
    assert(AudioFingerprint.fingerprint(wav8(flat), 9).getLong(2) === 0L)
    // stereo mix: c0 flat, c1 carries the ramp -> same bits as the ramp
    def wav16st(frames: Array[(Int, Int)]): Array[Byte] = {
      val b = ByteBuffer.allocate(44 + 4 * frames.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + 4 * frames.length)
      b.put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
      b.putShort(1).putShort(2).putInt(8000).putInt(32000).putShort(4).putShort(16)
      b.put("data".getBytes("US-ASCII")).putInt(4 * frames.length)
      frames.foreach { case (c0, c1) => b.putShort(c0.toShort).putShort(c1.toShort) }
      b.array()
    }
    val ramp = Array.tabulate(18)(f => (100, 10 + (f / 2) * 7))
    val r = AudioFingerprint.fingerprint(wav16st(ramp), 9)
    assert(r != null && r.getLong(2) === 255L, "stereo mix envelope must ride c0 + c1")
  }

  test("the same clip as WAV and as FLAC fingerprints IDENTICALLY (lossless)") {
    val data = ("0123456789abcdef" * 12).getBytes("US-ASCII") // 192 frames
    val samples = data.map(b => (b & 0xff) - 128)
    val flac = Multimodal.encodeFlac(Array(samples), 8, 7L)
    val fw = AudioFingerprint.fingerprint(wav8(data), 65)
    val ff = AudioFingerprint.fingerprint(flac, 65)
    assert(fw != null && ff != null)
    assert(fw.getUTF8String(0).toString === "wav" && ff.getUTF8String(0).toString === "flac")
    assert(fw.getLong(1) === ff.getLong(1))
    assert(fw.getLong(2) === ff.getLong(2), "cross-codec fingerprints must be bit-equal")
  }

  test("strict nulls: short streams, junk, corrupt FLAC, unknown FLAC totals") {
    assert(AudioFingerprint.fingerprint(wav8(Array.fill(8)(0x80.toByte)), 9) == null,
      "fewer frames than windows")
    assert(AudioFingerprint.fingerprint("not audio at all".getBytes, 9) == null)
    val data = ("0123456789abcdef" * 12).getBytes("US-ASCII")
    val flac = Multimodal.encodeFlac(Array(data.map(b => (b & 0xff) - 128)), 8, 7L)
    flac(flac.length - 1) = (flac(flac.length - 1) ^ 0x5a).toByte
    assert(AudioFingerprint.fingerprint(flac, 9) == null, "corrupt CRC must null")
    val good = Multimodal.encodeFlac(Array(data.map(b => (b & 0xff) - 128)), 8, 7L)
    // zero the 36-bit STREAMINFO total (bytes 8+13..17 carry bps low bits
    // + total): declared-unknown totals can't window streaming -> null.
    // Patch only the pure-total bytes (14..17) and the low nibble of 13.
    good(8 + 13) = (good(8 + 13) & 0xf0).toByte
    good(8 + 14) = 0; good(8 + 15) = 0; good(8 + 16) = 0; good(8 + 17) = 0
    assert(AudioFingerprint.fingerprint(good, 9) == null, "unknown total must null")
  }

  test("cross-codec near-dup pair mining over the shared quarter miner") {
    val docs = spark.range(0, 120).selectExpr(
      "id AS doc_id",
      "concat('audio clip body text number ', id) AS text",
      "CAST(30 + id % 50 AS INT) AS n_chars",
      "concat('s', id % 3) AS source",
      "concat('l', id % 2) AS lang")
    val pairs = Dedup.audioFpPairs(
      Multimodal.mediaTableAudioPairs(spark, docs),
      "media_id", "payload", maxHamming = 2)
      .collect()
    // every good doc (id % 5 != 4) must mine its planted cross-codec pair
    val want = (0 until 120).filter(_ % 5 != 4).map(i => (i * 2L, i * 2L + 1)).toSet
    val got = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.subsetOf(got),
      s"missing planted pairs: ${(want -- got).take(5)}")
    pairs.foreach(r => assert(r.getInt(2) <= 2))
  }

  test("the expression path (codegen) matches eval, nulls included") {
    val rising = Array.tabulate(36)(f => (128 + 10 + (f / 4) * 5).toByte)
    val rows = Seq(
      (1L, wav8(rising)),
      (2L, "raw text".getBytes("UTF-8")),
      (3L, wav8(Array.fill(4)(0x80.toByte)))) // below-window
    val out = rows.toDF("media_id", "payload")
      .select(col("media_id"), AudioFingerprint(col("payload"), 9).as("d"))
      .select(col("media_id"), col("d.format"), col("d.fp"))
      .orderBy("media_id").collect()
    assert(out(0).getString(1) === "wav" && out(0).getLong(2) === 255L)
    assert(out(1).isNullAt(1))
    assert(out(2).isNullAt(1))
  }
}
