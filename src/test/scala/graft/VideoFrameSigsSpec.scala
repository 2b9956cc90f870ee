package graft

import org.apache.spark.sql.functions._

import graft.functions.{ImageDHash, VideoFrameSigs}
import graft.pipeline.{Dedup, Multimodal}

/** Video frame signatures: per-sampled-frame dHash composition over
  * both container walks (Y4M luma planes, GIF composited canvases),
  * sampling semantics, strict nulls, the inverted-list pair mine, and
  * the codegen path.
  */
class VideoFrameSigsSpec extends SparkSpec {
  import spark.implicits._

  /** 3-frame C444 y4m whose frame k luma is painted by `lum(k, x, y)`;
    * chroma planes are flat 0x40.
    */
  private def y4m(w: Int, h: Int, lum: (Int, Int, Int) => Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 C444\n".getBytes("US-ASCII"))
    for (k <- 0 until 3) {
      bos.write("FRAME\n".getBytes("US-ASCII"))
      for (y <- 0 until h; x <- 0 until w) bos.write(lum(k, x, y) & 0xff)
      for (_ <- 0 until 2 * w * h) bos.write(0x40)
    }
    bos.toByteArray
  }

  test("y4m: sampled frames' luma dHash, in frame order; step skips the middle frame") {
    // frame 0: rising x-gradient (all bits), frame 1: junk the sampler
    // must SKIP, frame 2: falling gradient (no bits)
    val clip = y4m(9, 8, (k, x, y) =>
      if (k == 0) x * 20 else if (k == 2) (8 - x) * 20 else (x * 37 + y * 11) % 256)
    val r = VideoFrameSigs.sigs(clip, 2, 9, 8)
    assert(r != null)
    assert(r.getUTF8String(0).toString === "y4m")
    assert((r.getInt(1), r.getInt(2)) === ((9, 8)))
    assert((r.getLong(3), r.getLong(4)) === ((3L, 2L)))
    val sigs = r.getArray(5).toLongArray
    assert(sigs.length === 2)
    assert(sigs(0) === -1L, "rising gradient: all 64 bits")   // 8 bits x 8 rows
    assert(sigs(1) === 0L, "falling gradient: no bits")
    // step 1 samples all three frames
    assert(VideoFrameSigs.sigs(clip, 1, 9, 8).getArray(5).numElements() === 3)
  }

  test("gif animation: sampled COMPOSITED canvases hash like their packed rasters") {
    // two-frame animated GIF over the shared palette; the second frame
    // overdraws, so the step-1 signature list has two entries and each
    // equals the dHash of the palette-expanded canvas at that point
    val f0 = "0123456789ab" * 8 // 12x8 indices
    val f1 = "ba9876543210" * 8
    val gif = Multimodal.encodeGifAnimated(12, 8, Seq(f0, f1))
    val r = VideoFrameSigs.sigs(gif, 1, 9, 8)
    assert(r != null)
    assert(r.getUTF8String(0).toString === "gif")
    val sigs = r.getArray(5).toLongArray
    assert(sigs.length === 2)
    def canvasHash(idx: String): Long = {
      val px = idx.map { c =>
        val (pr, pg, pb) = Multimodal.paletteEntry(c & 0xff)
        (pr << 16) | (pg << 8) | pb
      }.toArray
      ImageDHash.hashPacked(px, 12, 8, 9, 8)
    }
    assert(sigs(0) === canvasHash(f0))
    assert(sigs(1) === canvasHash(f1), "full-frame overdraw: canvas == frame 2")
  }

  test("strict nulls: below-grid frames, junk, truncation") {
    val tiny = y4m(4, 3, (_, x, _) => x * 10)
    assert(VideoFrameSigs.sigs(tiny, 2, 9, 8) == null, "below the hash grid")
    assert(VideoFrameSigs.sigs("no video here".getBytes, 2, 9, 8) == null)
    val clip = y4m(9, 8, (_, x, _) => x)
    assert(VideoFrameSigs.sigs(java.util.Arrays.copyOf(clip, clip.length - 7), 2, 9, 8)
      == null, "truncated final frame")
  }

  test("pair mining: clips sharing a sampled frame pair up; disjoint clips do not") {
    val docs = spark.range(0, 100).selectExpr(
      "id AS doc_id",
      "concat('video clip text number ', id) AS text",
      "CAST(20 + id % 40 AS INT) AS n_chars",
      "concat('s', id % 3) AS source",
      "concat('l', id % 2) AS lang")
    val pairs = Dedup.videoFrameSigPairs(
      Multimodal.mediaTableVideoPairs(docs), "media_id", "payload",
      step = 2, gw = 9, gh = 8)
      .collect()
    val want = (0 until 100).filter(_ % 5 != 4).map(i => (i * 2L, i * 2L + 1)).toSet
    val got = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.subsetOf(got), s"missing planted pairs: ${(want -- got).take(5)}")
    pairs.filter(r => want((r.getLong(0), r.getLong(1))))
      .foreach(r => assert(r.getInt(2) >= 1))
  }

  test("the expression path (codegen) matches eval, nulls included") {
    val clip = y4m(9, 8, (k, x, _) => (x * (k + 1) * 13) % 256)
    val rows = Seq((1L, clip), (2L, "junk".getBytes("UTF-8")))
    val out = rows.toDF("media_id", "payload")
      .select(col("media_id"), VideoFrameSigs(col("payload"), 2, 9, 8).as("v"))
      .select(col("media_id"), col("v.format"), col("v.sigs"))
      .orderBy("media_id").collect()
    assert(out(0).getString(1) === "y4m")
    val direct = VideoFrameSigs.sigs(clip, 2, 9, 8).getArray(5).toLongArray
    assert(out(0).getSeq[Long](2) === direct.toSeq)
    assert(out(1).isNullAt(1))
  }
}
