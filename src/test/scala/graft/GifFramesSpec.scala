package graft

import graft.functions.GifDecode
import graft.pipeline.Multimodal

/** The animated-GIF compositing contract ([[GifDecode.decodeFrames]]):
  * sub-frame placement, GCE transparency, disposal 0/1/2, sampling —
  * pinned on HAND-BUILT payloads (the JDK sequence writer emits only
  * full frames) plus the real ImageIO sequence round-trip.
  */
class GifFramesSpec extends SparkSpec {

  // ---- hand-built GIF assembly (minCode 8: 9-bit codes, no width
  //      growth for tiny frames — CLEAR, literals…, EOI) ----
  private def lzwData(pixels: Seq[Int]): Array[Byte] = {
    val codes = Seq(256) ++ pixels ++ Seq(257)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var acc = 0L
    var nb = 0
    codes.foreach { c =>
      acc |= c.toLong << nb
      nb += 9
      while (nb >= 8) { out += (acc & 0xff).toByte; acc >>= 8; nb -= 8 }
    }
    if (nb > 0) out += (acc & 0xff).toByte
    out.toArray
  }

  private def subBlocks(data: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var i = 0
    while (i < data.length) {
      val n = math.min(255, data.length - i)
      out += n.toByte
      out ++= data.slice(i, i + n)
      i += n
    }
    out += 0.toByte
    out.toArray
  }

  private def le16b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)

  // 4-entry palette: 0=(10,20,30) 1=(200,150,100) 2=(1,2,3) 3=(40,50,60)
  private val pal = Array[Byte](
    10, 20, 30, (200).toByte, (150).toByte, 100, 1, 2, 3, 40, 50, 60)
  private val palRgb = Seq((10, 20, 30), (200, 150, 100), (1, 2, 3), (40, 50, 60))

  private def header(sw: Int, sh: Int, bg: Int = 0): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ le16b(sw) ++ le16b(sh) ++
      Array[Byte](0x81.toByte, bg.toByte, 0) ++ pal // GCT, 4 entries

  private def gce(disposal: Int, transIdx: Int): Array[Byte] =
    Array[Byte](0x21, 0xf9.toByte, 4,
      ((disposal << 2) | (if (transIdx >= 0) 1 else 0)).toByte,
      0, 0, (if (transIdx >= 0) transIdx else 0).toByte, 0)

  private def image(
      left: Int, top: Int, w: Int, h: Int, pixels: Seq[Int]): Array[Byte] =
    Array[Byte](0x2c) ++ le16b(left) ++ le16b(top) ++ le16b(w) ++ le16b(h) ++
      Array[Byte](0, 8) ++ subBlocks(lzwData(pixels))

  private val trailer = Array[Byte](0x3b)

  private def sums(canvasIdx: Seq[Int]): (Long, Long, Long) =
    canvasIdx.foldLeft((0L, 0L, 0L)) { case ((r, g, b), i) =>
      val (pr, pg, pb) = palRgb(i)
      (r + pr, g + pg, b + pb)
    }

  test("sub-frame placement + transparency composite onto the canvas") {
    // 4x4 screen: frame 0 full of idx 0; frame 1 a 2x2 sub-frame at
    // (1,1) = [1, 2, 2, 1] with transparent index 2 — only the two 1s
    // land; sampled canvas (every=1, both frames) is exact
    val f0 = image(0, 0, 4, 4, Seq.fill(16)(0))
    val f1 = gce(disposal = 0, transIdx = 2) ++ image(1, 1, 2, 2, Seq(1, 2, 2, 1))
    val b = header(4, 4) ++ f0 ++ f1 ++ trailer
    val r = GifDecode.decodeFrames(b, 1)
    assert(r != null, "sub-frame animation must decode")
    assert(r.getInt(0) === 4 && r.getInt(1) === 4)
    assert(r.getLong(2) === 2L && r.getLong(3) === 2L)
    // canvas after f0: all 0; after f1: (1,1)=1 and (2,2)=1, rest 0
    val canvas0 = Seq.fill(16)(0)
    val canvas1 = canvas0.updated(1 * 4 + 1, 1).updated(2 * 4 + 2, 1)
    val (r0, g0, b0) = sums(canvas0)
    val (r1, g1, b1) = sums(canvas1)
    assert((r.getLong(4), r.getLong(5), r.getLong(6)) === ((r0 + r1, g0 + g1, b0 + b1)))
    // thumb of the LAST sampled canvas: pixels (0,0) (2,0) (0,2) (2,2)
    // = idx 0, 0, 0, 1
    assert(r.getString(7) === "0a141e" + "0a141e" + "0a141e" + "c89664")
  }

  test("disposal 2 restores the sub-rect to the background color before the next frame") {
    // bg index 3 = (40,50,60); frame 0 full idx 0 with disposal 2 —
    // before frame 1 draws, the WHOLE canvas (frame 0's rect) restores
    // to bg; frame 1 is a 1x1 at (0,0) of idx 1
    val f0 = gce(disposal = 2, transIdx = -1) ++ image(0, 0, 4, 4, Seq.fill(16)(0))
    val f1 = image(0, 0, 1, 1, Seq(1))
    val b = header(4, 4, bg = 3) ++ f0 ++ f1 ++ trailer
    // sample ONLY frame 1 (every=2 samples frames 0 and... sample both
    // then subtract frame 0's known sums)
    val r = GifDecode.decodeFrames(b, 1)
    assert(r != null)
    val (fr0, fg0, fb0) = sums(Seq.fill(16)(0))
    val canvas1 = Seq(1) ++ Seq.fill(15)(3) // restored bg, then the 1x1
    val (fr1, fg1, fb1) = sums(canvas1)
    assert((r.getLong(4), r.getLong(5), r.getLong(6)) ===
      ((fr0 + fr1, fg0 + fg1, fb0 + fb1)))
  }

  test("disposal 3 restores the frame's rect to its pre-draw content") {
    // 2x2 screen. Frame 0: full idx 0. Frame 1: disposal 3, 1x1 idx 1 at
    // (0,0) — before frame 2 composites, that rect restores to idx 0.
    // Frame 2: 1x1 idx 2 at (1,1).
    val f0 = image(0, 0, 2, 2, Seq(0, 0, 0, 0))
    val f1 = gce(disposal = 3, transIdx = -1) ++ image(0, 0, 1, 1, Seq(1))
    val f2 = image(1, 1, 1, 1, Seq(2))
    val b = header(2, 2) ++ f0 ++ f1 ++ f2 ++ trailer
    val r = GifDecode.decodeFrames(b, 1)
    assert(r != null, "disposal-3 animation must decode")
    assert(r.getLong(2) === 3L && r.getLong(3) === 3L)
    val c0 = Seq(0, 0, 0, 0)
    val c1 = Seq(1, 0, 0, 0)          // frame 1 drew
    val c2 = Seq(0, 0, 0, 2)          // rect restored, then frame 2 drew
    val exp = Seq(c0, c1, c2).map(sums)
      .reduce((p, q) => (p._1 + q._1, p._2 + q._2, p._3 + q._3))
    assert((r.getLong(4), r.getLong(5), r.getLong(6)) === exp)
    // thumb of the LAST canvas: (0,0) (0,1) (1,0) (1,1) = idx 0,0,0,2
    assert(r.getString(7) === "0a141e" + "0a141e" + "0a141e" + "010203")
  }

  test("consecutive disposal-3 frames of different sizes restore independently") {
    // 3x1 screen, frame 0 = [0,0,0]. Frame 1: disposal 3, 2x1 idx [1,1]
    // at (0,0). Frame 2: disposal 3, 1x1 idx 2 at (2,0) — frame 1's rect
    // restores first, so canvas2 = [0,0,2]; then frame 2's rect restores
    // before frame 3 = 1x1 idx 3 at (0,0): canvas3 = [3,0,0].
    val f0 = image(0, 0, 3, 1, Seq(0, 0, 0))
    val f1 = gce(disposal = 3, transIdx = -1) ++ image(0, 0, 2, 1, Seq(1, 1))
    val f2 = gce(disposal = 3, transIdx = -1) ++ image(2, 0, 1, 1, Seq(2))
    val f3 = image(0, 0, 1, 1, Seq(3))
    val b = header(3, 1) ++ f0 ++ f1 ++ f2 ++ f3 ++ trailer
    val r = GifDecode.decodeFrames(b, 1)
    assert(r != null)
    assert(r.getLong(2) === 4L)
    val canvases = Seq(
      Seq(0, 0, 0), Seq(1, 1, 0), Seq(0, 0, 2), Seq(3, 0, 0))
    val exp = canvases.map(sums)
      .reduce((p, q) => (p._1 + q._1, p._2 + q._2, p._3 + q._3))
    assert((r.getLong(4), r.getLong(5), r.getLong(6)) === exp)
  }

  test("disposal 3 composes with transparency: only opaque pixels restore away") {
    // frame 1 draws transparently over half its rect; restore still
    // brings back the FULL pre-draw rect (snapshot is pre-draw content,
    // not a diff of what the frame touched)
    val f0 = image(0, 0, 2, 1, Seq(0, 1))
    val f1 = gce(disposal = 3, transIdx = 2) ++ image(0, 0, 2, 1, Seq(3, 2))
    val f2 = image(0, 0, 1, 1, Seq(2))
    val b = header(2, 1) ++ f0 ++ f1 ++ f2 ++ trailer
    val r = GifDecode.decodeFrames(b, 1)
    assert(r != null)
    val canvases = Seq(
      Seq(0, 1),  // frame 0
      Seq(3, 1),  // frame 1: idx 3 lands, transparent idx 2 leaves (1)
      Seq(2, 1))  // restore [0,1], then frame 2 draws idx 2 at (0,0)
    val exp = canvases.map(sums)
      .reduce((p, q) => (p._1 + q._1, p._2 + q._2, p._3 + q._3))
    assert((r.getLong(4), r.getLong(5), r.getLong(6)) === exp)
  }

  test("hostile fold amplification: many tiny frames on a huge canvas -> null") {
    // 2048x2048 canvas = 4 MiPx per sampled fold; 2^30 work units allow
    // exactly 256 folds. 250 one-pixel frames pass; 300 exceed the
    // budget and null — the cap bounds CPU, not just frame count.
    val sw = 2048
    def anim(nFrames: Int): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      out ++= header(sw, sw)
      var i = 0
      while (i < nFrames) { out ++= image(0, 0, 1, 1, Seq(0)); i += 1 }
      out ++= trailer
      out.toArray
    }
    assert(GifDecode.decodeFrames(anim(250), 1) != null)
    assert(GifDecode.decodeFrames(anim(300), 1) == null)
    // sampling divides the fold count: 300 frames at every=4 is 75 folds
    assert(GifDecode.decodeFrames(anim(300), 4) != null)
  }

  test("malformed animations null: frame outside the screen, missing trailer, bad index") {
    val good = header(2, 2) ++ image(0, 0, 2, 2, Seq(0, 1, 2, 3)) ++ trailer
    assert(GifDecode.decodeFrames(good, 1) != null)
    // sub-frame past the screen edge
    val oob = header(2, 2) ++ image(1, 1, 2, 2, Seq(0, 1, 2, 3)) ++ trailer
    assert(GifDecode.decodeFrames(oob, 1) == null)
    // truncated before the trailer
    assert(GifDecode.decodeFrames(good.dropRight(1), 1) == null)
    // index past the 4-entry table
    val badIdx = header(2, 2) ++ image(0, 0, 2, 2, Seq(0, 1, 2, 5)) ++ trailer
    assert(GifDecode.decodeFrames(badIdx, 1) == null)
    // an out-of-table index must null even when it IS the transparent
    // index — transparency must not bypass the palette bound
    val transOob = header(2, 2) ++ gce(disposal = 0, transIdx = 5) ++
      image(0, 0, 2, 2, Seq(0, 1, 2, 5)) ++ trailer
    assert(GifDecode.decodeFrames(transOob, 1) == null)
  }

  test("real ImageIO sequence: sampling arithmetic and parity with single-frame decode") {
    val frames = Seq("0123", "4567", "89ab").map(_ + "")
    val b = Multimodal.encodeGifAnimated(2, 2, frames)
    val all = GifDecode.decodeFrames(b, 1)
    assert(all != null)
    assert(all.getLong(2) === 3L && all.getLong(3) === 3L)
    val every2 = GifDecode.decodeFrames(b, 2)
    assert(every2.getLong(3) === 2L)
    val every3 = GifDecode.decodeFrames(b, 3)
    assert(every3.getLong(3) === 1L)
    // frame sums: each frame is full-size, so the sampled canvases are
    // the frames themselves — recompute from the shared palette formula
    def frameSums(px: String): (Long, Long, Long) =
      px.foldLeft((0L, 0L, 0L)) { case ((r, g, b0), ch) =>
        val j = ch & 0xff
        (r + (j * 7 + 13) % 256, g + (j * 11 + 5) % 256, b0 + (j * 3 + 77) % 256)
      }
    // every=2 samples frames 0 and 2
    val (er2, eg2, eb2) = Seq(frames(0), frames(2)).map(frameSums)
      .reduce((p, q) => (p._1 + q._1, p._2 + q._2, p._3 + q._3))
    assert((every2.getLong(4), every2.getLong(5), every2.getLong(6)) === ((er2, eg2, eb2)))
    // every=1 sums all three frames
    val (ea, ega, eba) = frames.map(frameSums)
      .reduce((p, q) => (p._1 + q._1, p._2 + q._2, p._3 + q._3))
    assert((all.getLong(4), all.getLong(5), all.getLong(6)) === ((ea, ega, eba)))
    // the 1-frame decode and frame 0 of the animation agree
    val single = GifDecode.decode(Multimodal.encodeGifIndexed(2, 2, frames(0), interlaced = false))
    val first = GifDecode.decodeFrames(b, 4) // samples only frame 0
    assert((first.getLong(4), first.getLong(5), first.getLong(6)) ===
      ((single.getLong(4), single.getLong(5), single.getLong(6))))
  }
}
