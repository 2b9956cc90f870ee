package graft.functions

/** Streaming tap on a sample decode — the audio siblings' analog of the
  * image kernels' expanded-raster seam ([[PngDecode.decodeRaster]]):
  * [[PcmDecode]] and [[FlacDecode]] call `init` once the header has
  * declared the frame total and then `accept` once per inter-channel
  * frame IN ORDER with the channel-summed mix (c0 + c1; c0 for mono —
  * scale-free for the comparisons consumers make, no /2). Consumers
  * fold running statistics ([[AudioFingerprint]]'s window envelope)
  * without the decoder ever materializing the sample stream — at 100 TB
  * an audio clip can run tens of millions of frames, and the fingerprint
  * needs O(windows) state, not O(samples).
  *
  * The decode's null contract is unchanged: a consumer must discard
  * sink state whenever the decode itself returns null.
  */
/** Streaming tap on a frame-sampling walk — the video analog of
  * [[MixSink]]: [[Y4mSample]] calls `acceptLuma` with each SAMPLED
  * frame's luma plane in place (no copy), [[GifDecode.decodeFrames]]
  * calls `acceptCanvas` with each sampled COMPOSITED canvas. Consumers
  * ([[VideoFrameSigs]]) fold per-frame reductions without a second
  * container walk. A consumer must discard sink state whenever the
  * walk itself returns null.
  */
private[graft] trait FrameSink {
  def acceptLuma(bytes: Array[Byte], off: Int, w: Int, h: Int): Unit
  def acceptCanvas(canvas: Array[Int], w: Int, h: Int): Unit
}

private[graft] trait MixSink {
  /** Declared inter-channel frame total (PCM: data size / block align;
    * FLAC: STREAMINFO total samples — 0 means UNKNOWN, and streaming
    * consumers that need the total up front should invalidate).
    */
  def init(totalFrames: Long): Unit

  /** One inter-channel frame's channel-summed mix, called in stream order. */
  def accept(mix: Int): Unit
}
