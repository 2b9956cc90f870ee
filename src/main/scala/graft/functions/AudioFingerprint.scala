package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PERCEPTUAL AUDIO FINGERPRINT — the audio sibling of [[ImageDHash]]
  * (VERDICT r18 #4): the decoded sample stream's amplitude envelope is
  * reduced to `nWin` equal windows and packed ONE BIT PER ADJACENT-WINDOW
  * COMPARISON — bit k set iff window k+1's mean |mix| exceeds window
  * k's. Near-duplicate clips (a re-encode, a few bumped samples) land
  * at small Hamming distance; the production configuration nWin = 65
  * yields the 64-bit fingerprint that rides the same quarter-block
  * miner as the image hash ([[graft.pipeline.Dedup]] audioFpPairs).
  *
  * Everything is INTEGER-EXACT (hash-gatable): the mix is the channel
  * SUM c0 + c1 (no /2 — comparisons are scale-free), window k is
  * {f : (f·nWin) div n = k} in floor arithmetic (every window nonempty
  * when n ≥ nWin), window statistics are (Σ|mix|, count), and mean
  * comparisons cross-multiply — 128-bit exact via `Math.multiplyHigh`,
  * so a hostile 2^26-frame max-amplitude stream cannot overflow a
  * comparison into a fabricated bit.
  *
  * Codec dispatch mirrors [[AudioDecode]]: RIFF/WAVE → [[PcmDecode]],
  * fLaC → [[FlacDecode]], FORM/AIFF → [[AiffDecode]], each TAPPED
  * through the streaming [[MixSink]]
  * seam — O(nWin) state, never a materialized sample array (an audio
  * clip at crawl scale can run tens of millions of frames). Because
  * both kernels are lossless, THE SAME CLIP STORED AS WAV AND AS FLAC
  * FINGERPRINTS IDENTICALLY (spec-pinned) — cross-codec re-encodes land
  * at Hamming distance 0, exactly like P6/PNG for the image hash.
  *
  * Null contract: whatever the kernel nulls (malformed, corrupt CRC,
  * out-of-scope), plus streams with fewer frames than windows and FLAC
  * payloads whose STREAMINFO leaves the total UNKNOWN (0) — the
  * windowing needs the total up front to stay streaming. Map-only,
  * codegen'd, stream-safe.
  */
case class AudioFingerprint(child: Expression, nWin: Int) extends UnaryExpression {

  override def dataType: DataType = AudioFingerprint.schema
  override def nullable: Boolean = true
  override def prettyName: String = "audio_fingerprint"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"audio_fingerprint expects binary, got ${child.dataType.catalogString}")
    else if (nWin < 2 || nWin > 65)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"audio_fingerprint windows must satisfy 2 <= nWin <= 65; got $nWin")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    AudioFingerprint.fingerprint(input.asInstanceOf[Array[Byte]], nWin)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.AudioFingerprint.fingerprint($v, $nWin);
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): AudioFingerprint =
    copy(child = c)
}

object AudioFingerprint {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("fp", LongType, nullable = false)))

  /** Envelope accumulator over the [[MixSink]] seam: O(nWin) state. */
  private final class WindowSink(nWin: Int) extends MixSink {
    val sums = new Array[Long](nWin)
    val cnts = new Array[Long](nWin)
    var n: Long = -1L
    var valid = false
    private var f: Long = 0L
    override def init(totalFrames: Long): Unit = {
      n = totalFrames
      valid = totalFrames >= nWin // unknown (0) or below-grid → no fp
    }
    override def accept(mix: Int): Unit = {
      if (valid && f < n) {
        val k = ((f * nWin) / n).toInt
        sums(k) += math.abs(mix.toLong)
        cnts(k) += 1
        f += 1
      }
    }
  }

  /** a·b > c·d for nonnegative longs, 128-bit exact (window sums can
    * reach 2^51 and counts 2^26 — the 64-bit product would wrap).
    */
  private def gtProd(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) > 0
  }

  def fingerprint(bytes: Array[Byte], nWin: Int): InternalRow = {
    if (bytes.length < 12) return null
    val sink = new WindowSink(nWin)
    val format =
      if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') {
        if (PcmDecode.decode(bytes, sink) == null) return null
        "wav"
      } else if (bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C') {
        if (FlacDecode.decode(bytes, sink) == null) return null
        "flac"
      } else if (bytes(0) == 'F' && bytes(1) == 'O' && bytes(2) == 'R' && bytes(3) == 'M' &&
        bytes(8) == 'A' && bytes(9) == 'I' && bytes(10) == 'F' && bytes(11) == 'F') {
        if (AiffDecode.decode(bytes, sink) == null) return null
        "aiff"
      } else return null
    if (!sink.valid) return null
    var fp = 0L
    var k = 0
    while (k < nWin - 1) {
      if (gtProd(sink.sums(k + 1), sink.cnts(k), sink.sums(k), sink.cnts(k + 1)))
        fp |= 1L << k
      k += 1
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(format), sink.n, fp))
  }

  def apply(bytes: Column, nWin: Int): Column =
    ColumnBridge.toColumn(AudioFingerprint(ColumnBridge.toExpression(bytes), nWin))
}
