package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared Bloom-filter position math for n-gram membership filters.
  *
  * Double hashing (Kirsch–Mitzenmacher): from one 60-bit base hash per
  * shingle, the k probe positions are
  *
  *   h1 = base & (m−1),  h2 = ((base >> log2(m)) & (m−1)) | 1
  *   p_i = (h1 + i·h2) mod m          for i in 0..k−1
  *
  * `m` must be a power of two so the mask/shift forms are exact in both
  * engines; h2 is forced odd so it is coprime with m and the probe
  * sequence never degenerates. All intermediates stay far below 2^63 —
  * the same BIGINT arithmetic DuckDB performs, so the md5-base family
  * (`md5Family = true`, base = lower-60-md5 exactly like
  * [[MinHashSignatureMd5.md5Base60]]) is oracle-reproducible:
  *
  *   base = ('0x' || substr(md5(g), 1, 15))::BIGINT
  *   p_i  = ((base & (m-1)) + i * (((base >> s) & (m-1)) | 1)) % m
  *
  * The production family (`md5Family = false`) uses xxhash64(seed 42)
  * masked to 60 bits — one 8-byte hash per shingle instead of an md5;
  * BloomSpec bridges the two families.
  */
object BloomNgram {
  def checkGeometry(mBits: Int, kHashes: Int): Unit = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64, got $mBits")
    require(kHashes >= 1 && kHashes <= 16, s"kHashes must be in [1,16], got $kHashes")
  }

  private val Mask60 = (1L << 60) - 1

  def base60(gram: String, md5Family: Boolean): Long =
    if (md5Family) MinHashSignatureMd5.md5Base60(gram)
    else XxHash64Function.hash(UTF8String.fromString(gram), StringType, 42L) & Mask60

  /** Fill `out(0..k-1)` with the probe positions of `base`. */
  def positions(base: Long, mBits: Int, kHashes: Int, out: Array[Long]): Unit = {
    val mask = (mBits - 1).toLong
    val shift = java.lang.Integer.numberOfTrailingZeros(mBits)
    val h1 = base & mask
    val h2 = ((base >>> shift) & mask) | 1L
    var i = 0
    while (i < kHashes) {
      out(i) = (h1 + i * h2) % mBits
      i += 1
    }
  }

  /** TRUE iff every probe position of `base` is set in the bitmap. */
  def allSet(words: Array[Long], base: Long, mBits: Int, kHashes: Int): Boolean = {
    val mask = (mBits - 1).toLong
    val shift = java.lang.Integer.numberOfTrailingZeros(mBits)
    val h1 = base & mask
    val h2 = ((base >>> shift) & mask) | 1L
    var i = 0
    while (i < kHashes) {
      val p = ((h1 + i * h2) % mBits).toInt
      if ((words(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** All Bloom probe positions of a text's word n-grams — `k` longs per
  * DISTINCT shingle (duplicates skipped: they set the same bits), flat
  * in document order. The bench-side build feeds this straight into
  * [[BitmapOrAggregate]]: one map-only pass over the benchmark corpus,
  * no per-gram explode.
  *
  * Tokenization is the shared [[Tokenize]] contract.
  */
case class BloomNgramPositions(
    child: Expression, n: Int, mBits: Int, kHashes: Int, md5Family: Boolean)
  extends UnaryExpression with CodegenFallback {

  BloomNgram.checkGeometry(mBits, kHashes)
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_ngram_positions"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_ngram_positions expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val (starts, ends) = Tokenize.boundaries(s)
    val ntok = starts.length
    if (ntok < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[String]()
    val out = new java.util.ArrayList[Long]((ntok - n + 1) * kHashes)
    val probe = new Array[Long](kHashes)
    val sb = new java.lang.StringBuilder(64)
    var g = 0
    while (g <= ntok - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(s, starts(g + j), ends(g + j))
        j += 1
      }
      val gram = sb.toString
      if (seen.add(gram)) {
        BloomNgram.positions(
          BloomNgram.base60(gram, md5Family), mBits, kHashes, probe)
        var i = 0
        while (i < kHashes) { out.add(probe(i)); i += 1 }
      }
      g += 1
    }
    val arr = new Array[Long](out.size)
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): BloomNgramPositions =
    copy(child = c)
}

object BloomNgramPositions {
  def apply(c: Column, n: Int, mBits: Int, kHashes: Int, md5Family: Boolean): Column =
    ColumnBridge.toColumn(BloomNgramPositions(
      ColumnBridge.toExpression(c), n, mBits, kHashes, md5Family))
}

/** OR-fold of bit positions into one fixed `mBits`-bit bitmap — the
  * distributed Bloom-filter BUILD. The buffer is `mBits/64` longs
  * (m = 2^20 → 128 KB) regardless of corpus size; partial bitmaps
  * OR-merge map-side, and the driver receives exactly ONE bitmap row —
  * at 100 TB this replaces collecting the benchmark's full shingle-hash
  * set (gigabytes for a large eval suite) with a constant-size object.
  *
  * Input rows are `array<bigint>` position lists (from
  * [[BloomNgramPositions]]); positions outside [0, mBits) throw loudly
  * (a geometry mismatch between build and probe would otherwise
  * silently corrupt membership).
  */
case class BitmapOrAggregate(
    positions: Expression,
    mBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  BloomNgram.checkGeometry(mBits, 1)

  override def child: Expression = positions
  private val words = mBits / 64

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_or"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    positions.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitmap_or expects array<bigint>, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = positions.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val p = arr.getLong(i)
      require(p >= 0 && p < mBits,
        s"bitmap_or: position $p outside [0, $mBits) — build/probe geometry mismatch")
      buf((p >>> 6).toInt) |= 1L << (p & 63)
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words * 8)
    var i = 0
    while (i < words) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](words)
    var i = 0
    while (i < words) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): BitmapOrAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapOrAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapOrAggregate =
    copy(positions = c)
}

object BitmapOrAggregate {
  def bitmapOr(positions: Column, mBits: Int): Column =
    ColumnBridge.toColumn(
      BitmapOrAggregate(ColumnBridge.toExpression(positions), mBits)
        .toAggregateExpression())
}

/** Number of DISTINCT word n-grams of the text whose probe positions are
  * ALL set in the Bloom bitmap — the corpus-side PROBE of Bloom
  * decontamination. The bitmap rides the serialized expression to each
  * executor once (the [[BenchShingleHit]] reference-object pattern);
  * the probe itself is stateless and map-only: no join, no shuffle on
  * the 100 TB side. May over-count (Bloom false positives — the
  * documented trade for the constant-size filter); never under-counts.
  */
case class BloomNgramHitCount(
    child: Expression, n: Int, mBits: Int, kHashes: Int, md5Family: Boolean,
    words: Array[Long])
  extends UnaryExpression with CodegenFallback {

  BloomNgram.checkGeometry(mBits, kHashes)
  require(words.length == mBits / 64,
    s"bitmap has ${words.length} words, geometry needs ${mBits / 64}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_ngram_hit_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_ngram_hit_count expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val (starts, ends) = Tokenize.boundaries(s)
    val ntok = starts.length
    if (ntok < n) return 0L
    val seen = new java.util.HashSet[String]()
    var hits = 0L
    val sb = new java.lang.StringBuilder(64)
    var g = 0
    while (g <= ntok - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(s, starts(g + j), ends(g + j))
        j += 1
      }
      val gram = sb.toString
      if (seen.add(gram) &&
          BloomNgram.allSet(words, BloomNgram.base60(gram, md5Family), mBits, kHashes))
        hits += 1L
      g += 1
    }
    hits
  }

  // content-compare the bitmap (default case-class equality would be
  // by array identity, breaking plan canonicalization)
  override def equals(other: Any): Boolean = other match {
    case b: BloomNgramHitCount =>
      b.child == child && b.n == n && b.mBits == mBits &&
        b.kHashes == kHashes && b.md5Family == md5Family &&
        java.util.Arrays.equals(b.words, words)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Arrays.hashCode(Array(child.hashCode, n, mBits, kHashes,
      md5Family.hashCode, java.util.Arrays.hashCode(words)))

  override protected def withNewChildInternal(c: Expression): BloomNgramHitCount =
    copy(child = c)
}

object BloomNgramHitCount {
  def apply(c: Column, n: Int, mBits: Int, kHashes: Int, md5Family: Boolean,
      words: Array[Long]): Column =
    ColumnBridge.toColumn(BloomNgramHitCount(
      ColumnBridge.toExpression(c), n, mBits, kHashes, md5Family, words))
}
