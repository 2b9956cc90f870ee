package graft

import graft.functions.{BitmapOrAggregate, BloomNgram, BloomNgramHitCount, BloomNgramPositions}
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1 << 16
  private val K = 4

  private lazy val bench = Seq(
    (10L, "the quick brown fox jumps over the lazy dog"),
    (20L, "pack my box with five dozen liquor jugs"))
    .toDF("doc_id", "text")

  private lazy val corpus = Seq(
    (1L, "watch the quick brown fox run"),        // shares "the quick brown" + "quick brown fox"
    (2L, "five dozen liquor jugs on a shelf"),    // shares "five dozen liquor" + "dozen liquor jugs"
    (3L, "completely unrelated sentence about spark engines"),
    (4L, "too short"))                            // < 3 tokens: no shingles
    .toDF("doc_id", "text")

  test("position math: k probes in range, h2 odd, deterministic") {
    val out = new Array[Long](K)
    for (base <- Seq(0L, 1L, (1L << 60) - 1, 123456789012345L)) {
      BloomNgram.positions(base, M, K, out)
      assert(out.forall(p => p >= 0 && p < M), s"base $base -> ${out.toSeq}")
      val again = new Array[Long](K)
      BloomNgram.positions(base, M, K, again)
      assert(out.toSeq === again.toSeq)
    }
  }

  test("bloom decontamination has NO false negatives vs the exact join") {
    val exact = Dedup.decontaminate(corpus, bench, "doc_id", "text", 3)
      .select("doc_id").as[Long].collect().toSet
    for (md5Family <- Seq(true, false)) {
      val bloom = Dedup.decontaminateBloom(
          corpus, bench, "doc_id", "text", 3,
          mBits = M, kHashes = K, md5Family = md5Family)
        .select("doc_id").as[Long].collect().toSet
      assert(exact.subsetOf(bloom),
        s"md5Family=$md5Family: exact $exact not within bloom $bloom")
    }
  }

  test("hit count equals the exact shared-shingle count when no collisions") {
    // at m=2^16 with ~14 bench shingles the false-positive rate is ~1e-11
    // per probe-set; on this corpus the counts should match exactly
    val exact = Dedup.decontaminate(corpus, bench, "doc_id", "text", 3)
      .select(col("doc_id"), col("n_ngrams")).as[(Long, Long)].collect().toMap
    val bloom = Dedup.decontaminateBloom(
        corpus, bench, "doc_id", "text", 3, mBits = M, kHashes = K)
      .as[(Long, Long)].collect().toMap
    assert(bloom === exact)
  }

  test("bitmap build: one row, OR-fold across partitions, popcount sane") {
    val words = Dedup.bloomBitmap(
      bench.repartition(8), "text", 3, mBits = M, kHashes = K)
    assert(words.length === M / 64)
    val bits = words.map(java.lang.Long.bitCount).sum
    // 2 docs * (9-2 and 8-2) shingles = 13 distinct grams, k=4 probes:
    // <= 52 bits, > 0; duplicates/collisions only reduce the count
    assert(bits > 0 && bits <= 52, s"popcount $bits")
    // build is partition-count invariant
    val words1 = Dedup.bloomBitmap(
      bench.repartition(1), "text", 3, mBits = M, kHashes = K)
    assert(java.util.Arrays.equals(words, words1))
  }

  test("md5 and xxhash64 families agree on this corpus (family bridge)") {
    val md5 = Dedup.decontaminateBloom(
        corpus, bench, "doc_id", "text", 3, mBits = M, kHashes = K, md5Family = true)
      .as[(Long, Long)].collect().toMap
    val xx = Dedup.decontaminateBloom(
        corpus, bench, "doc_id", "text", 3, mBits = M, kHashes = K, md5Family = false)
      .as[(Long, Long)].collect().toMap
    assert(md5 === xx)
  }

  test("geometry mismatches fail loudly") {
    intercept[IllegalArgumentException] {
      BloomNgram.checkGeometry(1000, 4) // not a power of two
    }
    intercept[IllegalArgumentException] {
      BloomNgram.checkGeometry(1 << 16, 0)
    }
    // probe bitmap sized for the wrong m
    intercept[IllegalArgumentException] {
      BloomNgramHitCount(col("text"), 3, 1 << 16, 4, false, new Array[Long](8))
    }
  }

  test("out-of-range positions are rejected by the bitmap aggregate") {
    val bad = Seq(Tuple1(Array(0L, M.toLong))).toDF("p")
    val e = intercept[Exception] {
      bad.agg(BitmapOrAggregate.bitmapOr(col("p"), M)).head()
    }
    assert(e.getMessage != null)
  }

  test("short documents produce no positions and never hit") {
    val pos = Seq(Tuple1("one two")).toDF("t")
      .select(BloomNgramPositions(col("t"), 3, M, K, md5Family = false).as("p"))
      .as[Seq[Long]].head()
    assert(pos.isEmpty)
    val words = Dedup.bloomBitmap(bench, "text", 3, mBits = M, kHashes = K)
    val hits = Seq(Tuple1("one two")).toDF("t")
      .select(BloomNgramHitCount(col("t"), 3, M, K, md5Family = false, words).as("h"))
      .as[Long].head()
    assert(hits === 0L)
  }
}
