package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the native aggregates, so `spark.sql("SELECT
  * smoke(value) …")` works like the reference's in-database functions
  * (database.py:444-477). Use either:
  *
  *   - `GraftExtensions.register(spark)` on an existing session, or
  *   - `spark.sql.extensions=graft.functions.GraftExtensions` /
  *     `.withExtensions(new GraftExtensions)` at session build.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name)

  /** Extract a foldable non-negative int argument (plane counts, n-gram
    * sizes) from a SQL call site.
    */
  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Numeric literal as Double — SQL literals arrive as Int, Long,
    * Double, or Decimal (the parser's default for `1000000.0`)
    * depending on the written form.
    */
  private def doubleArg(e: Expression, what: String): Double = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toDouble
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toDouble
    case org.apache.spark.sql.catalyst.expressions.Literal(
      v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  private def boolArg(e: Expression, what: String): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("smoke"),
      info("smoke", "smoke(col) - ntile-20 percentile sketch"),
      (exprs: Seq[Expression]) => SmokeAggregate(exprs.head)),
    (
      FunctionIdentifier("most"),
      info("most", "most(col) - most frequent value"),
      (exprs: Seq[Expression]) => MostAggregate(exprs.head)),
    // fused scalar expressions — the LLM-pipeline primitives, SQL-callable
    (
      FunctionIdentifier("text_profile"),
      info("text_profile", "text_profile(text) - single-pass token/char/lang counters struct"),
      (exprs: Seq[Expression]) => TextProfile(exprs.head)),
    (
      FunctionIdentifier("text_fingerprint"),
      info("text_fingerprint", "text_fingerprint(text) - md5 of normalized text"),
      (exprs: Seq[Expression]) => TextFingerprint(exprs.head)),
    (
      FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(text) - 60-bit md5-family SimHash"),
      (exprs: Seq[Expression]) => SimHash60(exprs.head)),
    (
      FunctionIdentifier("word_ngram_hashes"),
      info("word_ngram_hashes", "word_ngram_hashes(text, n) - sorted distinct xxhash64 shingle hashes"),
      (exprs: Seq[Expression]) =>
        WordNgramHashes(exprs.head, intArg(exprs(1), "n"))),
    (
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(hashes, k) - k-plane xxhash64 MinHash signature"),
      (exprs: Seq[Expression]) =>
        MinHashSignature(exprs.head, intArg(exprs(1), "numHashes"))),
    (
      FunctionIdentifier("minhash_signature_md5"),
      info("minhash_signature_md5", "minhash_signature_md5(text, n, k) - md5-family MinHash signature"),
      (exprs: Seq[Expression]) =>
        MinHashSignatureMd5(exprs.head, intArg(exprs(1), "n"), intArg(exprs(2), "numHashes"))),
    (
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - double dot product of float/double arrays"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))),
    (
      FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(text, n) - raw word n-gram occurrences (duplicates kept)"),
      (exprs: Seq[Expression]) =>
        WordNgrams(exprs.head, intArg(exprs(1), "n"))),
    (
      FunctionIdentifier("word_ngram_pos_hashes"),
      info("word_ngram_pos_hashes", "word_ngram_pos_hashes(text, n) - positional xxhash64 shingle hashes (index = token position)"),
      (exprs: Seq[Expression]) =>
        WordNgramPosHashes(exprs.head, intArg(exprs(1), "n"))),
    (
      FunctionIdentifier("outer_product"),
      info("outer_product", "outer_product(vec, d, quant) - exact quantized second-moment sums [n, sums, upper-triangle products]"),
      (exprs: Seq[Expression]) =>
        OuterProductAggregate(
          exprs.head, intArg(exprs(1), "dims"), doubleArg(exprs(2), "quant"))),
    (
      FunctionIdentifier("bloom_ngram_positions"),
      info("bloom_ngram_positions", "bloom_ngram_positions(text, n, m, k, md5) - bloom probe positions of distinct word n-grams"),
      (exprs: Seq[Expression]) =>
        BloomNgramPositions(
          exprs.head, intArg(exprs(1), "n"), intArg(exprs(2), "mBits"),
          intArg(exprs(3), "kHashes"), boolArg(exprs(4), "md5Family"))),
    (
      FunctionIdentifier("topk_counted"),
      info("topk_counted", "topk_counted(cnt, value, k) - k best (cnt desc, value asc) counted strings"),
      (exprs: Seq[Expression]) =>
        TopKCountedAggregate(exprs.head, exprs(1), intArg(exprs(2), "k"))),
    (
      FunctionIdentifier("bitmap_or"),
      info("bitmap_or", "bitmap_or(positions, m) - OR-fold bit positions into one m-bit bitmap"),
      (exprs: Seq[Expression]) =>
        BitmapOrAggregate(exprs.head, intArg(exprs(1), "mBits"))),
    (
      FunctionIdentifier("image_header"),
      info("image_header", "image_header(bytes) - PNG/JPEG container metadata struct"),
      (exprs: Seq[Expression]) => ImageHeader(exprs.head)),
    (
      FunctionIdentifier("audio_header"),
      info("audio_header", "audio_header(bytes) - WAV/RIFF container metadata struct"),
      (exprs: Seq[Expression]) => AudioHeader(exprs.head)),
    (
      FunctionIdentifier("video_header"),
      info("video_header", "video_header(bytes) - MP4/ISO-BMFF container metadata struct"),
      (exprs: Seq[Expression]) => VideoHeader(exprs.head)))

  /** Imperative registration on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
}
