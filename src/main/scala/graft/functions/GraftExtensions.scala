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

  private def strArg(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
      v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def boolArg(e: Expression, what: String): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  /** One registry row with the arity checked BEFORE the builder indexes
    * into `exprs` — a wrong-arity SQL call gets the signature back, not
    * an IndexOutOfBoundsException.
    */
  private def fn(name: String, usage: String, arity: Int)(
      build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (
      FunctionIdentifier(name),
      info(name, usage),
      (exprs: Seq[Expression]) => {
        if (exprs.length != arity)
          throw new IllegalArgumentException(
            s"$name expects $arity argument(s) — $usage — got ${exprs.length}")
        build(exprs)
      })

  /** Like [[fn]] for a function with optional trailing arguments: any
    * arity in [minArity, maxArity] passes through to the builder.
    */
  private def fnVar(name: String, usage: String, minArity: Int, maxArity: Int)(
      build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (
      FunctionIdentifier(name),
      info(name, usage),
      (exprs: Seq[Expression]) => {
        if (exprs.length < minArity || exprs.length > maxArity)
          throw new IllegalArgumentException(
            s"$name expects $minArity to $maxArity argument(s) — $usage — got ${exprs.length}")
        build(exprs)
      })

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("smoke", "smoke(col) - ntile-20 percentile sketch", 1)(
      exprs => SmokeAggregate(exprs.head)),
    fn("most", "most(col) - most frequent value", 1)(
      exprs => MostAggregate(exprs.head)),
    // fused scalar expressions — the LLM-pipeline primitives, SQL-callable
    fn("text_profile", "text_profile(text) - single-pass token/char/lang counters struct", 1)(
      exprs => TextProfile(exprs.head)),
    fn("text_fingerprint", "text_fingerprint(text) - md5 of normalized text", 1)(
      exprs => TextFingerprint(exprs.head)),
    fn("simhash60", "simhash60(text) - 60-bit md5-family SimHash", 1)(
      exprs => SimHash60(exprs.head)),
    fn("word_ngram_hashes", "word_ngram_hashes(text, n) - sorted distinct xxhash64 shingle hashes", 2)(
      exprs => WordNgramHashes(exprs.head, intArg(exprs(1), "n"))),
    fn("minhash_signature", "minhash_signature(hashes, k) - k-plane xxhash64 MinHash signature", 2)(
      exprs => MinHashSignature(exprs.head, intArg(exprs(1), "numHashes"))),
    fn("minhash_signature_md5", "minhash_signature_md5(text, n, k) - md5-family MinHash signature", 3)(
      exprs =>
        MinHashSignatureMd5(exprs.head, intArg(exprs(1), "n"), intArg(exprs(2), "numHashes"))),
    fn("dot_product", "dot_product(a, b) - double dot product of float/double arrays", 2)(
      exprs => DotProduct(exprs.head, exprs(1))),
    fn("word_ngrams", "word_ngrams(text, n) - raw word n-gram occurrences (duplicates kept)", 2)(
      exprs => WordNgrams(exprs.head, intArg(exprs(1), "n"))),
    fn("word_ngram_pos_hashes", "word_ngram_pos_hashes(text, n) - positional xxhash64 shingle hashes (index = token position)", 2)(
      exprs => WordNgramPosHashes(exprs.head, intArg(exprs(1), "n"))),
    fn("outer_product", "outer_product(vec, d, quant) - exact quantized second-moment sums [n, sums, upper-triangle products]", 3)(
      exprs =>
        OuterProductAggregate(
          exprs.head, intArg(exprs(1), "dims"), doubleArg(exprs(2), "quant"))),
    fn("bloom_ngram_positions", "bloom_ngram_positions(text, n, m, k, md5) - bloom probe positions of distinct word n-grams", 5)(
      exprs =>
        BloomNgramPositions(
          exprs.head, intArg(exprs(1), "n"), intArg(exprs(2), "mBits"),
          intArg(exprs(3), "kHashes"), boolArg(exprs(4), "md5Family"))),
    fn("topk_counted", "topk_counted(cnt, value, k) - k best (cnt desc, value asc) counted strings", 3)(
      exprs => TopKCountedAggregate(exprs.head, exprs(1), intArg(exprs(2), "k"))),
    fn("bitmap_or", "bitmap_or(positions, m) - OR-fold bit positions into one m-bit bitmap", 2)(
      exprs => BitmapOrAggregate(exprs.head, intArg(exprs(1), "mBits"))),
    fn("image_header", "image_header(bytes) - PNG/JPEG container metadata struct", 1)(
      exprs => ImageHeader(exprs.head)),
    fn("audio_header", "audio_header(bytes) - WAV/RIFF container metadata struct", 1)(
      exprs => AudioHeader(exprs.head)),
    fn("video_header", "video_header(bytes) - MP4/ISO-BMFF container metadata struct", 1)(
      exprs => VideoHeader(exprs.head)),
    fn("nfc_normalize", "nfc_normalize(text) - Unicode NFC canonical composition", 1)(
      exprs => NfcNormalize(exprs.head)),
    fn("y4m_sample",
      "y4m_sample(bytes, step) - YUV4MPEG2 (C444) frame sampling: " +
        "(width, height, n_frames, n_sampled, y_sum, y_peak)", 2)(
      exprs => Y4mSample(exprs.head, intArg(exprs(1), "step"))),
    fn("pcm_decode",
      "pcm_decode(bytes) - PCM WAV sample decode: (channels, bits, " +
        "n_frames, sum_c0, peak_c0, sum_c1, peak_c1)", 1)(
      exprs => PcmDecode(exprs.head)),
    fn("ppm_resize",
      "ppm_resize(bytes, w, h) - nearest-neighbor P6 resize (binary in, " +
        "binary out)", 3)(
      exprs => PpmResize(exprs.head, intArg(exprs(1), "w"), intArg(exprs(2), "h"))),
    fn("ppm_decode",
      "ppm_decode(bytes) - binary PPM (P6) pixel decode: (width, height, " +
        "n_px, sum_r, sum_g, sum_b, thumb_hex)", 1)(
      exprs => PpmDecode(exprs.head)),
    fn("png_encode",
      "png_encode(p6_bytes) - real PNG encode (the write path): binary " +
        "P6 in, spec-conformant 8-bit RGB PNG out", 1)(
      exprs => PngEncode(exprs.head)),
    fn("png_decode",
      "png_decode(bytes) - real PNG pixel decode (8-bit RGB/RGBA, " +
        "non-interlaced): (width, height, color_type, n_px, sum_r, sum_g, " +
        "sum_b, sum_a, thumb_hex)", 1)(
      exprs => PngDecode(exprs.head)),
    fnVar("bpe_encode",
      "bpe_encode(text, 'x y,xy z,...' [, ranked]) - real BPE segmentation " +
        "with an inline merge table (pairs space-separated, comma-joined): " +
        "(n_words, n_tokens, segmented). ranked=false (default) is the " +
        "oracle-replayable apply (each rule in learned order, each to " +
        "fixpoint — what the gates pin); ranked=true is the Sennrich " +
        "priority apply, the PRODUCTION path at 16k-64k merges (per-word " +
        "cost independent of table size; BpeSpec pins the two equal over " +
        "corpus-trained tables up to 32k merges)", 2, 3)(
      exprs => BpeEncode(
        exprs.head,
        strArg(exprs(1), "merges").split(',').toSeq
          .map(_.trim).filter(_.nonEmpty).map { p =>
            val parts = p.split(' ')
            require(parts.length == 2 && parts.forall(_.nonEmpty),
              s"bpe_encode merge '$p' must be 'left right'")
            (parts(0), parts(1))
          },
        ranked = exprs.lengthCompare(3) >= 0 && boolArg(exprs(2), "ranked"))),
    fn("platform_ln",
      "platform_ln(x) - natural log via the platform libm (oracle-parity " +
        "ln; Spark's log() is StrictMath)", 1)(
      exprs => PlatformLn(exprs.head)),
    fn("dict_scan",
      "dict_scan(text, 'comma,separated,terms') - Aho-Corasick multi-pattern " +
        "scan: (n_terms_present, n_hits, first_term)", 2)(
      exprs => DictScan(
        exprs.head,
        // trim: 'a, b' means terms "a" and "b" — whitespace around the
        // commas is list formatting, not part of the term (interior
        // whitespace, as in 'a a', IS significant). distinct:
        // n_terms_present counts DISTINCT terms — a duplicate in the
        // comma list would register two automaton ids for one string and
        // double-count every match
        strArg(exprs(1), "terms").split(',').toSeq
          .map(_.trim).filter(_.nonEmpty).distinct)),
    fn("filter_lines",
      "filter_lines(text, min_words, 'ban,words', require_terminal_punct) - " +
        "C4-style line filter: (n_lines, n_kept, clean_text)", 4)(
      exprs => FilterLines(
        exprs.head, intArg(exprs(1), "min_words"),
        strArg(exprs(2), "ban_words").split(',').toSeq.filter(_.nonEmpty),
        boolArg(exprs(3), "require_terminal_punct"))),
    fn("token_entropy",
      "token_entropy(text) - per-doc token-distribution Shannon entropy " +
        "struct (n_tokens, n_distinct, entropy) — one map-only pass", 1)(
      exprs => TokenEntropy(exprs.head)),
    fn("html_extract",
      "html_extract(html) - C4-style HTML boilerplate strip: drop " +
        "script/style/comment blocks, tags to spaces, entity decode, " +
        "whitespace collapse", 1)(
      exprs => HtmlExtract(exprs.head)),
    fn("url_parts",
      "url_parts(url) - URL parse + canonicalization struct (scheme, " +
        "host, port, path, query, reg_domain, n_params, url_norm); " +
        "null on non-URL input", 1)(
      exprs => UrlParts(exprs.head)),
    fn("wordpiece_encode",
      "wordpiece_encode(text, 'tok,##cont,...') - WordPiece greedy " +
        "longest-match segmentation (BERT apply): (n_words, n_tokens, " +
        "n_unk, segmented); whole-word [UNK] on miss", 2)(
      exprs => WordPieceEncode(
        exprs.head,
        strArg(exprs(1), "vocab").split(',').toSeq
          .map(_.trim).filter(_.nonEmpty).distinct)),
    fn("gif_encode",
      "gif_encode(p6_bytes) - real GIF encode (the write path): " +
        "palette-exact binary P6 in, from-scratch LZW GIF89a out; null " +
        "when a pixel is not a palette color", 1)(
      exprs => GifEncode(exprs.head)),
    fn("bmp_decode",
      "bmp_decode(bytes) - real BMP pixel decode (24-bit BI_RGB, " +
        "bottom-up or top-down): (width, height, n_px, sum_r, sum_g, " +
        "sum_b, thumb_hex)", 1)(
      exprs => BmpDecode(exprs.head)),
    fn("gif_decode",
      "gif_decode(bytes) - real GIF pixel decode (from-scratch LZW, " +
        "sequential + interlaced, first full frame): (width, height, " +
        "gct_size, n_px, sum_r, sum_g, sum_b, thumb_hex)", 1)(
      exprs => GifDecode(exprs.head)),
    fn("unigram_encode",
      "unigram_encode(text, 'piece:score,piece:score,...') - Unigram-LM " +
        "(SentencePiece) Viterbi segmentation over integer piece scores: " +
        "(n_words, n_tokens, n_unk, segmented); whole-word [UNK] when a " +
        "position is unreachable", 2)(
      exprs => UnigramEncode(
        exprs.head,
        strArg(exprs(1), "vocab").split(',').toSeq
          .map(_.trim).filter(_.nonEmpty).map { e =>
            val i = e.lastIndexOf(':')
            require(i > 0 && i < e.length - 1,
              s"unigram_encode vocab entry '$e' must be 'piece:score'")
            (e.substring(0, i), e.substring(i + 1).toLong)
          })),
    fn("winnow_fingerprint",
      "winnow_fingerprint(text, n, w) - MOSS winnowing fingerprints: " +
        "rightmost window minima over word n-gram md5-60 hashes: " +
        "(n_grams, n_fp, fp_stream, fp_hashes)", 3)(
      exprs => WinnowFingerprint(
        exprs.head, intArg(exprs(1), "n"), intArg(exprs(2), "w"))))

  /** Imperative registration on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
}
