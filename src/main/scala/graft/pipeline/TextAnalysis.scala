package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, built
  * entirely from codegen'd `org.apache.spark.sql.functions` (no UDFs — every
  * expression stays inside whole-stage codegen and scales linearly with no
  * shuffle; these are per-row map operators).
  *
  * Cross-engine float parity: ratios are derived from exact integer counts
  * with a single double division, so Spark and the DuckDB oracle produce
  * bit-identical doubles with no rounding step.
  */
object TextAnalysis {

  /** Whitespace tokenizer (the reference corpus is single-space separated;
    * `\s+` keeps parity with DuckDB's string_split_regex).
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = tokenCountOf(tokens(text))
  def tokenCountOf(toks: Column): Column = size(toks)

  /** BPE-ish token estimate: counts the pre-tokenizer pieces a byte-pair
    * encoder would start from — letter runs, digit runs, and individual
    * non-space symbols (the GPT-style pre-tokenization split, simplified
    * to ASCII classes so Java regex and DuckDB RE2 agree byte-for-byte).
    * A codegen'd `regexp_count`; ~1.3 pieces per whitespace token on
    * English text.
    */
  val BpePiecePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"

  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpePiecePattern)).cast("long")

  /** Stopword list used by quality scoring and language ID. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for", "with")

  def stopwordCount(text: Column): Column = stopwordCountOf(tokens(text))
  def stopwordCountOf(toks: Column): Column =
    size(filter(toks, t => t.isin(Stopwords: _*)))

  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    stopwordCountOf(t).cast("double") / tokenCountOf(t)
  }

  /** Mean token length: exact integer sum of lengths / token count. */
  def meanTokenLen(text: Column): Column = meanTokenLenOf(tokens(text))
  def meanTokenLenOf(toks: Column): Column =
    aggregate(transform(toks, t => length(t)), lit(0), (acc, x) => acc + x)
      .cast("double") / size(toks)

  private val PunctClass = "[\\.,;:!\\?'\"]"
  private val DigitClass = "[0-9]"

  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, PunctClass, "")))
      .cast("double") / length(text)

  def digitRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, DigitClass, "")))
      .cast("double") / length(text)

  /** Composite quality score in [0,1]-ish: favors mid-length documents with
    * low punctuation/digit noise and a natural stopword fraction. A linear
    * blend of exact ratios — deterministic across engines.
    */
  def qualityScore(text: Column): Column = {
    val lenTerm = least(tokenCount(text).cast("double") / lit(100.0), lit(1.0))
    lenTerm * lit(0.4) +
      (lit(1.0) - punctRatio(text)) * lit(0.2) +
      (lit(1.0) - digitRatio(text)) * lit(0.2) +
      least(stopwordRatio(text) * lit(4.0), lit(1.0)) * lit(0.2)
  }

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Scores = marker hits per language; argmax wins, ties broken
    * by language code order.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScore(text: Column, lang: String): Column = langScoreOf(tokens(text), lang)
  def langScoreOf(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(LangMarkers(lang): _*)))

  /** Predicted language: the marker set with the most hits (ties → first in
    * sorted code order); no hits at all → "und" (undetermined).
    */
  def langId(text: Column): Column = langIdOf(tokens(text))
  def langIdOf(toks: Column): Column = {
    val langs = LangMarkers.keys.toSeq.sorted
    val best = langs.map(l => struct(langScoreOf(toks, l).as("s"), lit(l).as("l")))
    // array_max on (score, lang) structs picks highest score; on score ties
    // it would pick the LAST lang alphabetically, so order langs descending
    // and negate... simpler: fold with explicit comparison keeping first win.
    val folded = best.reduceLeft { (a, b) =>
      when(b.getField("s") > a.getField("s"), b).otherwise(a)
    }
    when(folded.getField("s") > 0, folded.getField("l")).otherwise(lit("und"))
  }

  /** Document fingerprint: md5 of the normalized text (lowercase, punct
    * stripped, whitespace collapsed) — stable under formatting noise.
    * Fused single-pass native expression; bit-identical to
    * [[fingerprintCompositional]] (parity asserted in TextAnalysisSpec) but
    * without the two full-text regex NFA passes per row.
    */
  def fingerprint(text: Column): Column = graft.functions.TextFingerprint(text)

  /** The compositional built-in-functions form of [[fingerprint]] — the
    * parity witness (and the shape the DuckDB oracle runs verbatim).
    */
  def fingerprintCompositional(text: Column): Column =
    md5(regexp_replace(trim(regexp_replace(lower(text), PunctClass, "")), "\\s+", " "))

  // ---- whole-table forms -----------------------------------------------
  // All counts come from ONE fused native expression
  // (graft.functions.TextProfile): the compositional column form
  // re-tokenizes per consumer (Catalyst inlines the split into every
  // interpreted higher-order lambda — ~6 tokenizations/row measured), the
  // explode-relational form pays generator-input re-evaluation per OUTPUT
  // row. The fused scan emits exact integers, so every derived ratio stays
  // bit-identical to the compositional form AND the DuckDB oracle
  // (parity asserted in TextAnalysisSpec).

  /** Per-document stats table: (id, n_tokens, n_stopwords, mean_token_len,
    * punct_ratio, digit_ratio, quality).
    */
  def docStats(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    df.select(
        c(idCol),
        graft.functions.TextProfile(c(textCol)).as("__p"),
        bpeTokenCount(c(textCol)).as("n_bpe_tokens"))
      .select(
        c(idCol),
        c("__p.n_tokens").as("n_tokens"),
        c("n_bpe_tokens"),
        c("__p.n_stopwords").as("n_stopwords"),
        (c("__p.sum_token_len").cast("double") / c("__p.n_tokens")).as("mean_token_len"),
        (c("__p.n_punct").cast("double") / c("__p.n_chars")).as("punct_ratio"),
        (c("__p.n_digit").cast("double") / c("__p.n_chars")).as("digit_ratio"),
        c("__p"))
      .select(
        c(idCol), c("n_tokens"), c("n_bpe_tokens"), c("n_stopwords"),
        c("mean_token_len"), c("punct_ratio"), c("digit_ratio"),
        (least(c("n_tokens").cast("double") / lit(100.0), lit(1.0)) * lit(0.4) +
          (lit(1.0) - c("punct_ratio")) * lit(0.2) +
          (lit(1.0) - c("digit_ratio")) * lit(0.2) +
          least((c("n_stopwords").cast("double") / c("n_tokens")) * lit(4.0), lit(1.0)) * lit(0.2))
          .as("quality"))
  }

  /** Per-document language prediction: argmax over marker counts; ties →
    * first language in sorted code order, no hits → "und".
    */
  def docLangId(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    val langs = graft.functions.TextProfile.Langs
    val withP = df.select(c(idCol), graft.functions.TextProfile(c(textCol)).as("__p"))
    val best = langs
      .map(l => struct(c("__p").getField(l).as("s"), lit(l).as("l")))
      .reduceLeft((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    withP.select(
      c(idCol),
      when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
        .as("lang_pred"))
  }

  /** Per-document repetition stats — the Gopher/C4-style repetitiveness
    * quality signals (Rae et al. 2021 §A1.1, simplified to occurrence
    * fractions so both engines share exact integer arithmetic):
    *
    *   - `top_ngram_frac`: occurrences of the most frequent word n-gram /
    *     total n-gram occurrences (boilerplate/chant detector);
    *   - `dup_ngram_frac`: occurrences belonging to n-grams seen >= 2x /
    *     total (overall repetitiveness).
    *
    * Two map-side-combined aggregations — (doc, gram) then (doc) — no
    * joins, no windows; documents shorter than n tokens have no n-grams
    * and are absent (the same no-signature contract as MinHash).
    */
  def repetitionStats(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2): org.apache.spark.sql.DataFrame = {
    // RAW n-gram occurrences — Dedup.wordShingles dedups (set semantics
    // for Jaccard); repetition is precisely about the duplicates it drops
    val toks = tokens(col(textCol))
    val grams = when(
      size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol), explode(grams).as("__g"))
      .groupBy(col(idCol), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(
        sum("__c").as("__t"),
        max("__c").as("__mx"),
        coalesce(sum(when(col("__c") >= 2, col("__c"))), lit(0L)).as("__d"))
      .select(
        col(idCol),
        (col("__mx").cast("double") / col("__t")).as("top_ngram_frac"),
        (col("__d").cast("double") / col("__t")).as("dup_ngram_frac"))
  }

  /** Global top-k vocabulary terms (heavy hitters — vocabulary building,
    * boilerplate detection). `orderBy.limit` compiles to
    * TakeOrderedAndProject: each partition keeps only its local top-k
    * before the single merge, so no global sort and no full-vocabulary
    * shuffle to one node; upstream, the term count is a map-side-combined
    * hash aggregate. Deterministic total order: (count desc, term asc).
    */
  def topTerms(df: org.apache.spark.sql.DataFrame, textCol: String, k: Int): org.apache.spark.sql.DataFrame =
    df.select(explode(filter(tokens(col(textCol)), t => length(t) > 0)).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(k)
}
