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

  // Stopword / token-length counters live ONLY as fused TextProfile
  // struct fields (`n_stopwords`, `sum_token_len`, `n_tokens`): the
  // higher-order-lambda column twins (`size(filter(toks, isin))`,
  // `aggregate(transform(toks, length))`) are CodegenFallback —
  // interpreted, re-tokenizing per consumer, measured 13× slower at
  // sf1 — and were deleted so they can't be composed into a hot path.
  // TextAnalysisSpec keeps the compositional forms inline as the
  // parity witnesses.

  private val PunctClass = "[\\.,;:!\\?'\"]"
  private val DigitClass = "[0-9]"

  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, PunctClass, "")))
      .cast("double") / length(text)

  def digitRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, DigitClass, "")))
      .cast("double") / length(text)

  // The composite quality score exists ONLY as [[qualityOf]] over a
  // fused TextProfile struct — the compositional text-column twin
  // (which would re-run the interpreted stopword lambda per term) was
  // deleted with the lambda counters above.

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

  // Language-ID lives ONLY as [[langPredOf]] over a fused TextProfile
  // struct (per-language marker counts are struct fields): the lambda
  // column twin (one interpreted `filter(toks, isin)` PER LANGUAGE —
  // five extra tokenizations/row) was deleted with the counters above;
  // TextAnalysisSpec keeps the compositional argmax inline as the
  // parity witness.

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

  /** THE quality blend over a fused `TextProfile` struct column — the one
    * definition docStats, the pipeline-clean gate, and streaming hygiene
    * all share (the DuckDB oracles restate it in SQL), so batch and
    * stream cannot drift apart by hand-edited copies. NaN on
    * zero-token / zero-char documents by construction (0/0 double
    * division — the oracle-parity behavior); always-on ingest surfaces
    * clamp it with `nanvl(..., 0.0)`.
    */
  def qualityOf(p: Column): Column =
    least(p.getField("n_tokens").cast("double") / lit(100.0), lit(1.0)) * lit(0.4) +
      (lit(1.0) - p.getField("n_punct").cast("double") / p.getField("n_chars")) * lit(0.2) +
      (lit(1.0) - p.getField("n_digit").cast("double") / p.getField("n_chars")) * lit(0.2) +
      least((p.getField("n_stopwords").cast("double") / p.getField("n_tokens")) * lit(4.0),
        lit(1.0)) * lit(0.2)

  /** THE language argmax over a fused `TextProfile` struct column (ties →
    * first language in sorted code order, no hits → "und") — shared by
    * docLangId, the pipeline-clean gate, and streaming hygiene.
    */
  def langPredOf(p: Column): Column = {
    val best = graft.functions.TextProfile.Langs
      .map(l => struct(p.getField(l).as("s"), lit(l).as("l")))
      .reduceLeft((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }

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
        qualityOf(c("__p")).as("quality"))
  }

  /** Per-document language prediction: argmax over marker counts; ties →
    * first language in sorted code order, no hits → "und".
    */
  def docLangId(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    df.select(c(idCol), graft.functions.TextProfile(c(textCol)).as("__p"))
      .select(c(idCol), langPredOf(c("__p")).as("lang_pred"))
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
    // for Jaccard); repetition is precisely about the duplicates it drops.
    // Fused native WordNgrams: the compositional transform/slice chain is
    // interpreted and cost ~0.4 ms/doc (measured 3.8 s -> ~1 s at sf0.1);
    // parity with that chain is asserted in TextAnalysisSpec.
    df.select(col(idCol), explode(graft.functions.WordNgrams(col(textCol), n)).as("__g"))
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
    // explode streams through a codegen'd length filter (a higher-order
    // filter() inside the array is CodegenFallback — the BM25 lesson:
    // interpreted lambdas cost more than the whole rest of the operator)
    df.select(explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(k)

  /** Top-k vocabulary terms PER GROUP (per source / language / domain —
    * the corpus-card building block). Term counts fold with map-side
    * combine; the per-group ranking is the k-bounded
    * [[graft.functions.TopKCountedAggregate]] — each partition ships at
    * most k entries per group, instead of a `row_number` window sorting
    * the full (group × vocabulary) count table. Output: (groupCol, rank,
    * term, cnt), rank 1-based on (cnt DESC, term ASC) — exact integers,
    * deterministic on any engine.
    */
  def topTermsByGroup(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String,
      textCol: String,
      k: Int): org.apache.spark.sql.DataFrame =
    df.select(col(groupCol), explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(groupCol))
      .agg(graft.functions.TopKCountedAggregate
        .topKCounted(col("cnt"), col("term"), k).as("__top"))
      .select(col(groupCol), posexplode(col("__top")).as(Seq("__i", "__t")))
      .select(
        col(groupCol),
        (col("__i") + 1).cast("int").as("rank"),
        col("__t.value").as("term"),
        col("__t.cnt").as("cnt"))

  /** Per-group corpus card — the dataset-documentation summary a mixture
    * designer reads before setting weights: document count, token and
    * character mass, mean document length, and the dominant language
    * (mode by doc count, ties to the lexically-smallest code — the
    * [[graft.functions.TopKCountedAggregate]] with k = 1, so the mode
    * never window-sorts). Everything is exact integers plus one double
    * division; token counts use the codegen'd leading-empty-aware
    * arithmetic (the BM25 dl convention).
    *
    * Shape: one map-only projection, one map-side-combined agg per
    * group, one tiny (group × lang) agg — two corpus-free shuffles of
    * group-cardinality rows.
    */
  def corpusCard(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String,
      textCol: String,
      langCol: String): org.apache.spark.sql.DataFrame = {
    val toks = tokens(col(textCol))
    val nToks = size(toks).cast("long") -
      when(element_at(toks, 1) === "", lit(1L)).otherwise(lit(0L))
    val per = df.select(
      col(groupCol),
      col(langCol),
      nToks.as("__t"),
      length(col(textCol)).cast("long").as("__c"))
    val base = per.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(col("__t")).as("n_tokens"),
      sum(col("__c")).as("n_chars"),
      (sum(col("__t")).cast("double") / count(lit(1))).as("mean_doc_tokens"))
    val langTop = per
      .groupBy(col(groupCol), col(langCol))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col(groupCol))
      .agg(graft.functions.TopKCountedAggregate
        .topKCounted(col("__cnt"), col(langCol), 1).as("__top"))
      .select(
        col(groupCol),
        col("__top").getItem(0).getField("value").as("top_lang"),
        col("__top").getItem(0).getField("cnt").as("top_lang_docs"))
    base.join(langTop, groupCol)
  }

  // ---- PII scan / redaction --------------------------------------------
  // Regex-based PII hygiene for training corpora. Patterns are kept to the
  // common syntax subset of java.util.regex (Spark) and RE2 (DuckDB
  // oracle): ASCII classes, bounded repeats, non-capturing groups, \b —
  // no backrefs or lookaround (RE2 has neither). Each scan/redact step is
  // a codegen'd regexp function: map-only, no shuffle, and the corpus
  // pays one NFA pass per pattern.

  /** RFC-casual email addresses. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (no range check — scrubbing favors recall). */
  val Ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** International phone numbers in +E.164-ish form. */
  val PhonePattern = "\\+[0-9]{7,15}"

  /** Long digit runs (account / national-id style identifiers). */
  val IdNumberPattern = "\\b[0-9]{6,}\\b"

  private def countMatches(text: Column, pattern: String): Column =
    // regexp_count, not size(regexp_extract_all(…)): counting must not
    // materialize an array of every matched substring per document
    regexp_count(text, lit(pattern)).cast("long")

  def emailCount(text: Column): Column = countMatches(text, EmailPattern)
  def ipv4Count(text: Column): Column = countMatches(text, Ipv4Pattern)
  def phoneCount(text: Column): Column = countMatches(text, PhonePattern)
  def idNumberCount(text: Column): Column = countMatches(text, IdNumberPattern)

  /** Redacted text: PII spans replaced by typed placeholder tokens.
    * Replacement order matters — emails first (they contain digits and
    * dots that the narrower patterns would shred), then IPv4 (dotted
    * digits would otherwise match the bare-number rule), then phones,
    * then bare long digit runs.
    */
  def piiRedact(text: Column): Column = {
    val e = regexp_replace(text, EmailPattern, "[EMAIL]")
    val i = regexp_replace(e, Ipv4Pattern, "[IP]")
    val p = regexp_replace(i, PhonePattern, "[PHONE]")
    regexp_replace(p, IdNumberPattern, "[ID]")
  }

  /** Per-document PII scan: match counts per category (counted
    * independently on the RAW text — a phone number inside a larger digit
    * run can count in two categories) plus the redacted body.
    *
    * Fused (r19 optimization): ONE [[graft.functions.PiiScanFused]]
    * expression replaces 4 `regexp_count` + 4 chained `regexp_replace`
    * NFA passes (8 full-text regex walks per row — 2.6 s of q_pii_scan's
    * 2.7 s at sf0.1). The hand-rolled scanners are pinned against
    * `java.util.regex` itself in PiiScanFusedSpec; the relational
    * regex forms above remain the reference semantics.
    */
  def piiScan(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    df.select(
        col(idCol),
        graft.functions.PiiScanFused(col(textCol)).as("__pii"))
      .select(
        col(idCol),
        col("__pii.n_emails").as("n_emails"),
        col("__pii.n_ipv4").as("n_ipv4"),
        col("__pii.n_phones").as("n_phones"),
        col("__pii.n_idnums").as("n_idnums"),
        col("__pii.redacted").as("redacted"))

  /** Rare-word statistics — the exact-arithmetic stand-in for a unigram
    * perplexity filter: a document dominated by corpus-rare tokens is
    * high-surprisal (OOV noise, mojibake, boilerplate IDs). Per document:
    * n_rare = token occurrences whose CORPUS document frequency is below
    * `minDf`, and rare_ratio = n_rare / n_tokens. All integers plus one
    * double division, so the DuckDB oracle reproduces the scores
    * bit-for-bit — a true log-probability score would hinge on
    * float-summation order across engines.
    *
    * Shape at 100 TB: one map-side-combined vocabulary count (term,
    * df), then the exploded corpus joins it on the term — a shuffle
    * equi-join on the token (AQE broadcasts the vocab when it fits) —
    * and re-aggregates per document. Two corpus scans, no sort.
    */
  def rareWordStats(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      minDf: Long): org.apache.spark.sql.DataFrame = {
    val toks = df.select(
        col(idCol),
        explode(tokens(col(textCol))).as("__t"))
      .filter(length(col("__t")) > 0) // codegen'd, not a filter() lambda
    // ONE tokenize pass (r20, guide §2.4): fold to (doc, term, tf) first;
    // document frequency — distinct docs per term, not raw occurrences —
    // is then a COUNT WINDOW over the term key (tf has exactly one row
    // per (doc, term)). The r19 shape tokenized the corpus twice (once
    // into the distinct→vocab aggregate, once into the occurrence side of
    // the join) and paid a vocabulary join; per-doc totals recover from
    // Σtf, and rare occurrences from Σ(tf | df < minDf).
    val tf = toks.groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__tf"))
    tf
      .withColumn("__df",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("__t")))
      .groupBy(col(idCol))
      .agg(
        sum(col("__tf")).as("n_tokens"),
        sum(when(col("__df") < minDf, col("__tf")).otherwise(0L)).as("n_rare"))
      .select(
        col(idCol),
        col("n_tokens"),
        col("n_rare"),
        (col("n_rare").cast("double") / col("n_tokens")).as("rare_ratio"))
  }

  /** Per-document top-`k` characteristic terms under an exact-integer
    * tf/df score: `score_q = (tf · quant) div df` — tf weighted by
    * inverse document frequency on a fixed integer grid, so ranking is
    * bit-reproducible in any engine (a float `tf·ln(N/df)` would hang
    * the gate on `ln` ULPs; within a fixed df the ordering is identical,
    * across dfs 1/df is the same monotone "rarer is more specific"
    * signal). Ties break on the term itself.
    *
    * Shape at scale: tf folds map-side to one row per (doc, term); the
    * vocabulary frame derives FROM tf (already distinct per doc — no
    * second corpus scan, the rareWordStats economy), crosses back in one
    * vocabulary-keyed join, and the per-doc top-k window sorts doc-sized
    * groups only (bounded by document length, never corpus-sized — the
    * skew caveat that applies to domain-keyed windows doesn't arise).
    */
  def tfidfTopTerms(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      quant: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    val toks = df.select(
        col(idCol),
        explode(tokens(col(textCol))).as("__t"))
      .filter(length(col("__t")) > 0)
    // tf PINNED (r20, guide §1.2 step 1): the vocabulary derives from tf
    // AND the join probes tf, so the unpinned plan computed the whole
    // tokenize+explode+aggregate subtree twice (two parquet scans visible
    // in plans/r20/q_tfidf_before.txt). Eager: under AQE the vocab-agg
    // stage and the probe stage are independent leaves submitted
    // concurrently — a lazy cache would be raced (Dedup.pin's note). The
    // broadcast join + WindowGroupLimit top-k shape is kept verbatim (a
    // window-count df was measured WORSE: it trades the broadcast for a
    // full tf shuffle and sort by term).
    val tf = graft.pipeline.Dedup.pinIntermediate(
      toks.groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("tf")),
      eager = true)
    val vocab = tf.groupBy("__t").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol)
      .orderBy(col("score_q").desc, col("__t"))
    tf.join(vocab, "__t")
      .withColumn("score_q", expr(s"tf * $quant div df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col(idCol), col("rank"), col("__t").as("term"),
        col("tf"), col("df"), col("score_q"))
  }

  // ---- adaptive quality cuts -------------------------------------------

  /** Keep rows whose integer `metricCol` is at or above the corpus MEAN.
    * The threshold is one map-side-combined aggregate broadcast back as a
    * scalar — at 100 TB this is a second corpus scan, never a sort. The
    * mean of a LONG metric is exact and order-independent (integer sum,
    * one double division), so the DuckDB oracle reproduces the cut
    * bit-for-bit — unlike a mean over doubles, whose partial-sum order
    * would differ between engines (and between runs of Spark itself).
    */
  def cutByMeanOf(df: org.apache.spark.sql.DataFrame, metricCol: String): org.apache.spark.sql.DataFrame = {
    val thr = df.agg(
      (sum(col(metricCol)).cast("double") / count(lit(1))).as("__thr"))
    df.crossJoin(broadcast(thr))
      .filter(col(metricCol).cast("double") >= col("__thr"))
      .drop("__thr")
  }

  // ---- corpus-LM familiarity scoring -----------------------------------

  /** Bigram language-model familiarity score — the n-gram-LM stand-in
    * for a perplexity quality filter (KenLM-style filtering, done with
    * the corpus itself as the model): per document, the average corpus
    * MLE conditional probability of its bigrams,
    *
    *   lm_score(d) = (1/|bigrams(d)|) · Σ_(w1,w2)∈d  c2(w1 w2) / c1(w1)
    *
    * where c2 = corpus bigram occurrence count and c1(w1) = Σ_w2 c2 —
    * occurrences of w1 as a bigram START, so every conditional is a true
    * probability (Σ_w2 p(w2|w1) = 1). Boilerplate and templated text
    * (frequent continuations) score high; mojibake, OOV noise, and
    * shuffled text score low.
    *
    * The probability form averages PROBABILITIES: every p is one exact
    * long/long double division, quantized to 1e-12 longs and summed as
    * integers — bit-identical on any engine (q_lm_score). `logForm =
    * true` is the textbook cross-entropy form (avg ln p; perplexity =
    * exp(−score)), ALSO hash-gated (q_lm_xent): the ln is the platform
    * libm ([[graft.functions.PlatformLn]] — matches the oracle engine's
    * correctly-rounded ln on 99.94% of inputs, 1 ulp otherwise) and the
    * quantum is coarsened to 1e-9 so the residual 1-ulp disagreements
    * cannot flip a quantization boundary in practice (~2e-9 odds per
    * term).
    *
    * Shape at 100 TB: both count tables fold with map-side combine
    * (bigram count from the exploded grams; the unigram-start count
    * folds from the BIGRAM table — vocabulary-sized input, not
    * corpus-sized). c2 ⋈ c1 happens FIRST, at vocabulary size, so the
    * corpus occurrences cross exactly ONE shuffle join — r10's form
    * joined the occurrence stream twice (once per count table), and
    * collapsing that measured 21.4 → 6.3 s at sf10, 78.5 → 19.5 s at
    * sf100 (ROUND_NOTES r11).
    *
    * For a real-web Zipfian vocabulary the remaining join's head gram
    * can be percents of all occurrences — a straggler partition no
    * partition count fixes — so `hotK > 0` SALTS the hotK most
    * frequent grams: the corpus side spreads them over `saltFanout`
    * sub-keys by doc-id hash and the (tiny) LM side replicates those
    * rows per salt, the same hot-key-cut idea as Dedup's hot-shingle
    * broadcast. The salt changes only row routing, never values, so
    * the quantized integer sums (and the q_lm_score hash gate) are
    * unchanged either way. It is OFF by default because it costs two
    * broadcast tag-joins up front (measured +60% on THIS testdata,
    * whose synthetic vocabulary is near-uniform — head gram 0.2% of
    * occurrences, nothing to cut); turn it on when the corpus is
    * Zipf-headed. Two corpus scans, no sort, no window.
    */
  def lmFamiliarity(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      logForm: Boolean = false,
      hotK: Int = 0,
      saltFanout: Int = 32): org.apache.spark.sql.DataFrame = {
    // ONE corpus explode (r20, guide §1.2 step 1): fold the occurrence
    // stream to (doc, gram, tf) first and PIN it — the LM's corpus counts
    // AND the scoring join both read this frame, and unpinned the full
    // tokenize+explode ran twice (the q_tfidf economy). Eager: the c2
    // branch and the scoring join are independent AQE leaves (pin's race
    // note). Exactness is unchanged — c2 = Σtf per gram, per-doc
    // n_bigrams = Σtf, and the quantized contribution of a gram's tf
    // occurrences is floor(p·quant+0.5)·tf, the same long arithmetic as
    // summing tf identical per-occurrence terms.
    val grams = graft.pipeline.Dedup.pinIntermediate(
      df.select(
          col(idCol),
          explode(graft.functions.WordNgrams(col(textCol), 2)).as("__g"))
        .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__tf")),
      eager = true)
    val c2 = grams.groupBy("__g").agg(sum(col("__tf")).as("__c2"))
    val c1 = c2
      .groupBy(split(col("__g"), " ").getItem(0).as("__w1"))
      .agg(sum(col("__c2")).as("__c1"))
    // vocabulary-sized LM table: (gram, c2, c1) — the only join the
    // corpus-sized occurrence stream ever meets
    val lm = c2
      .withColumn("__w1", split(col("__g"), " ").getItem(0))
      .join(c1, "__w1")
      .select(col("__g"), col("__c2"), col("__c1"))
    val p = col("__c2").cast("double") / col("__c1").cast("double")
    // the log form uses the platform libm (PlatformLn) and a 1e-9
    // quantum — together they make avg-ln-p hash-gateable against the
    // oracle engine (q_lm_xent); the probability form keeps the finer
    // 1e-12 quantum (exact divisions, no ulp risk)
    val contrib = if (logForm) graft.functions.PlatformLn(p) else p
    val quant = if (logForm) 1000000000.0 else 1000000000000.0
    val occs =
      if (hotK <= 0 || saltFanout <= 1) grams.join(lm, "__g")
      else {
        // deterministic hot set: top-hotK grams by count, gram tie-break
        val hot = broadcast(
          lm.orderBy(col("__c2").desc, col("__g")).limit(hotK)
            .select(col("__g"), lit(true).as("__is_hot")))
        val lmSalted = lm
          .join(hot, Seq("__g"), "left")
          .withColumn("__salt",
            explode(when(col("__is_hot"), sequence(lit(0), lit(saltFanout - 1), lit(1)))
              .otherwise(sequence(lit(0), lit(0), lit(1)))))
          .drop("__is_hot")
        val gramsSalted = grams
          .join(hot, Seq("__g"), "left")
          .withColumn("__salt",
            when(col("__is_hot"), pmod(xxhash64(col(idCol)), lit(saltFanout.toLong)).cast("int"))
              .otherwise(lit(0)))
          .drop("__is_hot")
        gramsSalted.join(lmSalted, Seq("__g", "__salt"))
      }
    occs
      .groupBy(col(idCol))
      .agg(
        sum(col("__tf")).as("n_bigrams"),
        sum(floor(contrib * lit(quant) + lit(0.5)).cast("long") * col("__tf"))
          .as("__sq"))
      .select(
        col(idCol),
        col("n_bigrams"),
        ((col("__sq").cast("double") / col("n_bigrams")) / lit(quant))
          .as("lm_score"))
  }

  // ---- lexical relevance ranking (BM25) --------------------------------

  /** BM25 top-k document retrieval for a bag-of-words query — the
    * classic lexical ranking function (Robertson & Spärck Jones; the
    * Okapi form), used in data pipelines to surface the documents most
    * relevant to a probe query (e.g. pulling topical training slices, or
    * auditing what a corpus "knows" about a benchmark subject).
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    *
    * `idfLog = false` (the gate form) uses the RATIONAL idf
    * (N−df+0.5)/(df+0.5) — every operation is a single IEEE add/div that
    * DuckDB reproduces bit-for-bit; `idfLog = true` is the textbook
    * ln(1 + rational) production form (monotone in the rational idf, so
    * rankings agree when all df are equal), ALSO hash-gated
    * (q_bm25_log): the ln is the platform libm
    * ([[graft.functions.PlatformLn]]) and the 1e-9 contribution quantum
    * absorbs its residual 1-ulp disagreements with the oracle engine
    * (~2e-9 flip odds per term).
    * Per-term contributions are quantized to 1e-9 longs and summed as
    * integers, so the document score is independent of Spark's partial
    * aggregation order AND identical to the oracle's (summing raw
    * doubles would be order-dependent in both engines).
    *
    * Defaults k1=1.25, b=0.75 are BINARY-EXACT doubles, so the constant
    * folding (k1+1 = 2.25, 1−b = 0.25) is exact in both engines;
    * arbitrary parameters work but the oracle must then inline the same
    * bits.
    *
    * Shape at 100 TB: document lengths are a map-only projection (no
    * explode); only tokens MATCHING the query survive the explode
    * (filter(toks, isin) before the explode — the per-doc shuffle volume
    * is bounded by |query| rows per document, not the corpus token
    * count); term document-frequencies fold from the tf frame
    * (|docs|·|query| rows); the scalar stats (N, avgdl) broadcast. One
    * corpus scan for dl + one for tf; the final top-k is
    * TakeOrderedAndProject, never a global sort.
    */
  def bm25TopK(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      topK: Int,
      k1: Double = 1.25,
      b: Double = 0.75,
      idfLog: Boolean = false): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(topK >= 1, "topK must be >= 1")
    require(queryTerms.forall(_.nonEmpty), "query terms must be non-empty strings")
    val toks = tokens(col(textCol))
    // dl map-only (no explode): count of non-empty tokens per document,
    // as codegen'd arithmetic — NOT a higher-order filter() lambda,
    // which is CodegenFallback and costs ~0.4 ms/doc interpreted (the
    // WordNgrams lesson). Spark's trim strips only 0x20 spaces, so a
    // tab/newline-edged text keeps ONE leading "" token after split
    // (Java split drops trailing empties and interior \s+ runs collapse
    // — position 0 is the only place an empty can appear; the DedupSpec
    // tokenizer-edge cases pin this), and blank/empty text is [""]:
    // both cases reduce to "subtract 1 when the first token is empty"
    // dl PINNED (r20, guide §1.2 step 1): the corpus stats aggregate AND
    // the scoring join both read it — unpinned, the tokenize ran twice.
    // Eager: the two consumers are independent AQE leaves (Dedup.pin's
    // race note). Same economy for tf below (the dfreq fold + the probe
    // side): four full tokenize passes become two.
    val dl = graft.pipeline.Dedup.pinIntermediate(
      df.select(
        col(idCol),
        (size(toks).cast("long") -
          when(element_at(toks, 1) === "", lit(1L)).otherwise(lit(0L)))
          .as("__dl")),
      eager = true)
    val stats = dl.agg(
      count(lit(1)).as("__n"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))
    // explode streams through a codegen'd isin filter — rows never
    // materialize, and only query-matching tokens reach the shuffle, so
    // per-doc shuffle volume stays bounded by the query size (a
    // filter-inside-the-array lambda would bound the GENERATE too, but
    // runs interpreted — the lambda form measured 24.3 s vs 1.9 s for
    // this one end-to-end at sf1)
    val tf = graft.pipeline.Dedup.pinIntermediate(
      df
        .select(col(idCol), explode(toks).as("__t"))
        .filter(col("__t").isin(queryTerms.map(x => x: Any): _*))
        .groupBy(col(idCol), col("__t"))
        .agg(count(lit(1)).as("__tf")),
      eager = true)
    // document frequency folds from tf (one row per doc-term already)
    val dfreq = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
    val idfRational =
      (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))
    // platform libm (not StrictMath): oracle-parity ln, see PlatformLn
    val idf =
      if (idfLog) graft.functions.PlatformLn(idfRational + lit(1.0))
      else idfRational
    val contrib = idf *
      ((col("__tf") * lit(k1 + 1.0)) /
        (col("__tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl") / col("__avgdl"))))
    val scored = tf
      .join(broadcast(dfreq), "__t")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .select(
        col(idCol),
        floor(contrib * lit(1000000000.0) + lit(0.5)).cast("long").as("__q"))
      .groupBy(col(idCol))
      .agg(sum(col("__q")).as("__score_q"))
    // limit-after-sort plans as TakeOrderedAndProject (per-partition
    // top-k + driver merge of k·P rows). Rank is computed WITHOUT a
    // window: coalesce(1) + sortWithinPartitions pins the ≤k rows into
    // one ordered partition (TakeOrdered already emits one — the
    // coalesce is a guard, not a shuffle) where
    // monotonically_increasing_id numbers them 0..k-1 (partition 0 has
    // offset 0). An unpartitioned row_number window here was correct
    // and equally cheap, but its "No Partition Defined" WindowExec
    // warning — ~20 per verify run — would eventually mask a REAL
    // unpartitioned-window regression; this keeps the warning channel
    // clean (a corpus-sized unpartitioned window is a bug this codebase
    // bans).
    val top = scored
      .orderBy(col("__score_q").desc, col(idCol))
      .limit(topK)
    top
      .coalesce(1)
      .sortWithinPartitions(col("__score_q").desc, col(idCol))
      .withColumn("rank", (monotonically_increasing_id() + 1).cast("int"))
      .select(
        col("rank"),
        col(idCol),
        (col("__score_q").cast("double") / lit(1000000000.0)).as("score"))
  }

  /** Keep rows whose `metricCol` is at or above the corpus `q`-quantile —
    * the production form of an adaptive quality cut. Distributed EXACT
    * percentiles need a global sort, so this uses `approx_percentile`
    * (a mergeable t-digest-style sketch: map-side partials, driver-sized
    * merge) with `accuracy` trading memory for error. Not oracle-checked
    * (the sketch is engine-specific); the spec asserts the sandwich
    * property instead — the kept fraction brackets 1-q.
    */
  def cutByQuantileOf(
      df: org.apache.spark.sql.DataFrame,
      metricCol: String,
      q: Double,
      accuracy: Int = 10000): org.apache.spark.sql.DataFrame = {
    require(q > 0 && q < 1, "q must be in (0, 1)")
    val thr = df.agg(
      percentile_approx(col(metricCol), lit(q), lit(accuracy)).as("__thr"))
    df.crossJoin(broadcast(thr))
      .filter(col(metricCol) >= col("__thr"))
      .drop("__thr")
  }

  /** Per-group quantile cut: keep rows at or above their OWN group's
    * `q`-quantile of `metricCol` — "top (1−q) of each source", the
    * mixing-pipeline form of the adaptive cut (a global threshold lets a
    * strong source's tail crowd out a weak source's head). Thresholds
    * come from one `percentile_approx` per group — a MERGEABLE bounded
    * sketch, map-side combined, so the agg shuffle carries one sketch per
    * group per partition and no group ever funnels its raw rows through
    * one task (the [[graft.pipeline.Splits.capPerGroup]] threshold-join
    * shape: tiny agg + broadcast membership filter, the corpus itself
    * never shuffles). Like [[cutByQuantileOf]] the sketch is
    * engine-specific, so this is spec-gated (per-group sandwich property)
    * rather than hash-gated; the exact global form is
    * [[graft.pipeline.Splits.cutByQuantileExact]].
    */
  def cutByQuantileOfPerGroup(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String,
      metricCol: String,
      q: Double,
      accuracy: Int = 10000): org.apache.spark.sql.DataFrame = {
    require(q > 0 && q < 1, "q must be in (0, 1)")
    val thr = df.groupBy(col(groupCol))
      .agg(percentile_approx(col(metricCol), lit(q), lit(accuracy)).as("__thr"))
      .withColumnRenamed(groupCol, "__qgrp")
    df.join(broadcast(thr), col(groupCol) <=> col("__qgrp"))
      .filter(col(metricCol) >= col("__thr"))
      .select(df.columns.toIndexedSeq.map(col): _*)
  }
}
