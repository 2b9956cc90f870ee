package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming text analytics — the incremental side of
  * [[TextAnalysis.topTerms]]: term frequencies over sliding event-time
  * windows of a document stream (trending vocabulary, boilerplate
  * emergence, drift monitoring while a crawl is ingesting).
  *
  * Spark-native shape: watermark + windowed count aggregation. State is
  * BOUNDED by the watermark horizon — per (window, term) partial counts
  * evict once the watermark passes the window end, so vocabulary growth
  * never accumulates past the horizon (the unbounded-global-top-k analog
  * would need a sketch; within-window exact counts are the honest
  * streaming contract). Top-k selection is a read-side query over the
  * emitted per-window counts (tiny relative to the stream).
  */
object StreamingText {

  /** Per-(window, term) exact counts over the document stream.
    * `eventTimeCol` must be a timestamp column; late data beyond
    * `watermark` is dropped, and closed windows emit finalized counts
    * (append mode).
    */
  def windowedTermCounts(
      docs: DataFrame,
      textCol: String,
      eventTimeCol: String,
      windowLen: String,
      slide: String,
      watermark: String): DataFrame =
    docs
      .withWatermark(eventTimeCol, watermark)
      .select(
        col(eventTimeCol),
        explode(filter(TextAnalysis.tokens(col(textCol)), t => length(t) > 0))
          .as("term"))
      .groupBy(window(col(eventTimeCol), windowLen, slide), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("term"),
        col("cnt"))

  /** Streaming sessionization — the incremental twin of the batch
    * lag-window sessionizer (q_sessionize): events within `gap` of each
    * other merge into one session per key, via Structured Streaming's
    * native `session_window` (dynamic-gap state merged incrementally;
    * closed sessions finalize once the watermark passes — no global sort,
    * no lag window). Emits one row per closed session (append mode).
    */
  def sessionize(
      events: DataFrame,
      keyCol: String,
      eventTimeCol: String,
      gap: String,
      watermark: String): DataFrame =
    events
      .withWatermark(eventTimeCol, watermark)
      .groupBy(session_window(col(eventTimeCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Windowed duplicate-rate telemetry: per event-time window, the
    * fraction of arriving documents whose normalized-content fingerprint
    * was already seen IN THAT WINDOW — the canary for a crawler loop or
    * an upstream replay storm (a sudden dup-rate spike is usually the
    * first visible symptom). Exact within the window: count vs
    * approx_count_distinct of the fused fingerprint (the distinct count
    * is sketch-based — mergeable, bounded state — so a window's state
    * never grows with its distinct-content volume; at a 1% error the
    * rate signal is unaffected). Watermarked append: closed windows emit
    * finalized rates.
    */
  def windowedDupRate(
      docs: DataFrame,
      textCol: String,
      eventTimeCol: String,
      windowLen: String,
      watermark: String): DataFrame =
    docs
      .withWatermark(eventTimeCol, watermark)
      .select(
        col(eventTimeCol),
        graft.functions.TextFingerprint(col(textCol)).as("__fp"))
      .groupBy(window(col(eventTimeCol), windowLen))
      .agg(
        count(lit(1)).as("n_docs"),
        approx_count_distinct(col("__fp"), 0.01).as("n_distinct"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_docs"),
        col("n_distinct"),
        // clamp at 0: an HLL overestimate on an all-distinct window would
        // otherwise emit a small NEGATIVE rate and trip alerting math
        greatest(
          lit(0.0),
          lit(1.0) - col("n_distinct").cast("double") / col("n_docs"))
          .as("dup_rate"))

  /** Streaming corpus hygiene — the ingest-side cleaning stage: every
    * arriving document is ANNOTATED with its quality score, predicted
    * language, and PII-redacted body (the same fused TextProfile /
    * [[TextAnalysis.piiRedact]] expressions as the batch operators, so
    * batch and stream can never disagree).
    *
    * Entirely STATELESS: codegen'd projections only — no state store, no
    * watermark, no output-mode constraint; it attaches to any readStream
    * and scales as a pure map. The stage annotates rather than filters:
    * a `.filter` on a derived column would be pushed back through the
    * projection by PushDownPredicates, re-inlining the profile expression
    * into the predicate (the q_pipeline_clean trap — in batch an
    * aggregation barrier stops it, but a barrier is exactly the state a
    * hygiene stage must not hold). Callers drop rows on the annotated
    * column at the sink side, where the profile is already a plain
    * materialized value.
    */
  /** A grouped document on the ingest stream — the shape
    * [[capPerGroupStream]] admits (group = the capped dimension: domain,
    * source, license bucket).
    */
  final case class GroupedDoc(group: String, doc_id: Long, text: String)

  /** Streaming per-group cap: admit at most `k` documents per group over
    * the life of the stream — the ingest-side domain cap (no single
    * site/source may contribute more than k docs), enforced BEFORE the
    * excess costs storage. State is ONE long per group (the admitted
    * count), bounded by group cardinality, never by rate.
    *
    * Admission is first-k by arrival (within a micro-batch, doc_id order
    * breaks ties deterministically); the batch twin
    * [[Splits.capPerGroup]] instead keeps a HASH-ordered k — an
    * arrival-order-free membership a stream cannot produce (it would
    * have to revoke an already-admitted doc when a hash-smaller one
    * arrives). Pipelines that need hash-membership run the batch cap
    * over the admitted set periodically; the streaming gate guarantees
    * the invariant every downstream consumer actually relies on: no
    * group ever exceeds k.
    */
  def capPerGroupStream(
      spark: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.Dataset[GroupedDoc],
      k: Int): org.apache.spark.sql.Dataset[GroupedDoc] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    require(k > 0, s"cap must be positive, got $k")
    docs
      .groupByKey(_.group)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[GroupedDoc],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = Vector.newBuilder[GroupedDoc]
          it.toArray.sortBy(_.doc_id).foreach { d =>
            if (n < k) { out += d; n += 1 }
          }
          state.update(n)
          out.result().iterator
      }
  }

  def hygiene(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("__p", graft.functions.TextProfile(col(textCol)))
      // nanvl: a zero-token / zero-char document's raw blend is NaN
      // (0/0); on the always-on ingest path that NaN would silently
      // poison sink-side filters and aggregates, so it clamps to 0.0 —
      // the lowest quality, which is what an empty document is
      .withColumn("quality", nanvl(TextAnalysis.qualityOf(col("__p")), lit(0.0)))
      .withColumn("lang_pred", TextAnalysis.langPredOf(col("__p")))
      .withColumn("redacted", TextAnalysis.piiRedact(col(textCol)))
      // token-distribution entropy (round-16 signal): fused map-only,
      // stateless like the rest of the annotation set; an empty document
      // is one empty token → entropy 0, no NaN to clamp
      .withColumn("entropy",
        graft.functions.TokenEntropy(col(textCol)).getField("entropy"))
      .drop("__p")
}
