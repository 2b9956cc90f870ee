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
}
