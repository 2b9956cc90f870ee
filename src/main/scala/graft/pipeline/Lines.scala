package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-GLOBAL line-granularity dedup — the C4 "three-sentence" /
  * MassiveText repeated-line rules, across documents (reference scope:
  * the survey's training-pipeline extension; the per-document RULE filter
  * is [[graft.functions.FilterLines]] — this family is the cross-document
  * complement, where a line's fate depends on the whole corpus).
  *
  * Two policies over the same machinery:
  *
  *   - [[dedupLines]]: keep the corpus-wide FIRST occurrence of each
  *     substantial line (global order = (doc_id, line position)), drop
  *     every later copy. The C4 dedup semantic: one canonical copy
  *     survives.
  *   - [[boilerplateLines]]: drop EVERY copy of a line occurring more
  *     than `maxOccurrences` times corpus-wide (navigation chrome, cookie
  *     banners, licence footers — text whose frequency, not content,
  *     marks it as boilerplate). Occurrence count (not distinct-doc
  *     count) so a doc self-repeating its boilerplate counts too.
  *
  * Span granularity: both policies take a `sep` (default "\n" — LINE
  * granularity). Passing "\n\n" gives PARAGRAPH granularity (the
  * MassiveText repeated-paragraph rule; C4's spans are sentence-group
  * sized) — same machinery, same verdict aggregate, clean_text rejoined
  * with the same separator. The separator is treated as a LITERAL
  * (regex-quoted).
  *
  * "Substantial" lines (trimmed length >= `minChars`, default 1) are the
  * only dedup candidates: empty/whitespace lines are document STRUCTURE,
  * not content — deduping them corpus-wide would collapse every blank
  * separator in the corpus onto one document's. Non-substantial lines
  * pass through untouched under both policies.
  *
  * Output per document: (id, n_lines, n_kept, clean_text) — the
  * [[graft.functions.FilterLines]] shape, clean_text = kept lines joined
  * by '\n' in original order.
  *
  * Scale shape (100 TB honest):
  *   1. one posexplode of the corpus into (id, ord, line) — map-only;
  *   2. line verdicts from ONE map-side-combined aggregate keyed on
  *      md5(line) (first occurrence = min(struct(id, ord)); boilerplate =
  *      count). Partials are one row per distinct line per partition —
  *      the hot line (a corpus-wide footer) folds map-side, never
  *      buffering a posting list;
  *   3. verdicts join back on the hash — both sides co-partitioned by the
  *      same key from their shuffles; a hot line skews the probe-side
  *      partition but each probe row matches exactly one verdict row
  *      (O(1)/row, AQE skew-split handles the partition size);
  *   4. per-document rebuild: collect_list of kept (ord, line) structs
  *      grouped by id — buffer bounded by a DOCUMENT's size, the
  *      line-dedup analog of the packing rebuild.
  * No corpus-sized broadcast, no window over the corpus, no driver state.
  */
object Lines {

  /** Split a text column into (ord, line) pairs — Spark split keeps
    * trailing empties, matching DuckDB string_split (the FilterLines
    * parity convention).
    */
  private def explodedLines(
      df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame =
    df.select(
      col(idCol).as("__id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep), -1))
        .as(Seq("__ord", "__line")))

  private def substantial(minChars: Int): Column =
    length(trim(col("__line"))) >= minChars

  /** Rebuild (id, n_lines, n_kept, clean_text) from exploded lines with a
    * boolean `__keep` verdict column. collect_list skips nulls, so only
    * kept lines enter the per-doc buffer; struct sort orders by __ord
    * (first field) — within-doc original order, no window.
    */
  private def rebuild(
      lines: DataFrame, idCol: String, sep: String = "\n"): DataFrame =
    lines
      .groupBy(col("__id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("__keep"),
              struct(col("__ord"), col("__line"))))),
            s => s.getField("__line")),
          sep).as("clean_text"))
      .withColumnRenamed("__id", idCol)

  /** Corpus-global first-occurrence line dedup. A substantial line is
    * kept iff (id, ord) equals the corpus-wide minimum (id, ord) holding
    * that exact line content — deterministic under repartitioning (the
    * order key is data, not scan order), and append-stable in the
    * only way a global-first rule can be (a new doc never steals
    * first-ness from an existing lower id).
    */
  def dedupLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minChars: Int = 1,
      sep: String = "\n"): DataFrame = {
    val lines = explodedLines(df, idCol, textCol, sep)
    val firsts = lines
      .filter(substantial(minChars))
      .groupBy(md5(col("__line")).as("__h"))
      .agg(min(struct(col("__id"), col("__ord"))).as("__first"))
    // COLLISION CONVENTION: the verdict join equates lines by md5(line)
    // alone — a 128-bit collision would silently merge two distinct lines
    // (dropping a never-duplicated line, or boilerplate-dropping a rare
    // one). Unlike the hash-order samplers (where the hash IS the
    // definition), here md5 stands in for line equality; the convention is
    // shared with the gates' DuckDB oracles, and at ~2^-128 per pair it is
    // not a risk at any plausible corpus size — but it is a convention,
    // not a proof. The same applies to boilerplateLines' hot-set join.
    val verdict = lines
      .join(firsts, md5(col("__line")) === col("__h"), "left_outer")
      .withColumn(
        "__keep",
        !substantial(minChars) ||
          (col("__first.__id") === col("__id") && col("__first.__ord") === col("__ord")))
    rebuild(verdict, idCol, sep)
  }

  /** The hot-line set behind [[boilerplateLines]], as data: substantial
    * lines with more than `maxOccurrences` corpus-wide occurrences. Small
    * by construction (frequency over the threshold bounds cardinality by
    * corpus_lines / maxOccurrences) — collectable for the stream gate.
    */
  def hotLines(
      df: DataFrame,
      textCol: String,
      maxOccurrences: Long,
      minChars: Int = 1): DataFrame =
    df.select(posexplode(split(col(textCol), "\n", -1)).as(Seq("__ord", "__line")))
      .filter(substantial(minChars))
      .groupBy(col("__line").as("line"))
      .agg(count(lit(1)).as("occurrences"))
      .filter(col("occurrences") > maxOccurrences)

  /** Streaming boilerplate-line removal: the ingest-side twin of
    * [[boilerplateLines]] — each arriving document is cleaned against the
    * STANDING corpus's hot-line set (mined once by [[hotLines]],
    * refreshed on whatever cadence the index owner chooses). Stateless
    * and join-free: the hot set rides as a reference object inside ONE
    * fused [[graft.functions.DropLines]] expression (the decontaminate
    * pattern), so there is no state store and nothing grows with the
    * stream. Lines newly-hot WITHIN the stream are by design not caught
    * until the next index refresh — counting across a stream is the
    * stateful problem the batch operator owns; the corpus-global
    * first-occurrence dedup ([[dedupLines]]) stays batch-only for the
    * same reason (its verdict set is corpus-sized).
    *
    * Output: the input row plus (n_lines, n_kept, clean_text).
    */
  def boilerplateLinesStream(
      docs: DataFrame,
      hotLineSet: Seq[String],
      textCol: String,
      minChars: Int = 1): DataFrame =
    docs.withColumn("__c",
        graft.functions.DropLines(col(textCol), hotLineSet, minChars))
      .select(col("*"), col("__c.n_lines"), col("__c.n_kept"), col("__c.clean_text"))
      .drop("__c")

  /** Corpus-global boilerplate-line removal: every copy of a substantial
    * line with more than `maxOccurrences` total occurrences is dropped.
    */
  def boilerplateLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxOccurrences: Long,
      minChars: Int = 1,
      sep: String = "\n"): DataFrame = {
    require(maxOccurrences >= 1, s"maxOccurrences must be >= 1, got $maxOccurrences")
    val lines = explodedLines(df, idCol, textCol, sep)
    val hot = lines
      .filter(substantial(minChars))
      .groupBy(md5(col("__line")).as("__h"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxOccurrences)
      .select("__h")
    // the hot set is small by construction (lines over the threshold) —
    // broadcast anti-join semantics via a left join + null test keeps one
    // pass; AQE broadcasts it when it fits, shuffle-joins otherwise
    val verdict = lines
      .join(hot, md5(col("__line")) === col("__h"), "left_outer")
      .withColumn("__keep", !substantial(minChars) || col("__h").isNull)
    rebuild(verdict, idCol, sep)
  }
}
