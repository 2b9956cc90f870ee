package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement-frequency inference (SURVEY §2.5 W3) — the Spark-native form
  * of the reference's per-label streaming pass over result rows
  * (/root/reference/libnntsc/exporter.py:484-512 `_update_frequency_stats`,
  * 736-843 `_calc_frequency` / `_round_frequency`).
  *
  * Semantics preserved:
  *   - consecutive-row diffs of `timestamp` and of `binstart` per label,
  *     rows with a repeated timestamp skipped, capped at the first 200 diffs
  *   - 0 diffs → 300 (or 0 when binsize==0)
  *   - >90% of bin diffs == binsize → binsize
  *   - a timestamp-diff holding >=50% share → that diff (ties: highest
  *     count, then smallest diff — the reference picks dict-insertion order,
  *     which is not reproducible; documented deviation)
  *   - else smallest diff with >=20% share
  *   - else the mean diff snapped to a rounding ladder (10 s / 10 s steps /
  *     1 min / 5 min / 1 h). The reference's ladder uses Python-3 float
  *     division where Python-2 integer division was intended
  *     (exporter.py:832-843); we implement the intended integer rounding.
  */
object Frequency {

  /** Rounding ladder (exporter.py:826-843, intended integer semantics). */
  def roundFrequency(mean: Column): Column = {
    val m = floor(mean).cast("long") // int(mean) for non-negative means
    def snap(off: Int, step: Int): Column = floor((m + off) / step).cast("long") * step
    when(mean <= 10, lit(10L))
      .when(mean <= 60, snap(5, 10))
      .when(mean <= 300, snap(30, 60))
      .when(mean <= 3600, snap(150, 300))
      .otherwise(snap(1800, 3600))
      .cast("long")
  }

  /** Driver-side twin of [[infer]] for rows that are ALREADY streaming
    * through the driver (the serve path's chunked history iterator): the
    * reference computes frequency exactly this way, from the first rows of
    * each label as they stream (exporter.py:484-512). Semantics identical
    * to the distributed form — repeated timestamps skipped, first 200
    * diffs, the same decision tree — asserted against [[infer]] in
    * FrequencySpec. Feeding it more than ~201 rows is wasted work; callers
    * cap the prefix.
    *
    * Saves the serve path a second full scan+aggregation of the history
    * subplan per request: the rows reach the driver once either way.
    */
  def inferLocal(rows: Seq[(Long, Long)], binsize: Long): Long = {
    // rows: (binstart, timestamp) in timestamp order for ONE label
    val diffs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var last: Option[(Long, Long)] = None
    val it = rows.iterator
    while (it.hasNext && diffs.length < 200) {
      val (b, t) = it.next()
      last match {
        case Some((_, lt)) if t == lt => () // repeated timestamp: skip
        case Some((lb, lt)) =>
          diffs += ((t - lt, b - lb))
          last = Some((b, t))
        case None =>
          last = Some((b, t))
      }
    }
    val total = diffs.length
    if (total == 0) return if (binsize != 0) 300L else 0L
    val perfect = diffs.count(_._2 == binsize)
    if (perfect.toDouble / total > 0.9) return binsize
    val byDiff = diffs.groupBy(_._1).view.mapValues(_.length).toMap
    // strong mode: >=50% share, ties by (count desc, diff asc)
    val strong = byDiff.toSeq
      .filter { case (_, c) => c * 2 >= total }
      .sortBy { case (d, c) => (-c, d) }
      .headOption.map(_._1)
    if (strong.isDefined) return strong.get
    // prominent: smallest diff with >=20% share
    val prominent = byDiff.toSeq
      .filter { case (_, c) => c * 5 >= total }
      .map(_._1).sorted.headOption
    if (prominent.isDefined) return prominent.get
    // rounded mean ladder (identical arithmetic to roundFrequency)
    val mean = diffs.map(_._1).sum.toDouble / total
    val m = math.floor(mean).toLong
    def snap(off: Int, step: Int): Long = math.floorDiv(m + off, step) * step
    if (mean <= 10) 10L
    else if (mean <= 60) snap(5, 10)
    else if (mean <= 300) snap(30, 60)
    else if (mean <= 3600) snap(150, 300)
    else snap(1800, 3600)
  }

  /** Infer the measurement frequency per label from a binned-history result
    * (columns: nntsclabel, binstart, timestamp). Returns (nntsclabel, freq).
    *
    * Single-pass shape: the binned input (itself an aggregation) is scanned
    * ONCE, shuffled ONCE (the per-label window), and everything downstream
    * stays map-side — the round-2 form recomputed the binned subplan three
    * times (diff stats, per-diff counts, label universe; 7.6 s at sf0.1,
    * second-slowest bench line) because pinning it with persist+count ran
    * the cached subplan without AQE and cost even more.
    *
    *  - dedup happens INSIDE the window pass: a row whose timestamp equals
    *    its predecessor's is dropped before diffs are taken (the reference
    *    skips repeated timestamps, exporter.py:490-497); no dropDuplicates
    *    shuffle.
    *  - each label's first row (null diff) is kept as its presence marker,
    *    so the label universe needs no separate scan; labels with zero
    *    diffs surface as total=NULL, same as the old left-outer join.
    *  - per-(label,diff) counts, the per-label total, and both share-based
    *    picks all derive from one (label, tsdiff) aggregation + a label
    *    window; the window stage already hash-partitions by label, and
    *    every later groupBy/window clusters on a superset of {label}, so
    *    EnsureRequirements inserts no further exchange.
    */
  def infer(binned: DataFrame, binsize: Long): DataFrame = {
    val label = QueryEngine.LabelCol
    val w = Window.partitionBy(col(label)).orderBy(col("timestamp"))

    // dedup-in-window: equal-timestamp successors dropped (the kept row is
    // the tie-group's first, like dropDuplicates, and for real flows
    // binstart is a function of timestamp so the choice is immaterial);
    // the second Window reuses the first's sort and partitioning.
    val deduped = binned
      .select(col(label), col("binstart"), col("timestamp"))
      .withColumn("__dup", col("timestamp") === lag("timestamp", 1).over(w))
      .filter(col("__dup").isNull || !col("__dup"))
    val rows = deduped
      .withColumn("tsdiff", col("timestamp") - lag("timestamp", 1).over(w))
      .withColumn("bindiff", col("binstart") - lag("binstart", 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 201) // marker row + the first 200 diffs

    // one partial-aggregatable pass: count + perfect-bin count + exact diff
    // sum per (label, diff); the NULL-diff group is the label marker.
    val byDiff = rows
      .groupBy(col(label), col("tsdiff"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(when(col("bindiff") === binsize, 1).otherwise(0)).as("perfect_part"),
        sum(col("tsdiff")).as("ts_sum"))

    // per-label diff total alongside the per-diff rows (no self-join);
    // marker rows excluded so total matches the old count-of-diffs exactly.
    val wl = Window.partitionBy(col(label))
    val withTotal = byDiff.withColumn(
      "total", sum(when(col("tsdiff").isNotNull, col("cnt"))).over(wl))

    // both picks in the SAME final aggregation as the stats: conditional
    // min over a (-count, diff) struct = "top share" by (count desc, diff
    // asc); plain conditional min for the 20%-share diff. mean keeps the
    // exact-integer-sum / count double division of the old form bit-for-bit.
    withTotal
      .groupBy(col(label))
      .agg(
        max(col("total")).as("total"),
        sum(col("perfect_part")).as("perfect"),
        (sum(col("ts_sum")).cast("double") / max(col("total"))).as("mean"),
        min(when(col("tsdiff").isNotNull && col("cnt") * 2 >= col("total"),
          struct((-col("cnt")).as("nc"), col("tsdiff").as("v"))))
          .getField("v").as("strongmode"),
        min(when(col("tsdiff").isNotNull && col("cnt") * 5 >= col("total"),
          col("tsdiff"))).as("prominent"))
      .select(
        col(label),
        when(col("total").isNull || col("total") === 0,
          lit(if (binsize != 0) 300L else 0L))
          .when(col("perfect").cast("double") / col("total") > 0.9, lit(binsize))
          .when(col("strongmode").isNotNull, col("strongmode"))
          .when(col("prominent").isNotNull, col("prominent"))
          .otherwise(roundFrequency(col("mean")))
          .cast("long")
          .as("freq"))
      .orderBy(label)
  }
}
