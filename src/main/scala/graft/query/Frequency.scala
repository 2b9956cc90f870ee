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

  /** Infer the measurement frequency per label from a binned-history result
    * (columns: nntsclabel, binstart, timestamp). Returns (nntsclabel, freq).
    */
  def infer(binned: DataFrame, binsize: Long): DataFrame = {
    val label = QueryEngine.LabelCol
    val w = Window.partitionBy(col(label)).orderBy(col("timestamp"))
    // NOTE: the inference tree reads the binned input three ways (diff
    // stats, per-diff counts, the label universe) and recomputes it per
    // consumer. Measured at sf0.1: recompute beats pinning — persist+count
    // materializes the cached subplan WITHOUT AQE and costs more than the
    // three straight evaluations (see the execution-pitfalls memory note).
    val dd = binned
      .select(col(label), col("binstart"), col("timestamp"))
      .dropDuplicates(label, "timestamp")
    val diffs = dd
      .withColumn("tsdiff", col("timestamp") - lag("timestamp", 1).over(w))
      .withColumn("bindiff", col("binstart") - lag("binstart", 1).over(w))
      .filter(col("tsdiff").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 200)

    val stats = diffs
      .groupBy(col(label))
      .agg(
        count(lit(1)).as("total"),
        sum(when(col("bindiff") === binsize, 1).otherwise(0)).as("perfect"),
        (sum(col("tsdiff")).cast("double") / count(lit(1))).as("mean"))

    val byDiff = diffs.groupBy(col(label), col("tsdiff")).agg(count(lit(1)).as("cnt"))
    // both picks in ONE aggregation over one join: conditional min over a
    // (-count, diff) struct = "top share" by (count desc, diff asc) among
    // qualifying rows; plain conditional min for the 20%-share diff. No
    // window sort, no per-pick join.
    val picks = byDiff
      .join(stats.select(col(label), col("total")), Seq(label))
      .groupBy(col(label))
      .agg(
        min(when(col("cnt") * 2 >= col("total"),
          struct((-col("cnt")).as("nc"), col("tsdiff").as("v"))))
          .getField("v").as("strongmode"),
        min(when(col("cnt") * 5 >= col("total"), col("tsdiff"))).as("prominent"))

    val allLabels = dd.select(col(label)).distinct()
    allLabels
      .join(stats, Seq(label), "left_outer")
      .join(picks, Seq(label), "left_outer")
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
