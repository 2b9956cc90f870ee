package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators beyond the reference's equi-join surface —
  * the as-of join every metrics store eventually needs (align a series
  * with the most recent observation of another).
  *
  * Composition strategy (preference (a) of the custom-operator ladder):
  * tag both sides, union, and carry the right side's values forward with a
  * `last(_, ignoreNulls)` running window ordered by (ts, side). ONE shuffle
  * on the join keys, no custom physical operator, scales like any window —
  * and Catalyst/AQE still size the exchange. Right rows sort before left
  * rows at equal timestamps, so `right.ts <= left.ts` is inclusive,
  * matching DuckDB's ASOF JOIN (the oracle).
  */
object TimeSeriesOps {

  /** For each left row, attach the latest right row with
    * `right.tsCol <= left.tsCol` per `keyCols`. Right must be unique per
    * (keyCols, tsCol) — pre-deduplicate for deterministic results.
    * Inner semantics: left rows with no prior right row are dropped
    * (`leftOuter = true` keeps them with NULLs).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      rightValueCols: Seq[String],
      leftOuter: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    // the right timestamp is always carried: it is the match indicator for
    // inner semantics (value columns may be legitimately NULL)
    val carried = s"__r___ts" +: rightValueCols.map(c => s"__r_$c")

    val l0 = left.withColumn("__side", lit(1))
      .withColumn("__r___ts", lit(null).cast(right.schema(tsCol).dataType))
    val l = rightValueCols.foldLeft(l0) {
      (df, c) => df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType))
    }
    val rBase = right.select(
      (keyCols.map(col) :+ col(tsCol) :+ col(tsCol).as("__r___ts")) ++
        rightValueCols.map(c => col(c).as(s"__r_$c")): _*)
    val r = leftCols.filterNot((keyCols :+ tsCol).contains)
      .foldLeft(rBase.withColumn("__side", lit(0))) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withCarry = carried.foldLeft(l.unionByName(r.select(l.columns.toIndexedSeq.map(col): _*))) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val matchedOnly =
      if (leftOuter) withCarry
      else withCarry.filter(col("__r___ts").isNotNull)
    matchedOnly
      .filter(col("__side") === 1)
      .select((leftCols.map(col) :+ col("__r___ts").as(s"asof_$tsCol")) ++
        rightValueCols.map(c => col(s"__r_$c").as(s"asof_$c")): _*)
  }

  /** The same as-of semantics as a CUSTOM PHYSICAL OPERATOR (rung (c):
    * logical node + strategy + SparkPlan, `graft.plans.AsOfJoinPlan`).
    * Each side is exchanged+sorted separately and merged in one forward
    * pass, instead of window-scanning the sorted union. Output schema and
    * rows are identical to `asofJoin` (asserted in TimeSeriesOpsSpec and
    * by the shared q_asof oracle SQL). Timestamp columns must be BIGINT.
    */
  def asofJoinNative(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      rightValueCols: Seq[String],
      leftOuter: Boolean = false): DataFrame = {
    import org.apache.spark.sql.GraftShim
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    val spark = left.sparkSession
    GraftShim.addStrategy(spark, graft.plans.AsOfJoinStrategy)
    GraftShim.addOptimization(spark, graft.plans.AsOfJoinFilterPushdown)

    val lPlan = GraftShim.analyzed(left)
    val rPlan = GraftShim.analyzed(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))

    // types come from the right side NOW; the node itself carries only
    // names (analyzer rewrites may re-alias the children's exprIds)
    val carried = attr(rPlan, tsCol) +: rightValueCols.map(attr(rPlan, _))
    val carriedNames = s"asof_$tsCol" +: rightValueCols.map(c => s"asof_$c")
    val asofAttrs = carried.zip(carriedNames).map { case (a, n) =>
      AttributeReference(n, a.dataType, nullable = true)()
    }
    keyCols.foreach(attr(lPlan, _)); keyCols.foreach(attr(rPlan, _)) // fail fast
    val node = graft.plans.AsOfJoinNode(
      lPlan, rPlan, keyCols, tsCol, rightValueCols, asofAttrs, leftOuter)
    GraftShim.ofRows(spark, node)
  }

  /** Rolling z-score anomaly detection per series — the engine-side form
    * of the reference ecosystem's event detection (netevmon consumes
    * exactly this kind of binned series from nntsc and flags
    * level-shifts; here the detector IS a relational operator). For each
    * row, mean/stddev come from the `windowRows` PRECEDING rows of the
    * same series (the current row is excluded — it must not vote on its
    * own baseline), and rows with `|z| >= threshold` (and at least
    * `minN` history rows, and non-degenerate variance) are emitted.
    *
    * Cross-engine exactness: values quantize to 1/quant longs (the
    * OuterProductAggregate contract), so the windowed count/sum/
    * sum-of-squares are exact integers; mean, variance, and
    * z = (q − mean)/sqrt(var) are then a fixed dag of single IEEE ops —
    * sqrt is correctly rounded under IEEE 754, so even it is
    * bit-reproducible. With quant = 1e3, |value| ≤ ~1e6 and windows to
    * ~1e4 rows stay far below 2^63 in s2 (documented bound; larger
    * magnitudes → smaller quant).
    *
    * Shape at 100 TB: one shuffle by series key, doc-local sort inside
    * each partition window (Spark's WindowExec sorts per partition — no
    * global sort), one pass; state is the windowRows frame. Series
    * cardinality provides the parallelism (the nntsc layout: many
    * streams × bounded per-stream history).
    */
  /** One-sided (upper) CUSUM changepoint detection per series — the
    * sequential recursion g_t = max(0, g_{t−1} + (x_t − k)) re-expressed
    * as a RELATIONAL prefix scan: with S_t = Σ_{i≤t}(x_t − k) and
    * S_0 = 0,
    *
    *   g_t = S_t − min_{0≤j≤t} S_j
    *
    * (the reset-to-zero max folds into a running minimum), so the whole
    * detector is two window functions over the same per-series frame —
    * a running sum and a running min — with no per-row recursion, no
    * UDF, no state machine. Rows where g ≥ h (the decision interval) are
    * emitted with the statistic.
    *
    * `k` is the reference/slack value (alarms accumulate only while
    * x > k; classically μ₀ + δ/2) and `h` the decision threshold.
    * Everything is quantized to 1/quant longs, so the scan is EXACT
    * integer arithmetic end to end — there is not a single
    * floating-point reduction anywhere, and the emitted statistic is
    * bit-identical on any engine at any partitioning.
    *
    * Shape at 100 TB: identical to [[rollingZScore]] — one shuffle by
    * series key, per-partition window sort, two same-frame window
    * aggregates that WindowExec computes in one pass.
    */
  def cusum(
      df: DataFrame,
      seriesCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      k: Double,
      h: Double,
      quant: Double = 1e3): DataFrame = {
    require(h > 0, s"decision interval h must be positive, got $h")
    val win = Window.partitionBy(seriesCol)
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val qv = floor(col(valueCol) * lit(quant) + lit(0.5)).cast("long")
    val qk = math.floor(k * quant + 0.5).toLong
    val qh = math.floor(h * quant + 0.5).toLong
    df.withColumn("__d", qv - lit(qk))
      .withColumn("__s", sum(col("__d")).over(win))
      // min_{0<=j<=t} S_j includes the virtual S_0 = 0 start
      .withColumn("__smin", least(min(col("__s")).over(win), lit(0L)))
      .withColumn("__g", col("__s") - col("__smin"))
      .filter(col("__g") >= qh)
      .select(
        col(seriesCol), col(tsCol), col(tieCol), col(valueCol),
        (col("__g").cast("double") / lit(quant)).as("cusum"))
  }

  /** Plateau detection per series: maximal runs of consecutive
    * observations at-or-above `level` lasting at least `minRun` rows —
    * the sustained-elevation detector (a latency plateau, a stuck
    * gauge) next to [[cusum]]'s level-shift detector. The run grouping
    * is the classic gaps-and-islands identity: within a series ordered
    * by (ts, tie), `island = row_number() − row_number-among-qualifying`
    * is constant exactly on each maximal qualifying run. One row per
    * plateau: (series, t_start, t_end, n_rows, peak).
    *
    * Exactness is trivial — the threshold test and both row numbers are
    * integers; t_start/t_end/n_rows/peak are plain aggregates of input
    * values. Same scale shape as the other detectors: one shuffle by
    * series, per-partition window sort, then a map-side-combined
    * aggregation on (series, island).
    */
  def plateaus(
      df: DataFrame,
      seriesCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      level: Double,
      minRun: Int): DataFrame = {
    require(minRun >= 1, s"minRun must be >= 1, got $minRun")
    val wAll = Window.partitionBy(seriesCol).orderBy(col(tsCol), col(tieCol))
    val qualifying = df.withColumn("__rn", row_number().over(wAll))
      .filter(col(valueCol) >= level)
    val wQual = Window.partitionBy(seriesCol).orderBy(col(tsCol), col(tieCol))
    qualifying
      .withColumn("__island", col("__rn") - row_number().over(wQual))
      .groupBy(col(seriesCol), col("__island"))
      .agg(
        min(col(tsCol)).as("t_start"),
        max(col(tsCol)).as("t_end"),
        count(lit(1)).as("n_rows"),
        max(col(valueCol)).as("peak"))
      .filter(col("n_rows") >= minRun)
      .select(col(seriesCol), col("t_start"), col("t_end"), col("n_rows"), col("peak"))
  }

  def rollingZScore(
      df: DataFrame,
      seriesCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      windowRows: Int,
      minN: Int,
      threshold: Double,
      quant: Double = 1e3): DataFrame = {
    require(windowRows >= 2 && minN >= 2 && minN <= windowRows,
      s"need 2 <= minN <= windowRows, got minN=$minN windowRows=$windowRows")
    val win = Window.partitionBy(seriesCol)
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-windowRows, -1)
    val q = floor(col(valueCol) * lit(quant) + lit(0.5)).cast("long")
    val mean = col("__s1").cast("double") / col("__n")
    val variance =
      (col("__s2").cast("double") -
        col("__s1").cast("double") * col("__s1").cast("double") / col("__n")) /
        (col("__n") - 1)
    df.withColumn("__q", q)
      .withColumn("__n", count(lit(1)).over(win))
      .withColumn("__s1", sum(col("__q")).over(win))
      .withColumn("__s2", sum(col("__q") * col("__q")).over(win))
      .withColumn("zscore",
        (col("__q").cast("double") - mean) / sqrt(variance))
      .filter(
        col("__n") >= minN && variance > 0.0 &&
          abs(col("zscore")) >= threshold)
      .select(
        col(seriesCol), col(tsCol), col(tieCol), col(valueCol),
        col("__n").as("n_history"), col("zscore"))
  }
}
