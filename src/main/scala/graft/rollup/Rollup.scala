package graft.rollup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.OracleParity
import graft.query.QueryEngine

/** Pre-aggregated rollup tables + partial→final merge — the Spark-native
  * form of the reference's matrix pipeline (1-min/1-h InfluxDB continuous
  * queries, /root/reference/libnntsc/influx.py:158-195, merged in Python at
  * query time, influx.py:384-517).
  *
  * Differences by design:
  *   - Partials are kept EXACT (decimal sums s1=Σv, s2=Σv², count, min,
  *     max) instead of (mean, magiccount). Merging exact partials is
  *     order-independent and gives the same answer as aggregating the raw
  *     rows — the reference's Σ(mean·n)/Σn dance exists only because Influx
  *     stored means. The stddev merge keeps the reference's RMS
  *     approximation semantics (influx.py:478-491) on top of exact partials.
  *   - At scale the rollup table is itself a partitioned table maintained by
  *     a streaming windowed aggregation (SURVEY §2.9 X4); `build` is the
  *     batch form of that maintenance job.
  */
object Rollup {

  /** Rollup tiers mirroring the reference (influx.py:183-195). */
  val ShortBin = 60L   // 1-min bins, 14-min late horizon
  val LongBin = 3600L  // 1-h bins, 2-h late horizon

  /** Matrix tier routing (influx.py:387-394): ranges of at least an hour
    * read the 1-h rollup, shorter ranges the 1-min rollup. Exposed as a
    * query-layer dispatch (the reference's planner-equivalent); callers
    * hand the chosen tier's table to `merge`.
    */
  def tierFor(start: Long, stop: Long): Long =
    if (stop - start >= 3600) LongBin else ShortBin

  /** Rollup table: exact partial aggregates per (stream_id, binstart).
    * `ts`/`tsn` are the bin's max/min timestamps — the matrix reply's plot
    * point and `min_timestamp` derive from them without touching raw data.
    */
  def build(data: DataFrame, binsize: Long, valueCol: String): DataFrame = {
    val v = col(valueCol)
    val d = OracleParity.dec(v)
    data
      .withColumn("binstart", col("timestamp") - (col("timestamp") % binsize))
      .groupBy("stream_id", "binstart")
      .agg(
        count(v).as("cnt"),
        sum(d).as("s1"),
        sum(d * d).as("s2"),
        min(v).as("mn"),
        max(v).as("mx"),
        max("timestamp").as("ts"),
        min("timestamp").as("tsn"))
  }

  /** Partial→final merge over [start, stop) per label (matrix semantics:
    * one output row per label). Output column names follow the duplicate-agg
    * convention (`value_avg` etc. for the merged metric named by `outPrefix`).
    */
  def merge(
      rollup: DataFrame,
      labels: Map[String, Seq[Long]],
      start: Long,
      stop: Long,
      outPrefix: String): DataFrame = {
    val tagged = QueryEngine
      .attachLabels(rollup.filter(col("binstart").between(start, stop - 1)), labels)
    // per-bin sample variance from exact partials, in double (identical
    // operands on any engine → identical bits)
    val s1d = col("s1").cast("double")
    val s2d = col("s2").cast("double")
    val varbin = when(
      col("cnt") >= 2,
      (s2d - s1d * s1d / col("cnt")) / (col("cnt") - 1))
    val withVar = tagged.withColumn("__var", varbin)
    val stdNum = sum(when(col("cnt") >= 2, col("__var") * col("cnt")).otherwise(lit(0.0)))
    val stdDen = sum(when(col("cnt") >= 2, col("cnt")).otherwise(lit(0L)))
    withVar
      .groupBy(col(QueryEngine.LabelCol))
      .agg(
        (sum(col("s1")).cast("double") / sum(col("cnt"))).as(s"${outPrefix}_avg"),
        sum(col("s1")).cast("double").as(s"${outPrefix}_sum"),
        min(col("mn")).as(s"${outPrefix}_min"),
        max(col("mx")).as(s"${outPrefix}_max"),
        sum(col("cnt")).as(s"${outPrefix}_count"),
        // reference RMS merge: sqrt(Σ(var_i·n_i)/Σn_i) over bins with n>=2
        when(stdDen > 0, round(sqrt(stdNum / stdDen), 6)).as(s"${outPrefix}_stddev"),
        max(col("ts")).as("timestamp"))
      .orderBy(QueryEngine.LabelCol)
  }

  /** Matrix summary computed FROM a rollup tier, with the exact output
    * shape of `QueryEngine.selectMatrixData` (one row per label: nntsclabel,
    * binstart, requested aggregates under their A11 names, timestamp,
    * min_timestamp) — the reference's dashboard economy (influx.py:384-517):
    * a matrix refresh reads the tiny pre-aggregated tier instead of
    * full-scanning raw history.
    *
    * Works directly on per-epoch partials (`RollupStream.readTier` output,
    * compacted or not): every derivation below is associative over partial
    * rows, so no per-bin fold is needed first. Window semantics are
    * bin-granular — bins with `start <= binstart < stop` contribute; callers
    * route here only when the window aligns to the tier (Service.matrixFrame).
    *
    * stddev is the exact sample stddev from the exact decimal partials
    * ((S2 − S1²/n)/(n−1) over the whole window) — truer to the raw-path
    * `stddev_samp` than the reference's RMS-of-bin-variances merge
    * (influx.py:478-491), which `merge` still provides for A13 parity.
    */
  def matrixFromTier(
      tier: DataFrame,
      labels: Map[String, Seq[Long]],
      aggs: Seq[graft.query.AggSpec],
      start: Long,
      stop: Long): DataFrame = {
    val names = QueryEngine.outputNames(aggs, Nil)
    val base = QueryEngine.attachLabels(
      tier.filter(col("binstart") >= start && col("binstart") < stop), labels)
    val n = sum(col("cnt"))
    val s1d = sum(col("s1")).cast("double")
    val s2d = sum(col("s2")).cast("double")
    def fromPartials(a: graft.query.AggSpec): Column = a.func match {
      case "max"    => max(col("mx"))
      case "min"    => min(col("mn"))
      case "count"  => n
      case "sum"    => sum(col("s1")).cast("double")
      case "avg"    => s1d / n
      // same operation order as OracleParity.exactStddev → identical bits
      case "stddev" =>
        when(n >= 2, sqrt(greatest(s2d - s1d * s1d / n, lit(0.0)) / (n - lit(1))))
      case other =>
        throw new IllegalArgumentException(s"not derivable from rollup partials: $other")
    }
    val exprs = aggs.zip(names).map { case (a, nm) => fromPartials(a).as(nm) } ++
      Seq(max(col("ts")).as("timestamp"), min(col("tsn")).as("min_timestamp"))
    base
      .groupBy(col(QueryEngine.LabelCol))
      .agg(exprs.head, exprs.tail: _*)
      .withColumn("binstart", lit(start))
      .select((Seq(QueryEngine.LabelCol, "binstart") ++ names ++
        Seq("timestamp", "min_timestamp")).map(col): _*)
      .orderBy(QueryEngine.LabelCol)
  }
}
