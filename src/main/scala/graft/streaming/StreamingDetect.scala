package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming anomaly detectors over the live export feed — the shape the
  * reference ecosystem runs OUTSIDE the engine (netevmon subscribes to
  * nntsc's live stream and flags events); here the detector is a
  * first-class streaming operator that can sit directly on the ingest /
  * subscribe path ([[Subscribe]], [[LiveFanout]]).
  *
  * Both detectors keep O(1) state PER SERIES (a few longs — no window
  * buffer, no sample reservoir), so state-store size is bounded by
  * series cardinality alone, independent of rate or history. Rows
  * within a micro-batch are processed in (timestamp, tie) order;
  * cross-batch reordering is the caller's contract (the reference's
  * live feed is per-stream in-order once [[LiveFanout]] gates it — run
  * the detector downstream of the gate).
  */
object StreamingDetect {

  final case class SeriesRow(
      stream_id: Long, timestamp: Long, event_id: Long, value: Double)
  final case class Alarm(
      stream_id: Long, timestamp: Long, event_id: Long, value: Double,
      cusum: Double)

  /** CUSUM state: the current statistic, in quantized integer units —
    * EXACTLY the g of [[graft.query.TimeSeriesOps.cusum]]'s scan (the
    * spec replays a batch through both and compares alarms
    * bit-for-bit).
    */
  final case class CusumState(g: Long)

  final case class ZAlarm(
      stream_id: Long, timestamp: Long, event_id: Long, value: Double,
      n_history: Long, zscore: Double)

  /** Rolling z-score state: a ring of the last `windowRows` quantized
    * values plus their running sum and sum-of-squares — O(windowRows)
    * longs per series, maintained incrementally (evict-one/admit-one),
    * so the per-row cost is O(1) regardless of window size.
    */
  final case class ZScoreState(
      ring: Array[Long], idx: Int, count: Long, s1: Long, s2: Long)

  /** Streaming rolling z-score — the live twin of
    * [[graft.query.TimeSeriesOps.rollingZScore]], alarm-for-alarm
    * BIT-IDENTICAL to it (spec-pinned across batch splits): the trailing
    * window sums are the same exact integers, and the mean/variance/z
    * finishers are the same fixed dag of single IEEE ops (sqrt is
    * correctly rounded). The current row never votes on its own
    * baseline; rows are processed in (timestamp, tie) order per batch
    * (cross-batch order = the gate's contract, as with [[cusumStream]]).
    */
  def zscoreStream(
      spark: SparkSession,
      rows: Dataset[SeriesRow],
      windowRows: Int,
      minN: Int,
      threshold: Double,
      quant: Double = 1e3): Dataset[ZAlarm] = {
    import spark.implicits._
    require(windowRows >= 2 && minN >= 2 && minN <= windowRows,
      s"need 2 <= minN <= windowRows, got minN=$minN windowRows=$windowRows")
    rows
      .groupByKey(_.stream_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sid: Long, it: Iterator[SeriesRow], state: GroupState[ZScoreState]) =>
          var st = state.getOption.getOrElse(
            ZScoreState(new Array[Long](windowRows), 0, 0L, 0L, 0L))
          // defensive copy: GroupState contract treats stored values as
          // immutable; mutating the stored array in place is undefined
          val ring = st.ring.clone()
          var idx = st.idx
          var count = st.count
          var s1 = st.s1
          var s2 = st.s2
          val out = Vector.newBuilder[ZAlarm]
          it.toArray.sortBy(r => (r.timestamp, r.event_id)).foreach { r =>
            val q = math.floor(r.value * quant + 0.5).toLong
            val n = math.min(count, windowRows.toLong)
            if (n >= minN) {
              // EXACTLY the batch finisher dag (see rollingZScore)
              val mean = s1.toDouble / n
              val variance =
                (s2.toDouble - s1.toDouble * s1.toDouble / n) / (n - 1)
              if (variance > 0.0) {
                val z = (q.toDouble - mean) / math.sqrt(variance)
                if (math.abs(z) >= threshold)
                  out += ZAlarm(sid, r.timestamp, r.event_id, r.value, n, z)
              }
            }
            // admit q; evict the overwritten slot once the ring is full
            if (count >= windowRows) {
              val old = ring(idx)
              s1 -= old
              s2 -= old * old
            }
            ring(idx) = q
            s1 += q
            s2 += q * q
            idx = (idx + 1) % windowRows
            count += 1L
          }
          state.update(ZScoreState(ring, idx, count, s1, s2))
          out.result().iterator
      }
  }

  final case class PlateauRun(
      stream_id: Long, t_start: Long, t_end: Long, n_rows: Long, peak: Double)

  /** Open-run state for [[plateauStream]]: the qualifying run in
    * progress, if any. An open run only EMITS when it closes (a
    * below-level observation arrives) — a stream cannot know t_end
    * earlier — so batch/stream agreement holds exactly on islands the
    * data has closed ([[graft.query.TimeSeriesOps.plateaus]] emits the
    * still-open tail island too; the spec closes every island before
    * comparing).
    */
  final case class PlateauState(
      open: Boolean, tStart: Long, tEnd: Long, n: Long, peak: Double)

  /** Streaming plateau detection: per-series O(1) state (one open run),
    * emitting each maximal ≥ minRun run at-or-above `level` when it
    * closes. Same qualification and boundary semantics as the batch
    * gaps-and-islands form.
    */
  def plateauStream(
      spark: SparkSession,
      rows: Dataset[SeriesRow],
      level: Double,
      minRun: Int): Dataset[PlateauRun] = {
    import spark.implicits._
    require(minRun >= 1, s"minRun must be >= 1, got $minRun")
    rows
      .groupByKey(_.stream_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sid: Long, it: Iterator[SeriesRow], state: GroupState[PlateauState]) =>
          var st = state.getOption.getOrElse(
            PlateauState(open = false, 0L, 0L, 0L, 0.0))
          val out = Vector.newBuilder[PlateauRun]
          it.toArray.sortBy(r => (r.timestamp, r.event_id)).foreach { r =>
            if (r.value >= level) {
              st =
                if (st.open)
                  st.copy(tEnd = r.timestamp, n = st.n + 1L,
                    peak = math.max(st.peak, r.value))
                else PlateauState(open = true, r.timestamp, r.timestamp, 1L, r.value)
            } else {
              if (st.open && st.n >= minRun)
                out += PlateauRun(sid, st.tStart, st.tEnd, st.n, st.peak)
              st = PlateauState(open = false, 0L, 0L, 0L, 0.0)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  // ---- Holt-Winters forecast-deviation detector ------------------------

  /** Double-exponential-smoothing state: level, trend, smoothed absolute
    * deviation, rows seen. A genuinely SEQUENTIAL recursion (unlike
    * CUSUM it does not reduce to a prefix scan — level and trend feed
    * back multiplicatively), so the batch form is a per-series fold too;
    * batch and stream share [[hwStep]] literally, which is the
    * agreement proof.
    */
  final case class HwState(level: Double, trend: Double, dev: Double, n: Long)

  final case class HwAlarm(
      stream_id: Long, timestamp: Long, event_id: Long, value: Double,
      forecast: Double, deviation: Double)

  /** One Holt-Winters step: forecast from the current state, then update
    * level/trend (Holt's linear method) and the smoothed absolute
    * deviation (the netevmon-style adaptive confidence band). Returns
    * (nextState, alarm?) — an alarm when the row had ≥ minN history and
    * |value − forecast| > m × smoothed deviation.
    */
  private def hwStep(
      st: HwState, r: SeriesRow,
      alpha: Double, beta: Double, gamma: Double, m: Double, minN: Long,
      minDev: Double): (HwState, Option[HwAlarm]) = {
    if (st.n == 0L)
      return (HwState(r.value, 0.0, minDev, 1L), None)
    val forecast = st.level + st.trend
    val err = r.value - forecast
    val alarm =
      if (st.n >= minN && math.abs(err) > m * math.max(st.dev, minDev))
        Some(HwAlarm(r.stream_id, r.timestamp, r.event_id, r.value,
          forecast, math.abs(err)))
      else None
    val level = alpha * r.value + (1.0 - alpha) * (st.level + st.trend)
    val trend = beta * (level - st.level) + (1.0 - beta) * st.trend
    val dev = gamma * math.abs(err) + (1.0 - gamma) * st.dev
    (HwState(level, trend, dev, st.n + 1L), alarm)
  }

  /** Streaming Holt-Winters detector: per-series O(1) state (4 numbers),
    * alarms when the observation leaves the adaptive band
    * |value − (level+trend)| > m·dev. Rows are processed in
    * (timestamp, tie) order per batch; cross-batch order is the
    * upstream gate's contract (same as [[cusumStream]]). Not
    * oracle-checked — the recursion is float-sequential by nature — but
    * [[holtWintersBatch]] runs the IDENTICAL step function, and the
    * spec pins stream(splits) == batch.
    */
  def holtWintersStream(
      spark: SparkSession,
      rows: Dataset[SeriesRow],
      alpha: Double = 0.3,
      beta: Double = 0.1,
      gamma: Double = 0.3,
      m: Double = 4.0,
      minN: Long = 10L,
      minDev: Double = 1e-9): Dataset[HwAlarm] = {
    import spark.implicits._
    rows
      .groupByKey(_.stream_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sid: Long, it: Iterator[SeriesRow], state: GroupState[HwState]) =>
          var st = state.getOption.getOrElse(HwState(0.0, 0.0, 0.0, 0L))
          val out = Vector.newBuilder[HwAlarm]
          it.toArray.sortBy(r => (r.timestamp, r.event_id)).foreach { r =>
            val (next, alarm) = hwStep(st, r, alpha, beta, gamma, m, minN, minDev)
            st = next
            alarm.foreach(out += _)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Batch Holt-Winters: the same per-series fold over sorted history
    * (one task per series — the irreducible shape of a feedback
    * recursion; parallelism comes from series cardinality, the nntsc
    * layout). Shares [[hwStep]] with the stream form.
    */
  def holtWintersBatch(
      spark: SparkSession,
      rows: Dataset[SeriesRow],
      alpha: Double = 0.3,
      beta: Double = 0.1,
      gamma: Double = 0.3,
      m: Double = 4.0,
      minN: Long = 10L,
      minDev: Double = 1e-9): Dataset[HwAlarm] = {
    import spark.implicits._
    rows
      .groupByKey(_.stream_id)
      .flatMapGroups { (sid: Long, it: Iterator[SeriesRow]) =>
        var st = HwState(0.0, 0.0, 0.0, 0L)
        val out = Vector.newBuilder[HwAlarm]
        it.toArray.sortBy(r => (r.timestamp, r.event_id)).foreach { r =>
          val (next, alarm) = hwStep(st, r, alpha, beta, gamma, m, minN, minDev)
          st = next
          alarm.foreach(out += _)
        }
        out.result().iterator
      }
  }

  // ---- fixed-point Holt-Winters (oracle-gatable) -----------------------

  /** Integer Holt-Winters state: level/trend/deviation as quant-scaled
    * longs. The float form's recursion is sequential AND transcendental-
    * free but still unreproducible cross-engine (each step's smoothing
    * sum re-rounds, and a million chained roundings drift); here every
    * step is exact integer multiplies plus ONE half-up rounding
    * division — the same trick CUSUM uses — so any engine that can
    * floor-divide integers replays the recursion bit-for-bit (the
    * DuckDB recursive-CTE oracle behind q_hw does exactly that).
    */
  final case class HwFixedState(level: Long, trend: Long, dev: Long, n: Long)

  /** Fixed-point alarm: forecast and |error| in quant units (exact
    * longs — no float column that could diverge between engines).
    */
  final case class HwFixedAlarm(
      stream_id: Long, timestamp: Long, event_id: Long, value: Double,
      forecast_q: Long, deviation_q: Long)

  /** Coefficient scale: alpha/beta/gamma/m quantize to thousandths. */
  private val HwC = 1000L

  /** Half-up rounding division by [[HwC]] via floorDiv — floorDiv is
    * expressible exactly in portable SQL as (y − pmod(y, C)) / C, which
    * is how the oracle mirrors it.
    */
  @inline private def hwRound(x: Long): Long = Math.floorDiv(x + HwC / 2, HwC)

  /** One fixed-point Holt-Winters step — the integer twin of [[hwStep]],
    * shared by [[holtWintersFixedBatch]] and [[holtWintersFixedStream]].
    * aC/bC/gC/mC are the quantized smoothing coefficients (thousandths);
    * q is the quant-scaled observation.
    */
  private def hwFixedStep(
      st: HwFixedState, r: SeriesRow, quant: Double,
      aC: Long, bC: Long, gC: Long, mC: Long, minN: Long, minDevQ: Long)
      : (HwFixedState, Option[HwFixedAlarm]) = {
    val q = math.floor(r.value * quant + 0.5).toLong
    if (st.n == 0L)
      return (HwFixedState(q, 0L, minDevQ, 1L), None)
    val forecast = st.level + st.trend
    val absErr = math.abs(q - forecast)
    val alarm =
      if (st.n >= minN && absErr * HwC > mC * math.max(st.dev, minDevQ))
        Some(HwFixedAlarm(r.stream_id, r.timestamp, r.event_id, r.value,
          forecast, absErr))
      else None
    val level = hwRound(aC * q + (HwC - aC) * (st.level + st.trend))
    val trend = hwRound(bC * (level - st.level) + (HwC - bC) * st.trend)
    val dev = hwRound(gC * absErr + (HwC - gC) * st.dev)
    (HwFixedState(level, trend, dev, st.n + 1L), alarm)
  }

  private def hwQuantize(alpha: Double, beta: Double, gamma: Double, m: Double)
      : (Long, Long, Long, Long) = {
    def c(x: Double, what: String): Long = {
      require(x >= 0, s"$what must be non-negative, got $x")
      math.floor(x * HwC + 0.5).toLong
    }
    require(alpha <= 1 && beta <= 1 && gamma <= 1,
      "smoothing coefficients must be in [0, 1]")
    (c(alpha, "alpha"), c(beta, "beta"), c(gamma, "gamma"), c(m, "m"))
  }

  /** Batch fixed-point Holt-Winters: the [[holtWintersBatch]] semantics
    * with a fully integer recursion, so the alarm set (and the emitted
    * forecast/deviation longs) is hash-gatable against a DuckDB
    * recursive-CTE oracle. Same execution shape as the double form: one
    * shuffle by series, one fold per series, parallelism = series
    * cardinality. The spec pins fixed ≈ double (same alarms on the gate
    * corpus) and fixed-stream == fixed-batch bit-for-bit.
    */
  def holtWintersFixedBatch(
      spark: SparkSession,
      rows: Dataset[SeriesRow],
      alpha: Double = 0.3,
      beta: Double = 0.1,
      gamma: Double = 0.3,
      m: Double = 4.0,
      minN: Long = 10L,
      minDev: Double = 0.001,
      quant: Double = 1e6): Dataset[HwFixedAlarm] = {
    import spark.implicits._
    val (aC, bC, gC, mC) = hwQuantize(alpha, beta, gamma, m)
    val minDevQ = math.floor(minDev * quant + 0.5).toLong
    rows
      .groupByKey(_.stream_id)
      .flatMapGroups { (sid: Long, it: Iterator[SeriesRow]) =>
        var st = HwFixedState(0L, 0L, 0L, 0L)
        val out = Vector.newBuilder[HwFixedAlarm]
        it.toArray.sortBy(r => (r.timestamp, r.event_id)).foreach { r =>
          val (next, alarm) = hwFixedStep(st, r, quant, aC, bC, gC, mC, minN, minDevQ)
          st = next
          alarm.foreach(out += _)
        }
        out.result().iterator
      }
  }

  /** Streaming twin of [[holtWintersFixedBatch]] — O(1) longs per
    * series, identical step function, so batch backfill and live tail
    * agree on every alarm (spec-pinned across batch splits).
    */
  def holtWintersFixedStream(
      spark: SparkSession,
      rows: Dataset[SeriesRow],
      alpha: Double = 0.3,
      beta: Double = 0.1,
      gamma: Double = 0.3,
      m: Double = 4.0,
      minN: Long = 10L,
      minDev: Double = 0.001,
      quant: Double = 1e6): Dataset[HwFixedAlarm] = {
    import spark.implicits._
    val (aC, bC, gC, mC) = hwQuantize(alpha, beta, gamma, m)
    val minDevQ = math.floor(minDev * quant + 0.5).toLong
    rows
      .groupByKey(_.stream_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sid: Long, it: Iterator[SeriesRow], state: GroupState[HwFixedState]) =>
          var st = state.getOption.getOrElse(HwFixedState(0L, 0L, 0L, 0L))
          val out = Vector.newBuilder[HwFixedAlarm]
          it.toArray.sortBy(r => (r.timestamp, r.event_id)).foreach { r =>
            val (next, alarm) = hwFixedStep(st, r, quant, aC, bC, gC, mC, minN, minDevQ)
            st = next
            alarm.foreach(out += _)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming one-sided CUSUM: g ← max(0, g + (q − k·quant)) per
    * arriving row, alarm when g ≥ h·quant. Identical arithmetic to the
    * batch prefix-scan form — quantized longs, no floats — so batch
    * backfill and live tail agree on every alarm.
    */
  def cusumStream(
      spark: SparkSession,
      rows: Dataset[SeriesRow],
      k: Double,
      h: Double,
      quant: Double = 1e3): Dataset[Alarm] = {
    import spark.implicits._
    require(h > 0, s"decision interval h must be positive, got $h")
    val qk = math.floor(k * quant + 0.5).toLong
    val qh = math.floor(h * quant + 0.5).toLong
    rows
      .groupByKey(_.stream_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sid: Long, it: Iterator[SeriesRow], state: GroupState[CusumState]) =>
          var g = state.getOption.map(_.g).getOrElse(0L)
          val out = Vector.newBuilder[Alarm]
          // batch-local event order; cross-batch order is the gate's job
          it.toArray.sortBy(r => (r.timestamp, r.event_id)).foreach { r =>
            val q = math.floor(r.value * quant + 0.5).toLong
            g = math.max(0L, g + (q - qk))
            if (g >= qh)
              out += Alarm(sid, r.timestamp, r.event_id, r.value, g / quant)
          }
          state.update(CusumState(g))
          out.result().iterator
      }
  }
}
