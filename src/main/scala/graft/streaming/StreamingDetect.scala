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
