package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.query.QueryEngine

/** The NNTSC_SUBSCRIBE contract (X1-X3,
  * /root/reference/libnntsc/exporter.py:875-971, 1026-1052, 1408-1489):
  * a subscription = backfill of history for the past portion of
  * [start, end) + a live tail until `end` (end=0 ⇒ forever), with the
  * ordering guarantee "history before live". Live rows that arrive while
  * backfill is running are buffered and released after backfill, KEEPING
  * ONLY rows with `timestamp > lasthist` (the last timestamp the history
  * query returned) — the dedupe rule that makes the seam exact.
  *
  * The state machine is modeled explicitly (Backfilling → Live); the
  * merge/dedupe rule itself is a pure function so both the batch tests and
  * the foreachBatch fan-out use the same code.
  */
object Subscribe {

  sealed trait State
  case object Backfilling extends State
  case object Live extends State

  final case class Subscription(
      labels: Map[String, Seq[Long]],
      start: Long,
      end: Long, // 0 = forever
      columns: Seq[String])

  /** The seam rule (exporter.py:907-971): emitted = history ++ buffered
    * live rows with timestamp strictly greater than the last history
    * timestamp. Both frames must share the subscription's column set.
    */
  def mergeBackfillAndLive(history: DataFrame, bufferedLive: DataFrame, lastHist: Long): DataFrame =
    history.unionByName(bufferedLive.filter(col("timestamp") > lastHist))

  /** Per-subscription live filter (X2, exporter.py:1408-1489): restrict to
    * subscribed streams, drop rows before `start`, end the feed past `end`.
    */
  def liveFilter(live: DataFrame, sub: Subscription): DataFrame = {
    val inWindow =
      if (sub.end == 0) col("timestamp") >= sub.start
      else col("timestamp").between(sub.start, sub.end)
    QueryEngine
      .attachLabels(live.filter(inWindow), sub.labels)
      .select((Seq(QueryEngine.LabelCol, "timestamp", "stream_id") ++
        sub.columns.filterNot(Seq(QueryEngine.LabelCol, "timestamp", "stream_id").contains))
        .distinct.map(col): _*)
  }

  /** A driver-side subscription session: call `onHistory` with the backfill
    * result, buffer live batches with `onLive`, then `finish` returns the
    * ordered, deduped stream head (history rows, then admitted live rows)
    * and flips the state to Live. Mirrors NNTSCClient.receive_live +
    * finish_subscribe. Thread-safety: calls are serialized by the caller
    * (foreachBatch is single-threaded per query).
    */
  final class Session(val sub: Subscription) {
    private var state: State = Backfilling
    private var buffered: Vector[DataFrame] = Vector.empty
    private var lastHist: Long = Long.MinValue
    private var pushed: Option[Long] = None

    def currentState: State = state

    /** X3: record a PUSH marker — "all data <= marker.timestamp delivered".
      * Clients poll `pushedUpTo` to know a batch boundary has passed
      * (exporter.py:1304-1349; the reference client treats PUSH as the
      * signal that a timestamp's data is complete).
      */
    def onMarker(m: Markers.Marker): Unit =
      pushed = Some(pushed.fold(m.timestamp)(math.max(_, m.timestamp)))

    def pushedUpTo: Option[Long] = pushed

    def onHistory(history: DataFrame): Unit = {
      require(state == Backfilling)
      val mx = history.agg(max("timestamp")).collect()(0)
      lastHist = if (mx.isNullAt(0)) Long.MinValue else mx.getLong(0)
    }

    def onLive(batch: DataFrame): Option[DataFrame] = state match {
      case Backfilling =>
        buffered = buffered :+ liveFilter(batch, sub) // buffer until backfill done
        None
      case Live =>
        Some(liveFilter(batch, sub)) // pass through immediately
    }

    /** Release buffered live rows `> lasthist`; afterwards live batches
      * flow straight through (X3 PUSH markers arrive via `onMarker`,
      * published by the ingest's batch-commit callback — see FilePoller).
      */
    def finish(): Option[DataFrame] = {
      require(state == Backfilling)
      state = Live
      val out = buffered
        .reduceOption(_ unionByName _)
        .map(_.filter(col("timestamp") > lastHist))
      buffered = Vector.empty
      out
    }
  }
}
