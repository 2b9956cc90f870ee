package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.query.QueryEngine

/** The NNTSC_SUBSCRIBE contract (X1-X3,
  * /root/reference/libnntsc/exporter.py:875-971, 1026-1052, 1408-1489):
  * a subscription = backfill of history for the past portion of
  * [start, end) + a live tail until `end` (end=0 ⇒ forever), with the
  * ordering guarantee "history before live". Live rows that arrive while
  * backfill is running are buffered and released after backfill, KEEPING
  * ONLY rows with `timestamp > lasthist` — where lasthist is PER LABEL
  * (each label's own last history timestamp, `labelGate`): the reference's
  * finish_subscribe runs once per label (exporter.py:907-946), so a label
  * whose history ends early still receives the live rows between its end
  * and the latest label's end.
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

  /** Per-label seam gate (exporter.py:907-946 — `finish_subscribe` runs
    * once PER LABEL with that label's own `lasthist`; the `d[2] <= lasthist`
    * drop is inside the per-label loop): a buffered live row is released
    * when its timestamp exceeds ITS OWN label's last history timestamp,
    * `Long.MinValue` for labels with no history at all (everything
    * released). A single global gate would silently drop live rows for
    * labels whose histories end earlier than the global max.
    */
  def labelGate(labels: Iterable[String], lastHistByLabel: Map[String, Long]): Column =
    labels.foldLeft(lit(Long.MinValue)) { (acc, l) =>
      when(col(QueryEngine.LabelCol) === l,
        lit(lastHistByLabel.getOrElse(l, Long.MinValue))).otherwise(acc)
    }

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
    private var lastHist: Map[String, Long] = Map.empty
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

    /** Record the backfill's last timestamp PER LABEL (exporter.py:907-946:
      * each label releases against its own lasthist). A history frame
      * without the label column (single-label callers handing raw data)
      * seeds that label with the global max — the two coincide there, and
      * ONLY there: a multi-label caller must hand labeled history, or the
      * global max would silently gate out live rows for labels whose
      * histories end earlier (the exact bug labelGate exists to prevent),
      * so that misuse fails loudly instead.
      */
    def onHistory(history: DataFrame): Unit = {
      require(state == Backfilling)
      lastHist =
        if (history.columns.contains(QueryEngine.LabelCol))
          history
            .groupBy(col(QueryEngine.LabelCol))
            .agg(max("timestamp"))
            .collect()
            .filterNot(_.isNullAt(1))
            .map(r => r.getString(0) -> r.getLong(1))
            .toMap
        else {
          require(
            sub.labels.size <= 1,
            s"onHistory: history frame has no '${QueryEngine.LabelCol}' column but the " +
              s"subscription has ${sub.labels.size} labels — a global lasthist would " +
              "drop live rows for labels whose histories end earlier; attach labels " +
              "(QueryEngine.attachLabels) before handing history to a multi-label session")
          val mx = history.agg(max("timestamp")).collect()(0)
          if (mx.isNullAt(0)) Map.empty
          else sub.labels.keys.map(_ -> mx.getLong(0)).toMap
        }
    }

    def onLive(batch: DataFrame): Option[DataFrame] = state match {
      case Backfilling =>
        buffered = buffered :+ liveFilter(batch, sub) // buffer until backfill done
        None
      case Live =>
        Some(liveFilter(batch, sub)) // pass through immediately
    }

    /** Release buffered live rows whose timestamp exceeds THEIR label's
      * own lasthist (labels absent from history gate at Long.MinValue —
      * everything released); afterwards live batches flow straight through
      * (X3 PUSH markers arrive via `onMarker`, published by the ingest's
      * batch-commit callback — see FilePoller). Buffered frames carry the
      * label column (`liveFilter` attaches it), so the gate is a tiny
      * per-label CASE expression, not a join.
      */
    def finish(): Option[DataFrame] = {
      require(state == Backfilling)
      state = Live
      val out = buffered
        .reduceOption(_ unionByName _)
        .map(_.filter(col("timestamp") > labelGate(sub.labels.keys, lastHist)))
      buffered = Vector.empty
      out
    }
  }
}
