package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming form of the subscribe live gate (X1/X2,
  * /root/reference/libnntsc/exporter.py:907-971, 1408-1489): per-stream
  * state holds the last emitted timestamp, seeded with the backfill's
  * `lasthist`; live rows are admitted only when strictly newer, in
  * timestamp order. This both enforces the history-before-live seam AND
  * deduplicates redelivered rows (the reference's RabbitMQ feed is
  * at-least-once, amp.py:190-273) — per-stream monotonic exactly-once
  * emission via `flatMapGroupsWithState`.
  */
object LiveFanout {

  final case class LiveRow(stream_id: Long, timestamp: Long, value: Double)
  final case class Gate(lastEmitted: Long)

  /** Gate a (streaming) dataset of live rows. `initialGate` carries each
    * subscribed stream's backfill high-water mark (`lasthist`); unseen
    * streams start wide open.
    */
  def gated(
      spark: SparkSession,
      rows: Dataset[LiveRow],
      initialGate: Map[Long, Long]): Dataset[LiveRow] = {
    import spark.implicits._
    rows
      .groupByKey(_.stream_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sid: Long, it: Iterator[LiveRow], state: GroupState[Gate]) =>
          val gate = state.getOption
            .getOrElse(Gate(initialGate.getOrElse(sid, Long.MinValue)))
          val admitted = it
            .filter(_.timestamp > gate.lastEmitted)
            .toArray
            .sortBy(_.timestamp)
          // dedupe equal timestamps within the batch (redelivery)
          val out = admitted.foldLeft(Vector.empty[LiveRow]) { (acc, r) =>
            if (acc.nonEmpty && acc.last.timestamp == r.timestamp) acc else acc :+ r
          }
          if (out.nonEmpty) state.update(Gate(out.last.timestamp))
          else if (state.getOption.isEmpty) state.update(gate)
          out.iterator
      }
  }
}
