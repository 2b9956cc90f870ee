package graft.streaming

/** X3 PUSH markers and live-row fan-out
  * (/root/reference/libnntsc/exporter.py:1304-1349, 1408-1489): after a
  * batch commits, the ingest announces `(collection, timestamp)` — "all
  * data with timestamp <= this has been delivered for this collection" —
  * and the committed rows themselves flow to live subscribers (the
  * reference's NNTSC_PUSH and NNTSC_LIVE messages).
  */
object Markers {

  final case class Marker(collection: String, timestamp: Long, epoch: Long)

  /** One committed batch's rows for a collection (NNTSC_LIVE payload).
    * Rows are already collected — foreachBatch frames die with their batch,
    * so the publisher materializes before handing off (see the
    * execution-pitfalls note); the exporter is driver-side by construction,
    * exactly like the reference's.
    */
  final case class LiveBatch(collection: String, rows: Seq[org.apache.spark.sql.Row])

  /** Subscription handle: `close()` detaches the callback. Long-running
    * servers MUST close handles when a client disconnects — otherwise every
    * dead connection leaks a callback (plus a swallowed socket write per
    * publish).
    */
  final class Handle private[Markers] (
      list: java.util.concurrent.CopyOnWriteArrayList[AnyRef],
      f: AnyRef) {
    def close(): Unit = list.remove(f)
  }

  /** In-process pub/sub bus keyed by collection. Like the reference
    * exporter, a message is only delivered to subscribers of its collection
    * (exporter.py:1318-1322); with no subscribers it is dropped. A callback
    * that THROWS during publish is auto-unsubscribed — a failed socket
    * write means the client is gone, and the reference likewise drops dead
    * clients (exporter.py:560-576).
    */
  sealed class Bus[T] {
    private val subs = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.CopyOnWriteArrayList[AnyRef]]()

    def subscribe(collection: String)(f: T => Unit): Handle = {
      val list = subs.computeIfAbsent(
        collection, _ => new java.util.concurrent.CopyOnWriteArrayList[AnyRef]())
      list.add(f)
      new Handle(list, f)
    }

    /** Live callbacks registered for a collection — observability for
      * deregistration paths (unsubscribe, dead-client drop).
      */
    def subscriberCount(collection: String): Int = {
      val l = subs.get(collection)
      if (l == null) 0 else l.size
    }

    protected def publishTo(collection: String, m: T): Unit = {
      val l = subs.get(collection)
      if (l != null) l.forEach { f =>
        try f.asInstanceOf[T => Unit](m)
        catch {
          // IO failure = the client's socket is gone → detach. Any other
          // NON-FATAL exception (e.g. one malformed batch) is isolated
          // from the other subscribers — logged, subscription kept (the
          // connection may be healthy). Fatal errors (OOM, interruption)
          // propagate.
          case _: java.io.IOException => l.remove(f)
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[graft] bus subscriber for '$collection' threw: $e (kept subscribed)")
        }
      }
    }
  }

  final class MarkerBus extends Bus[Marker] {
    def publish(m: Marker): Unit = publishTo(m.collection, m)
  }

  final class LiveBus extends Bus[LiveBatch] {
    def publish(b: LiveBatch): Unit = publishTo(b.collection, b)
  }
}
