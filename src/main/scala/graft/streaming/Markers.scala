package graft.streaming

/** X3 PUSH markers (/root/reference/libnntsc/exporter.py:1304-1349): after
  * a batch commits, the ingest announces `(collection, timestamp)` —
  * "all data with timestamp <= this has been delivered for this
  * collection". Subscribers use the marker to know a batch boundary has
  * passed (the reference's NNTSC_PUSH message).
  */
object Markers {

  final case class Marker(collection: String, timestamp: Long, epoch: Long)

  /** In-process pub/sub bus. Like the reference exporter, a marker is only
    * delivered to subscribers of its collection (exporter.py:1318-1322);
    * with no subscribers it is dropped.
    */
  final class MarkerBus {
    private val subs = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.CopyOnWriteArrayList[Marker => Unit]]()

    def subscribe(collection: String)(f: Marker => Unit): Unit =
      subs
        .computeIfAbsent(
          collection,
          _ => new java.util.concurrent.CopyOnWriteArrayList[Marker => Unit]())
        .add(f)

    def publish(m: Marker): Unit = {
      val l = subs.get(m.collection)
      if (l != null) l.forEach(f => f(m))
    }
  }
}
