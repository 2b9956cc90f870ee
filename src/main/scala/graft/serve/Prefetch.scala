package graft.serve

import java.util.concurrent.{ArrayBlockingQueue, TimeUnit}

import org.apache.spark.sql.{DataFrame, Row}

/** Pipelined driver-local row iterator — the chunked-history pump's
  * replacement for a directly-drained `Dataset.toLocalIterator`.
  *
  * `toLocalIterator` fetches result partitions strictly on demand: the
  * Spark job for partition i+1 is not submitted until the consumer has
  * drained partition i, so the serve path alternates [compute] →
  * [serialize to socket] → [compute] → … with executors idle while the
  * driver encodes frames, and vice versa. This iterator moves the
  * `toLocalIterator` drain onto its OWN pump thread, handing rows to the
  * consumer through a bounded chunk queue — the pump is already fetching
  * partition i+1 while the consumer encodes partition i, so the
  * backfill's two serial phases run concurrently, bounded by the slower
  * of the two instead of their sum.
  *
  * Staying on `toLocalIterator` (rather than per-partition `runJob`
  * calls collecting `Row` arrays) keeps Spark's compressed byte-batch
  * result channel: a runJob-based pump was measured 1.5× SLOWER than the
  * plain drain at sf1 — java-serializing GenericRow arrays through the
  * task-result channel cost more than the overlap won back.
  *
  * Memory: at most `QueueChunks`·`ChunkRows` rows buffered beyond the
  * partition `toLocalIterator` itself holds — fixed, small, independent
  * of result size.
  *
  * Ordering: single pump thread, FIFO queue — the row sequence is exactly
  * the source iterator's (the sorted-output contract history relies on).
  *
  * Cancellation: the pump thread tags itself with the caller's watchdog
  * `jobGroup` before the first fetch, so every job `toLocalIterator`
  * lazily submits stays cancellable by the group's timer (the Service
  * watchdog contract). A pump-side failure — including a watchdog kill —
  * is handed through the queue and rethrown on the consuming thread as
  * the ORIGINAL exception, so `Service.isCancellation` classification
  * sees what a synchronous drain would have thrown.
  *
  * An abandoned consumer (client gone, iterator dropped mid-stream): the
  * queue fills, the pump blocks, and after `AbandonTimeoutSec` without a
  * take it gives up and exits — no thread parks forever. The pump leaves
  * an abandoned flag behind, so a consumer that somehow resumes after
  * that gets an accurate "stream abandoned" IllegalStateException rather
  * than the generic died-without-a-marker error.
  */
object Prefetch {

  private[serve] val ChunkRows = 4096
  private[serve] val QueueChunks = 4
  private[serve] val AbandonTimeoutSec = 900L

  private case object End
  private final case class Err(t: Throwable)

  /** Rows of `df` in result order, fetched one chunk ahead on a pump
    * thread.
    *
    * @param jobGroup watchdog (group, description) to tag the pump
    *   thread with; None → the pump's jobs run untagged (no-timeout
    *   services)
    */
  def rows(df: DataFrame, jobGroup: Option[(String, String)]): Iterator[Row] = {
    val sc = df.sparkSession.sparkContext
    val queue = new ArrayBlockingQueue[AnyRef](QueueChunks)
    val abandoned = new java.util.concurrent.atomic.AtomicBoolean(false)

    def putOrAbandon(x: AnyRef): Unit = {
      val deadline = System.nanoTime() + AbandonTimeoutSec * 1_000_000_000L
      while (!queue.offer(x, 10, TimeUnit.SECONDS))
        if (System.nanoTime() > deadline)
          throw new IllegalStateException(
            s"prefetch consumer idle > ${AbandonTimeoutSec}s — abandoning pump")
    }

    val pump = new Thread(() => {
      try {
        jobGroup.foreach { case (g, d) =>
          sc.setJobGroup(g, d, interruptOnCancel = true)
        }
        val it = df.toLocalIterator()
        val buf = new scala.collection.mutable.ArrayBuffer[Row](ChunkRows)
        while (it.hasNext) {
          buf += it.next()
          if (buf.length >= ChunkRows) {
            putOrAbandon(buf.toArray)
            buf.clear()
          }
        }
        if (buf.nonEmpty) putOrAbandon(buf.toArray)
        putOrAbandon(End)
      } catch {
        case gone: IllegalStateException
            if gone.getMessage != null &&
              gone.getMessage.startsWith("prefetch consumer idle") =>
          // consumer is (we believe) gone — flag it so a consumer that
          // resumes anyway gets the accurate error, not "pump died"
          abandoned.set(true)
        case t: Throwable =>
          // best effort: a full queue with a dead consumer drops the
          // marker after the deadline, which is fine — nobody is reading
          try putOrAbandon(Err(t)) catch { case _: IllegalStateException => () }
      }
    }, "graft-history-prefetch")
    pump.setDaemon(true)
    pump.start()

    new Iterator[Row] {
      private var cur: Array[Row] = null
      private var pos = 0
      private var done = false
      private def advance(): Boolean = {
        while (!done && (cur == null || pos >= cur.length)) {
          val x = queue.poll(10, TimeUnit.SECONDS)
          x match {
            case null =>
              // no deadline here: a 100 TB partition may legitimately
              // compute for a long time (the watchdog, when armed, is the
              // timeout authority) — only a pump that DIED without
              // enqueueing its End/Err marker is an error
              if (!pump.isAlive && queue.isEmpty) {
                done = true
                if (abandoned.get())
                  throw new IllegalStateException(
                    s"prefetch consumer idle > ${AbandonTimeoutSec}s — " +
                      "stream was abandoned by the pump")
                throw new IllegalStateException(
                  "prefetch pump died without a result marker")
              }
            case End => done = true
            case Err(t) => done = true; throw t
            case chunk: Array[Row] @unchecked => cur = chunk; pos = 0
          }
        }
        !done || (cur != null && pos < cur.length)
      }
      def hasNext: Boolean = advance()
      def next(): Row = {
        if (!advance()) throw new NoSuchElementException("empty prefetch iterator")
        val r = cur(pos)
        pos += 1
        r
      }
    }
  }
}
