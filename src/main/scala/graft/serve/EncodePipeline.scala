package graft.serve

/** Ordered parallel map for the serve path's frame ENCODE stage.
  *
  * The prefetch pump ([[Prefetch.rows]]) overlaps partition COMPUTE with
  * the driver-side drain, but the drain itself was still one thread
  * doing [JSON/Arrow encode + zlib/zstd] → [socket write] per chunk —
  * and the r12 sf10 measurement showed encode DOMINATES once the pump
  * hides compute (pump speedup 1.24× at sf1, only 1.06× at sf10). This
  * stage runs the per-chunk encode on a small worker pool while the
  * writer thread emits frames strictly in input order:
  *
  *   [pump: spark fetch] → [pool: encode k chunks in flight] → [writer]
  *
  * Ordering: a bounded deque of Futures, results taken FIFO — the byte
  * stream on the socket is byte-identical to the serial drain's.
  * Memory: at most `parallelism + 1` encoded frames in flight (each a
  * compressed ~10k-row chunk). Failure: the original exception from the
  * encode function rethrows on the consuming thread at the failed
  * chunk's position, like a serial drain. The pool is per-call and
  * daemon, shut down when the iterator is exhausted or the consumer
  * abandons it; an unconsumed tail leaves only daemon threads blocked
  * on a bounded queue (no leak — they die with the JVM, and the
  * upstream pump's own abandon timeout reclaims the Spark side).
  */
object EncodePipeline {

  /** `it.map(f)` with `f` evaluated `parallelism`-wide, results in input
    * order. `parallelism <= 1` degrades to a plain serial map (the A/B's
    * off arm and the conservative default for tiny results).
    */
  def mapOrdered[A, B](it: Iterator[A], parallelism: Int)(f: A => B): Iterator[B] = {
    if (parallelism <= 1) it.map(f)
    else new Iterator[B] {
      private val pool = java.util.concurrent.Executors.newFixedThreadPool(
        parallelism,
        (r: Runnable) => {
          val t = new Thread(r, "graft-encode-pool")
          t.setDaemon(true)
          t
        })
      private val inFlight =
        new java.util.ArrayDeque[java.util.concurrent.Future[B]](parallelism + 1)
      private var shut = false

      private def fill(): Unit =
        while (inFlight.size() <= parallelism && it.hasNext) {
          val a = it.next()
          inFlight.addLast(pool.submit(() => f(a)))
        }

      private def shutdown(): Unit = if (!shut) { shut = true; pool.shutdown() }

      def hasNext: Boolean = {
        fill()
        val more = !inFlight.isEmpty
        if (!more) shutdown()
        more
      }

      def next(): B = {
        if (!hasNext) throw new NoSuchElementException
        try inFlight.removeFirst().get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            shutdown()
            throw e.getCause // the original encode failure, serial-drain style
        }
      }
    }
  }
}
