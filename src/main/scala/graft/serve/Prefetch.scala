package graft.serve

import java.util.concurrent.{Future => JFuture, _}

import org.apache.spark.sql.{DataFrame, Row}

/** One-partition-ahead driver-local row iterator — the chunked-history
  * pump's replacement for `Dataset.toLocalIterator`.
  *
  * `toLocalIterator` fetches partitions strictly on demand: the Spark job
  * for partition i+1 is not submitted until the consumer has drained
  * partition i, so the serve path alternates [compute] → [serialize to
  * socket] → [compute] → … with executors idle while the driver encodes
  * frames and vice versa. This iterator keeps AT MOST ONE partition job in
  * flight ahead of the consumer (plus the partition currently draining),
  * overlapping cluster compute with driver-side serialization — the
  * history backfill's two serial phases run concurrently, bounded by the
  * slower of the two instead of their sum.
  *
  * Memory: at most two partition row-arrays live on the driver (draining +
  * prefetched) — one more than `toLocalIterator` holds; both are bounded
  * by the result's partition size, not the result size.
  *
  * Ordering: partitions are fetched in index order, so the row sequence is
  * exactly `df.collect()`'s (the sorted-output contract history relies on).
  *
  * Cancellation: partition jobs are submitted from the pump's OWN thread,
  * so the caller's thread-local job group does not apply — the caller
  * passes its watchdog group via `jobGroup` and the pump re-tags its
  * thread before every submission (the Service watchdog contract: every
  * lazily-submitted job must be cancellable by the group's timer). A
  * failed fetch (including a watchdog kill) surfaces on the consuming
  * thread with the ORIGINAL exception (unwrapped from ExecutionException)
  * so `Service.isCancellation` classification sees what a synchronous
  * draw would have thrown; remaining in-flight work is cancelled.
  *
  * The pump thread dies after `IdleThreadTimeoutSec` without work (core
  * size 0), so an abandoned iterator parks no thread forever — at worst
  * the already-submitted prefetch completes, is never read, and the whole
  * structure is garbage-collected with the iterator.
  */
object Prefetch {

  private val IdleThreadTimeoutSec = 10L

  /** Rows of `df` in partition order with one-ahead prefetch.
    *
    * @param jobGroup watchdog (group, description) to tag each partition
    *   job with; None → jobs run untagged (no-timeout services)
    */
  def rows(df: DataFrame, jobGroup: Option[(String, String)]): Iterator[Row] = {
    val sc = df.sparkSession.sparkContext
    val rdd = df.rdd
    val nParts = rdd.partitions.length
    if (nParts == 0) return Iterator.empty

    // core 0 + keepalive: the single worker thread evaporates when idle
    // (ThreadPoolExecutor spawns a thread on submit when none is running)
    val exec = new ThreadPoolExecutor(
      0, 1, IdleThreadTimeoutSec, TimeUnit.SECONDS,
      new LinkedBlockingQueue[Runnable](),
      new ThreadFactory {
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, "graft-history-prefetch")
          t.setDaemon(true)
          t
        }
      })

    def submit(i: Int): JFuture[Array[Row]] = exec.submit(new Callable[Array[Row]] {
      def call(): Array[Row] = {
        jobGroup.foreach { case (g, d) =>
          sc.setJobGroup(g, d, interruptOnCancel = true)
        }
        sc.runJob(rdd, (it: Iterator[Row]) => it.toArray, Seq(i)).head
      }
    })

    new Iterator[Row] {
      private var nextToSubmit = 0
      private val inflight = scala.collection.mutable.Queue.empty[JFuture[Array[Row]]]
      private var cur: Array[Row] = null
      private var pos = 0
      private def pump(): Unit =
        while (nextToSubmit < nParts && inflight.size < 2) {
          inflight += submit(nextToSubmit)
          nextToSubmit += 1
        }
      pump()
      private def advance(): Boolean = {
        while (cur == null || pos >= cur.length) {
          if (inflight.isEmpty) { exec.shutdown(); return false }
          cur =
            try inflight.dequeue().get()
            catch {
              case e: ExecutionException =>
                inflight.foreach(_.cancel(true))
                exec.shutdownNow()
                throw Option(e.getCause).getOrElse(e)
            }
          pos = 0
          pump()
        }
        true
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
