package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.StreamingDedup

/** Streaming dedup e2e over MemoryStream micro-batches: only the FIRST
  * document per normalized-content fingerprint is admitted — across
  * batches, with formatting noise (case, punctuation, whitespace)
  * collapsing to the same fingerprint.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("exactDedupStream admits first occurrence only, across batches") {
    val in = MemoryStream[(Long, String)](spark)
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.exactDedupStream(docs, "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      in.addData((1L, "the quick brown fox"), (2L, "an original line"))
      q.processAllAvailable()
      // batch 2: exact dup, formatting-noise dup, and a new doc
      in.addData(
        (3L, "the quick brown fox"),
        (4L, "The quick,  brown FOX!"),
        (5L, "yet another document"))
      q.processAllAvailable()
      val out = spark.table("dedup_out")
        .select("doc_id").as[Long].collect().toSet
      assert(out === Set(1L, 2L, 5L)) // 3 and 4 are dups of 1
    } finally q.stop()
  }

  test("watermarked variant drops dups within the horizon and evicts state") {
    val in = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val docs = in.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingDedup
      .exactDedupStreamWithin(docs, "text", "ts", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_wm_out").start()
    // NOT epoch 0: the initial watermark is 0, and rows at/below the
    // watermark are dropped as late before dedup even sees them
    val base = 1704067200000L
    def ts(min: Long) = new java.sql.Timestamp(base + min * 60000L)
    try {
      in.addData((1L, "same text", ts(0)))
      q.processAllAvailable()
      in.addData((2L, "same text", ts(5))) // inside horizon → dropped
      q.processAllAvailable()
      // push the watermark far past the horizon, then repeat the content:
      // state for the old fingerprint is evicted → admitted again
      in.addData((3L, "unrelated advance", ts(60)))
      q.processAllAvailable()
      in.addData((4L, "same text", ts(61)))
      q.processAllAvailable()
      val out = spark.table("dedup_wm_out")
        .select("doc_id").as[Long].collect().toSet
      assert(out.contains(1L) && !out.contains(2L))
      assert(out.contains(4L)) // re-admitted after state eviction
    } finally q.stop()
  }
}
