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

  test("windowedTermCounts: finalized per-window counts, late data dropped") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val in = MemoryStream[(String, java.sql.Timestamp)](spark)
    val docs = in.toDF().toDF("text", "ts")
    val q = graft.pipeline.StreamingText
      .windowedTermCounts(docs, "text", "ts", "60 seconds", "60 seconds", "30 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("terms_out").start()
    try {
      in.addData(("alpha beta alpha", ts(10)), ("beta  gamma", ts(50)))
      q.processAllAvailable()
      // advance the watermark past window [0,60): its counts finalize
      in.addData(("delta", ts(120)))
      q.processAllAvailable()
      // a straggler for the closed window must NOT change finalized counts
      in.addData(("alpha", ts(15)))
      q.processAllAvailable()
      val w0 = spark.table("terms_out")
        .filter(col("window_start") === ts(0))
        .select("term", "cnt").as[(String, Long)].collect().toMap
      assert(w0 === Map("alpha" -> 2L, "beta" -> 2L, "gamma" -> 1L))
    } finally q.stop()
  }

  test("streaming sessionize: gap merges events, watermark closes sessions") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val in = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val events = in.toDF().toDF("stream_id", "ts")
    val q = graft.pipeline.StreamingText
      .sessionize(events, "stream_id", "ts", gap = "30 seconds", watermark = "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // key 1: two events 20s apart (one session), then a 100s gap (new
      // session); key 2: a single event
      in.addData((1L, ts(0)), (1L, ts(20)), (2L, ts(5)))
      q.processAllAvailable()
      in.addData((1L, ts(120)))
      q.processAllAvailable()
      in.addData((9L, ts(500))) // advance watermark: all sessions close
      q.processAllAvailable()
      val out = spark.table("sess_out")
        .select("stream_id", "session_start", "session_end", "n_events")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
        .collect().sortBy(r => (r._1, r._2.getTime)).toSeq
      val compact = out.map(r => (r._1, r._2.getTime / 1000, r._3.getTime / 1000, r._4))
      assert(compact.take(3) === Seq(
        (1L, 0L, 50L, 2L),    // 0 and 20 merged; session extends gap past last event
        (1L, 120L, 150L, 1L), // the 100s gap started a new session
        (2L, 5L, 35L, 1L)))
    } finally q.stop()
  }

  test("windowedDupRate: replay storm shows up as a dup-rate spike per window") {
    import graft.pipeline.StreamingText
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    val in = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val docs = in.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingText.windowedDupRate(docs, "text", "ts", "60 seconds", "30 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("duprate_out").start()
    try {
      // window [0,60): 4 docs, all distinct; window [60,120): 4 docs, one
      // content repeated 3x (replay storm) -> 2 distinct
      in.addData(
        (1L, "alpha one", t(5)), (2L, "beta two", t(15)),
        (3L, "gamma three", t(25)), (4L, "delta four", t(35)),
        (5L, "storm doc", t(65)), (6L, "storm doc", t(70)),
        (7L, "storm doc", t(75)), (8L, "calm doc", t(80)))
      q.processAllAvailable()
      in.addData((9L, "closer", t(200))) // advance watermark past both
      q.processAllAvailable()
      val got = spark.table("duprate_out")
        .select("window_start", "n_docs", "n_distinct", "dup_rate")
        .as[(java.sql.Timestamp, Long, Long, Double)]
        .collect().sortBy(_._1.getTime).toSeq
      assert(got.size >= 2)
      assert(got(0)._2 === 4L && got(0)._3 === 4L && got(0)._4 === 0.0)
      assert(got(1)._2 === 4L && got(1)._3 === 2L && got(1)._4 === 0.5)
    } finally q.stop()
  }

  test("streaming decontamination: stateless filter agrees with the batch operator") {
    import graft.pipeline.Dedup
    val bench = Seq(
      (100L, "the quick brown fox"),
      (101L, "what is the capital of france is it paris"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),       // contaminated (bench 100)
      (2L, "completely unrelated words here"), // clean
      (3L, "capital of france is paris"),      // contaminated (bench 101)
      (4L, "short doc"),                       // < 3 tokens: clean
      (5L, null.asInstanceOf[String]))         // null text: KEPT, like batch
    val in = MemoryStream[(Long, String)](spark)
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.decontaminateStream(docs, bench, "doc_id", "text", 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("deco_out").start()
    try {
      in.addData(corpus.take(2): _*)
      q.processAllAvailable()
      in.addData(corpus.drop(2): _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "decontamination must not create a state store")
      val got = spark.table("deco_out").select("doc_id").as[Long].collect().sorted
      val batch = Dedup.decontaminated(corpus.toDF("doc_id", "text"), bench,
          "doc_id", "text", 3)
        .select("doc_id").as[Long].collect().sorted
      assert(got.toSeq === batch.toSeq)
      assert(got.toSeq === Seq(2L, 4L, 5L))
    } finally { q.stop(); Dedup.unpersistIntermediates() }
  }

  test("streaming domain cap admits at most k per group across batches") {
    import graft.pipeline.StreamingText
    import graft.pipeline.StreamingText.GroupedDoc
    val in = MemoryStream[GroupedDoc](spark)
    val q = StreamingText.capPerGroupStream(spark, in.toDS(), k = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("cap_out").start()
    try {
      // batch 1: two groups, a under cap, b at cap
      in.addData(
        GroupedDoc("a", 1L, "x"), GroupedDoc("a", 2L, "x"),
        GroupedDoc("b", 10L, "x"), GroupedDoc("b", 11L, "x"), GroupedDoc("b", 12L, "x"))
      q.processAllAvailable()
      // batch 2: a gets its 3rd (admitted) and 4th (rejected);
      // b is full — everything rejected; c is new
      in.addData(
        GroupedDoc("a", 3L, "x"), GroupedDoc("a", 4L, "x"),
        GroupedDoc("b", 13L, "x"), GroupedDoc("c", 20L, "x"))
      q.processAllAvailable()
      val got = spark.table("cap_out")
        .select("group", "doc_id").as[(String, Long)].collect().toSet
      assert(got === Set(
        ("a", 1L), ("a", 2L), ("a", 3L),
        ("b", 10L), ("b", 11L), ("b", 12L),
        ("c", 20L)))
      // state is the admitted count only — one long per group
      assert(q.lastProgress.stateOperators.head.numRowsTotal === 3L)
    } finally q.stop()
  }

  test("streaming near-dup probe: stateless, pairs equal the batch incremental slice") {
    import graft.pipeline.Dedup
    // standing corpus: two docs that near-dup arriving content, two that don't
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (101L, "completely different words about spark query engines and big data"),
      (102L, "another unrelated sentence talking about music and art and cooking"),
      (103L, "the quick brown fox jumps over the lazy dog near the river bend today"))
      .toDF("doc_id", "text")
    val index = Dedup.minhashSignatures(corpus, "doc_id", "text", 3, 64)
      .cache()
    index.count()
    val arrivals = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // dups 100/103
      (2L, "nothing in common with anything in the corpus at all whatsoever"),
      (3L, "completely different words about spark query engines and big data"))     // dups 101
    val in = MemoryStream[(Long, String)](spark)
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.nearDupPairsStream(docs, index, "doc_id", "text", 3, 64, 16, 0.5)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    try {
      in.addData(arrivals.take(1): _*)
      q.processAllAvailable()
      in.addData(arrivals.drop(1): _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "stream-static near-dup probe must not create a state store")
      val got = spark.table("neardup_out")
        .select("doc_id", "match_id").distinct()
        .as[(Long, Long)].collect().toSet
      // batch twin: arrivals probe the same index; its canonical (a<b)
      // pairs map back to (arrival, corpus) orientation here
      val probeSigs = Dedup.minhashSignatures(
        arrivals.toDF("doc_id", "text"), "doc_id", "text", 3, 64)
      val batch = Dedup.minhashLshPairsAgainst(probeSigs, index, "doc_id", 64, 16, 0.5)
        .as[(Long, Long, Double)].collect()
        .map(p => if (p._1 <= 3L) (p._1, p._2) else (p._2, p._1)).toSet
      assert(got === batch, s"only-stream=${got -- batch} only-batch=${batch -- got}")
      assert(got === Set((1L, 100L), (1L, 103L), (3L, 101L)))
    } finally { q.stop(); index.unpersist(); Dedup.unpersistIntermediates() }
  }

  test("near-dup distinct variant: one row per pair, state bounded by pair count") {
    import graft.pipeline.Dedup
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (101L, "completely different words about spark query engines and big data"),
      (103L, "the quick brown fox jumps over the lazy dog near the river bend today"))
      .toDF("doc_id", "text")
    val index = Dedup.minhashSignatures(corpus, "doc_id", "text", 3, 64).cache()
    index.count()
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val in = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val docs = in.toDF().toDF("doc_id", "text", "evt")
    val q = StreamingDedup.nearDupPairsStreamDistinct(
        docs, index, "doc_id", "text", "evt", "30 minutes", 3, 64, 16, 0.5)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_distinct_out").start()
    try {
      // doc 1 is byte-identical to corpus 100: all 16 bands collide, so the
      // RAW form would emit 16 rows for that pair — the distinct form one
      in.addData((1L, "the quick brown fox jumps over the lazy dog near the river bank today", ts(0)))
      q.processAllAvailable()
      // the same document re-arrives within the horizon: its pairs are
      // already in pair-state and must NOT re-emit
      in.addData((1L, "the quick brown fox jumps over the lazy dog near the river bank today", ts(5)))
      q.processAllAvailable()
      val got = spark.table("neardup_distinct_out")
        .select("doc_id", "match_id").as[(Long, Long)].collect().toList
      assert(got.sorted === List((1L, 100L), (1L, 103L)),
        s"expected exactly one row per distinct pair, got $got")
      // event time survives for downstream windowing; band is collapsed away
      assert(spark.table("neardup_distinct_out").columns.contains("evt"))
      assert(!spark.table("neardup_distinct_out").columns.contains("band"))
      // state = one entry per distinct pair within the horizon, NOT per band
      val dedupState = q.lastProgress.stateOperators
      assert(dedupState.nonEmpty && dedupState.head.numRowsTotal === 2L,
        s"pair-dedup state must hold exactly the 2 distinct pairs, got " +
          dedupState.map(_.numRowsTotal).mkString(","))
    } finally { q.stop(); index.unpersist(); Dedup.unpersistIntermediates() }
  }

  test("near-dup probe refuses a signature index built with other parameters") {
    import graft.pipeline.Dedup
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    // index built at numHashes=32; the probe runs at 64 — without the
    // guard every est_jaccard would be ~0 and pairs silently vanish
    val index = Dedup.minhashSignatures(corpus, "doc_id", "text", 3, 32)
    val in = MemoryStream[(Long, String)](spark)
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.nearDupPairsStream(docs, index, "doc_id", "text", 3, 64, 16, 0.5)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_mismatch_out").start()
    try {
      in.addData((1L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("index signature length != numHashes=64")),
        s"expected the loud mismatch error, got: ${messages(e).mkString(" | ")}")
    } finally q.stop()
  }

  test("streaming bloom decontamination: stateless, agrees with the batch bloom") {
    import graft.pipeline.Dedup
    val bench = Seq(
      (100L, "the quick brown fox"),
      (101L, "what is the capital of france is it paris"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "completely unrelated words here"),
      (3L, "capital of france is paris"),
      (4L, "short doc"),
      (5L, null.asInstanceOf[String]))
    val in = MemoryStream[(Long, String)](spark)
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.decontaminateStreamBloom(
        docs, bench, "doc_id", "text", 3, mBits = 1 << 16)
      .writeStream.outputMode("append")
      .format("memory").queryName("deco_bloom_out").start()
    try {
      in.addData(corpus: _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "bloom decontamination must not create a state store")
      val got = spark.table("deco_bloom_out").select("doc_id").as[Long].collect().sorted
      // batch twin: survivors = corpus minus the bloom-flagged set
      val flagged = Dedup.decontaminateBloom(
          corpus.toDF("doc_id", "text"), bench, "doc_id", "text", 3,
          mBits = 1 << 16)
        .select("doc_id").as[Long].collect().toSet
      val batch = corpus.map(_._1).filterNot(flagged).sorted
      assert(got.toSeq === batch)
      assert(got.toSeq === Seq(2L, 4L, 5L))
    } finally { q.stop(); Dedup.unpersistIntermediates() }
  }

  test("streaming cusum alarms match the batch prefix scan across batches") {
    import graft.streaming.StreamingDetect
    import graft.streaming.StreamingDetect.SeriesRow
    // level shift at t=20 on stream 1; flat-low stream 2 never alarms
    val rows = (0L until 40L).map { t =>
      SeriesRow(1L, t, t, if (t < 20) 5.0 + (t % 3) else 15.0 + (t % 3))
    } ++ (0L until 40L).map(t => SeriesRow(2L, t, t, 1.0))
    val in = MemoryStream[SeriesRow](spark)
    val q = StreamingDetect.cusumStream(spark, in.toDS(), k = 8.0, h = 20.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("cusum_out").start()
    try {
      // split MID-SERIES so the state must carry g across batches
      val (b1, b2) = rows.splitAt(30)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("cusum_out")
        .select("stream_id", "timestamp", "cusum")
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      val batch = graft.query.TimeSeriesOps.cusum(
          rows.toDS().toDF(), "stream_id", "timestamp", "event_id", "value",
          k = 8.0, h = 20.0)
        .select("stream_id", "timestamp", "cusum")
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got === batch)
      assert(got.nonEmpty && got.forall(_._1 == 1L))
    } finally q.stop()
  }

  test("streaming z-score alarms are bit-identical to the batch window form") {
    import graft.streaming.StreamingDetect
    import graft.streaming.StreamingDetect.SeriesRow
    // gentle alternation with one spike (the batch spec's shape) plus a
    // second stream whose own noise absorbs the same magnitude
    val rows = (0L until 60L).map { t =>
      SeriesRow(1L, t, t, if (t == 30 || t == 45) 100.0 else 10.0 + (t % 2) * 0.2)
    } ++ (0L until 60L).map(t => SeriesRow(2L, t, t, if (t % 2 == 0) 10.0 else 100.0))
    val batch = graft.query.TimeSeriesOps.rollingZScore(
        rows.toDS().toDF(), "stream_id", "timestamp", "event_id", "value",
        windowRows = 10, minN = 5, threshold = 2.5)
      .select("stream_id", "timestamp", "event_id", "value", "n_history", "zscore")
      .as[(Long, Long, Long, Double, Long, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(batch.nonEmpty)

    val in = MemoryStream[SeriesRow](spark)
    val q = StreamingDetect.zscoreStream(
        spark, in.toDS(), windowRows = 10, minN = 5, threshold = 2.5)
      .writeStream.outputMode("append")
      .format("memory").queryName("zs_out").start()
    try {
      // split mid-series: the ring buffer must carry across batches
      val (b1, b2) = rows.splitAt(50)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("zs_out")
        .select("stream_id", "timestamp", "event_id", "value", "n_history", "zscore")
        .as[(Long, Long, Long, Double, Long, Double)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got === batch) // bit-identical z values included
    } finally q.stop()
  }

  test("streaming plateau runs equal the batch islands on closed data") {
    import graft.streaming.StreamingDetect
    import graft.streaming.StreamingDetect.SeriesRow
    // two islands on stream 1 (len 3 and 2, separated and TERMINATED by
    // below-level rows — a stream can only emit a run once it closes),
    // one sub-minRun blip, stream 2 all below
    val vals = Seq(1.0, 9.0, 8.5, 7.0, 1.0, 9.9, 0.5, 7.5, 8.0, 0.2)
    val rows = vals.zipWithIndex.map { case (v, t) =>
      SeriesRow(1L, t.toLong, t.toLong, v)
    } ++ (0L until 5L).map(t => SeriesRow(2L, t, t, 1.0))
    val batch = graft.query.TimeSeriesOps.plateaus(
        rows.toDS().toDF(), "stream_id", "timestamp", "event_id", "value",
        level = 7.0, minRun = 2)
      .as[(Long, Long, Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(batch === Seq((1L, 1L, 3L, 3L, 9.0), (1L, 7L, 8L, 2L, 8.0)))

    val in = MemoryStream[SeriesRow](spark)
    val q = StreamingDetect.plateauStream(spark, in.toDS(), level = 7.0, minRun = 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("pl_out").start()
    try {
      // split INSIDE the first island: the open run must carry
      val (b1, b2) = rows.splitAt(3)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("pl_out")
        .as[StreamingDetect.PlateauRun].collect()
        .map(p => (p.stream_id, p.t_start, p.t_end, p.n_rows, p.peak))
        .sortBy(r => (r._1, r._2)).toSeq
      assert(got === batch)
    } finally q.stop()
  }

  test("holt-winters: stream across splits == batch fold; trend break alarms") {
    import graft.streaming.StreamingDetect
    import graft.streaming.StreamingDetect.SeriesRow
    // stream 1: clean rising trend (2/step) that BREAKS at t=30 (jump);
    // stream 2: noiseless trend throughout — never alarms after warmup
    val rows = (0L until 50L).map { t =>
      SeriesRow(1L, t, t, if (t < 30) 10.0 + 2.0 * t else 200.0 + 2.0 * t)
    } ++ (0L until 50L).map(t => SeriesRow(2L, t, t, 5.0 + 1.5 * t))
    val batch = StreamingDetect.holtWintersBatch(spark, rows.toDS())
      .collect().sortBy(a => (a.stream_id, a.timestamp)).toSeq
    // the break is caught at t=30 on stream 1 only
    assert(batch.nonEmpty && batch.forall(_.stream_id == 1L))
    assert(batch.head.timestamp === 30L)

    val in = MemoryStream[SeriesRow](spark)
    val q = StreamingDetect.holtWintersStream(spark, in.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("hw_out").start()
    try {
      val (b1, b2) = rows.splitAt(40) // split mid-series: state must carry
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("hw_out")
        .as[StreamingDetect.HwAlarm].collect()
        .sortBy(a => (a.stream_id, a.timestamp)).toSeq
      assert(got === batch)
    } finally q.stop()
  }

  test("fixed-point holt-winters: stream across splits == batch; tracks the double form") {
    import graft.streaming.StreamingDetect
    import graft.streaming.StreamingDetect.SeriesRow
    // same trend-break corpus as the double-form spec
    val rows = (0L until 50L).map { t =>
      SeriesRow(1L, t, t, if (t < 30) 10.0 + 2.0 * t else 200.0 + 2.0 * t)
    } ++ (0L until 50L).map(t => SeriesRow(2L, t, t, 5.0 + 1.5 * t))
    val fixed = StreamingDetect.holtWintersFixedBatch(spark, rows.toDS())
      .collect().sortBy(a => (a.stream_id, a.timestamp)).toSeq
    val dbl = StreamingDetect.holtWintersBatch(spark, rows.toDS())
      .collect().sortBy(a => (a.stream_id, a.timestamp)).toSeq
    // same alarm SET as the double recursion (the quantization introduces
    // micro-unit rounding, not behavioural drift) and forecasts within a
    // quantization-rounding tolerance of the double form's
    assert(fixed.map(a => (a.stream_id, a.timestamp, a.event_id)) ===
      dbl.map(a => (a.stream_id, a.timestamp, a.event_id)))
    fixed.zip(dbl).foreach { case (f, d) =>
      assert(math.abs(f.forecast_q / 1e6 - d.forecast) < 0.01,
        s"forecast drift at t=${f.timestamp}: ${f.forecast_q / 1e6} vs ${d.forecast}")
      assert(math.abs(f.deviation_q / 1e6 - d.deviation) < 0.01)
    }
    assert(fixed.nonEmpty && fixed.head.timestamp === 30L)

    val in = MemoryStream[SeriesRow](spark)
    val q = StreamingDetect.holtWintersFixedStream(spark, in.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("hwf_out").start()
    try {
      val (b1, b2) = rows.splitAt(40) // split mid-series: state must carry
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("hwf_out")
        .as[StreamingDetect.HwFixedAlarm].collect()
        .sortBy(a => (a.stream_id, a.timestamp)).toSeq
      assert(got === fixed) // bit-identical, forecast_q/deviation_q included
    } finally q.stop()
  }

  test("streaming hygiene: stateless annotation matches the batch operators") {
    import graft.pipeline.{StreamingText, TextAnalysis}
    val in = MemoryStream[(Long, String)](spark)
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamingText.hygiene(docs, "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("hygiene_out").start()
    try {
      in.addData(
        (1L, "the quick brown fox is one of the finest of animals"),
        (2L, "contact a@b.co at 10.0.0.1 or +6491234567"),
        (3L, "der hund und die katze und das haus ist und und"))
      q.processAllAvailable()
      // STATELESS: a pure map stage registers no stateful operators
      assert(q.lastProgress.stateOperators.isEmpty,
        "hygiene must not create a state store")
      val out = spark.table("hygiene_out")
        .select("doc_id", "lang_pred", "redacted")
        .as[(Long, String, String)].collect().sortBy(_._1).toSeq
      assert(out(0)._2 === "en")
      assert(out(2)._2 === "de")
      assert(out(1)._3 === "contact [EMAIL] at [IP] or [PHONE]")
      // values equal the batch operators', row for row
      val batch = Seq(
        (1L, "the quick brown fox is one of the finest of animals"),
        (2L, "contact a@b.co at 10.0.0.1 or +6491234567"),
        (3L, "der hund und die katze und das haus ist und und"))
        .toDF("doc_id", "text")
      val expQ = TextAnalysis.docStats(batch, "doc_id", "text")
        .select("doc_id", "quality").as[(Long, Double)].collect().toMap
      val gotQ = spark.table("hygiene_out")
        .select("doc_id", "quality").as[(Long, Double)].collect().toMap
      assert(gotQ === expQ)
      // entropy annotation: stream == the batch expression, row for row
      val expE = Seq(
        (1L, "the quick brown fox is one of the finest of animals"),
        (2L, "contact a@b.co at 10.0.0.1 or +6491234567"),
        (3L, "der hund und die katze und das haus ist und und"))
        .toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.functions.TokenEntropy(col("text")).getField("entropy").as("e"))
        .as[(Long, Double)].collect().toMap
      val gotE = spark.table("hygiene_out")
        .select("doc_id", "entropy").as[(Long, Double)].collect().toMap
      assert(gotE === expE)
      // repetition pulls entropy strictly below the all-distinct ceiling
      // ln(n): doc 3 has 11 tokens with 'und' repeated 4x
      assert(gotE(3L) < math.log(11.0))
      // 6 distinct of 6: exactly −q9(ln(1/6))/1e9 (the operator's formula)
      assert(gotE(2L) == -math.floor(java.lang.Math.log(1.0 / 6) * 1e9 + 0.5) / 1e9)
    } finally q.stop()
  }

  test("hygiene + PII redaction in a checkpointed writeStream: restart-idempotent") {
    import graft.pipeline.StreamingText
    val base = java.nio.file.Files.createTempDirectory("grafthyg").toString
    val (inDir, outDir, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val schema = Seq.empty[(Long, String)].toDF("doc_id", "text").schema
    def startPipeline() = StreamingText
      .hygiene(spark.readStream.schema(schema).parquet(inDir), "text")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", outDir)
      .start()
    def addFile(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)

    // run 1: two documents committed through the checkpointed sink
    addFile(Seq(
      (1L, "the quick brown fox is one of the finest of animals"),
      (2L, "contact a@b.co at 10.0.0.1 or +6491234567")))
    val q1 = startPipeline()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(outDir).count() === 2)

    // run 2, SAME checkpoint: the committed batch is not reprocessed —
    // only the new file flows, so the annotated output stays exactly-once
    // even though doc 3 duplicates doc 1's text (hygiene annotates, it
    // does not dedup — stateless by design)
    addFile(Seq(
      (3L, "the quick brown fox is one of the finest of animals"),
      (4L, "reach me at x@y.org please")))
    val q2 = startPipeline()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() === 4, "restart must neither drop nor duplicate rows")
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    val red = out.select("doc_id", "redacted").as[(Long, String)].collect().toMap
    assert(red(2L) === "contact [EMAIL] at [IP] or [PHONE]")
    assert(red(4L) === "reach me at [EMAIL] please")
    // identical text → identical annotations across runs (pure map, no
    // run-dependent state)
    val q = out.select("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(q(1L) === q(3L))
  }
}
